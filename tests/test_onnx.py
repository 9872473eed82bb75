"""ONNX import/export tests.

The ONNX path feeds the same module-list cursor as the torch path
(utils/convert.py), so the contract is: torch model -> ONNX file (written
with the vendored wire-compatible proto) -> modules_from_onnx -> adapter
produces params whose forward is bit-equal to the torch-direct conversion,
and numerically equal to the torch model itself. Then the imported model is
NITI-quantized and fine-tuned one step end-to-end (the
turnModelToTrainable analog over an external format,
tools/converter/source/onnx/ in the reference).
"""

import importlib.util
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from mandheling_tpu.models.lenet import LeNetFP32  # noqa: E402
from mandheling_tpu.utils import onnx_io  # noqa: E402
from mandheling_tpu.utils.convert import (  # noqa: E402
    lenet_fp32_from_modules,
    lenet_fp32_from_torch,
    modules_from_state_dict,
)

_spec = importlib.util.spec_from_file_location(
    "_test_convert_mirrors",
    os.path.join(os.path.dirname(__file__), "test_convert.py"),
)
_mirrors = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_mirrors)


def _lenet_onnx_ops(state_dict):
    """Torch LeNet -> ONNX op chain (Conv/MaxPool/Gemm in torch layouts)."""
    sd = {k: v.detach().numpy() for k, v in state_dict.items()}
    return [
        ("Conv", {"w": sd["conv1.weight"], "b": sd["conv1.bias"]}),
        ("MaxPool", {"kernel": (2, 2), "strides": (2, 2)}),
        ("Conv", {"w": sd["conv2.weight"], "b": sd["conv2.bias"]}),
        ("MaxPool", {"kernel": (2, 2), "strides": (2, 2)}),
        ("Flatten", {}),
        ("Gemm", {"w": sd["fc1.weight"], "b": sd["fc1.bias"]}),
        ("Clip", {"min": 0.0, "max": 6.0}),
        ("Gemm", {"w": sd["fc2.weight"], "b": sd["fc2.bias"]}),
    ]


def test_onnx_roundtrip_lenet_forward_parity(tmp_path):
    tm = _mirrors.TorchLeNet().eval()
    path = str(tmp_path / "lenet.onnx")
    onnx_io.build_onnx_sequential(
        _lenet_onnx_ops(tm.state_dict()), (1, 1, 28, 28), path
    )
    modules = onnx_io.modules_from_onnx(path)
    assert [k for k, _ in modules] == ["conv", "conv", "linear", "linear"]
    params_onnx = lenet_fp32_from_modules(modules)
    params_torch = lenet_fp32_from_torch(tm.state_dict())
    # identical import through either front-end
    for a, b in zip(jax.tree.leaves(params_onnx), jax.tree.leaves(params_torch)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and numerically equal to the torch model itself
    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (4, 28, 28, 1)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    out = np.asarray(LeNetFP32().apply(params_onnx, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_onnx_conv_attributes_roundtrip(tmp_path):
    """Stride/pads/group attributes survive the wire."""
    rng = np.random.default_rng(1)
    w = rng.normal(0, 1, (8, 1, 3, 3)).astype(np.float32)
    path = str(tmp_path / "dw.onnx")
    onnx_io.build_onnx_sequential(
        [("Conv", {"w": w, "strides": (2, 2), "pads": (1, 1, 1, 1),
                   "group": 8})],
        (1, 8, 16, 16), path,
    )
    modules = onnx_io.modules_from_onnx(path)
    kind, entry = modules[0]
    assert kind == "conv"
    assert entry["meta"] == {"stride": (2, 2), "pads": (1, 1, 1, 1),
                             "group": 8}
    np.testing.assert_array_equal(entry["w"], w.transpose(2, 3, 1, 0))


@pytest.mark.slow
def test_onnx_mobilenet_v2_import_quantize_finetune(tmp_path):
    """MobileNetV2 from ONNX -> fp32 params (parity with the torch-direct
    import) -> NITI-quantize -> one integer fine-tune step end-to-end."""
    from mandheling_tpu.models.mobilenet_fp32 import MobileNetV2FP32
    from mandheling_tpu.utils.convert import (
        mobilenet_fp32_from_modules,
        mobilenet_fp32_from_torch,
    )

    model = MobileNetV2FP32(num_classes=10, width_mult=0.25)
    tm = _mirrors._torch_from_spec(model).eval()
    sd = tm.state_dict()

    # ONNX chain mirrors state_dict order: conv+bn pairs then the head
    ops = []
    mods = modules_from_state_dict(sd)
    for kind, entry in mods:
        if kind == "conv":
            ops.append(("Conv", {"w": entry["w"].transpose(3, 2, 0, 1)}))
        elif kind == "bn":
            ops.append(("BatchNormalization", entry))
        else:
            ops.append(("Gemm", entry))
    path = str(tmp_path / "mnv2.onnx")
    onnx_io.build_onnx_sequential(ops, (1, 3, 32, 32), path)

    modules = onnx_io.modules_from_onnx(path)
    p_onnx = mobilenet_fp32_from_modules(modules, model)
    p_torch = mobilenet_fp32_from_torch(sd, model)
    for a, b in zip(jax.tree.leaves(p_onnx), jax.tree.leaves(p_torch)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)

    # NITI-quantize the imported backbone + integer fine-tune one step
    from mandheling_tpu.data import onehot_padded
    from mandheling_tpu.models.mobilenet import mobilenet_v2_niti
    from mandheling_tpu.train import make_train_step
    from mandheling_tpu.utils.checkpoint import quantize_params_tree

    nmodel = mobilenet_v2_niti(width_mult=0.25)
    nparams = nmodel.init(jax.random.PRNGKey(0))
    qimported = quantize_params_tree(p_onnx)
    assert len(jax.tree.leaves(qimported)) > 0

    step = jax.jit(make_train_step(nmodel))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (8, 32, 32, 3)), jnp.float32)
    oh = jnp.asarray(onehot_padded(rng.integers(0, 10, 8), 10, 12))
    newp, loss = step(nparams, x, oh)
    assert np.isfinite(float(loss))


def test_niti_model_from_onnx_trains():
    """The general turnModelToTrainable: a bias-less ONNX chain becomes a
    runnable NITI Sequential with quantized weights; the integer train step
    runs and moves the weights."""
    from mandheling_tpu.data import onehot_padded
    from mandheling_tpu.train import make_train_step
    from mandheling_tpu.utils.onnx_model import niti_model_from_onnx

    rng = np.random.default_rng(0)
    ops = [
        ("Conv", {"w": rng.normal(0, 0.2, (8, 1, 5, 5)).astype(np.float32)}),
        ("Relu", {}),
        ("MaxPool", {"kernel": (2, 2), "strides": (2, 2)}),
        ("Conv", {"w": rng.normal(0, 0.2, (12, 8, 3, 3)).astype(np.float32)}),
        ("Relu", {}),
        ("MaxPool", {"kernel": (2, 2), "strides": (2, 2)}),
        ("Flatten", {}),
        ("Gemm", {"w": rng.normal(0, 0.1, (12, 300)).astype(np.float32)}),
    ]
    model_pb = onnx_io.build_onnx_sequential(ops, (1, 1, 28, 28))
    model, params = niti_model_from_onnx(model_pb)

    step = jax.jit(make_train_step(model))
    x = jnp.asarray(rng.normal(0, 1, (16, 28, 28, 1)), jnp.float32)
    oh = jnp.asarray(onehot_padded(rng.integers(0, 10, 16), 10, 12))
    newp, loss = step(params, x, oh)
    assert np.isfinite(float(loss))
    moved = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(list(params)),
                        jax.tree.leaves(list(newp)))
    )
    assert moved


def test_niti_model_from_onnx_gemm_perm():
    """The flatten permutation: the imported FC weight must equal the
    quantization of the source Gemm weight with the channel-major ->
    channel-minor row permutation applied (the same transform whose
    functional correctness the torch-adapter parity tests pin down
    exactly, test_convert.test_lenet_torch_parity)."""
    from mandheling_tpu.ops.qtensor import quantize_weights
    from mandheling_tpu.utils.convert import chw_to_hwc_perm
    from mandheling_tpu.utils.onnx_model import niti_model_from_onnx

    rng = np.random.default_rng(3)
    wconv = rng.normal(0, 0.3, (4, 1, 3, 3)).astype(np.float32)
    wfc = rng.normal(0, 0.2, (5, 4 * 6 * 6)).astype(np.float32)
    model_pb = onnx_io.build_onnx_sequential(
        [("Conv", {"w": wconv}), ("Flatten", {}), ("Gemm", {"w": wfc})],
        (1, 1, 8, 8),
    )
    model, params = niti_model_from_onnx(model_pb)
    got = params[2]["w"]

    perm = chw_to_hwc_perm(4, 6, 6)
    expected = quantize_weights(
        jnp.asarray(wfc.T[perm].reshape(1, 1, 4 * 36, 5), jnp.float32)
    )
    np.testing.assert_array_equal(np.asarray(got.data),
                                  np.asarray(expected.data))
    assert int(got.exp) == int(expected.exp)


def test_clip_bounds_from_inputs_and_attributes():
    """Opset 11+ Clip carries min/max as initializer INPUTS (the torch
    export default) — the importer must recognize Clip(0, 6) as NITIRelu6
    either way (r4 advisor finding: only attributes were read)."""
    from mandheling_tpu.nn.layers import NITIRelu, NITIRelu6
    from mandheling_tpu.utils.onnx_model import niti_model_from_onnx

    rng = np.random.default_rng(0)
    w = rng.normal(0, 0.2, (4, 1, 3, 3)).astype(np.float32)
    # the builder now writes input-style bounds (opset 11+ wire form)
    model_pb = onnx_io.build_onnx_sequential(
        [("Conv", {"w": w}), ("Clip", {"min": 0.0, "max": 6.0})],
        (1, 1, 8, 8),
    )
    clip = [n for n in model_pb.graph.node if n.op_type == "Clip"][0]
    assert len(clip.input) == 3 and not clip.attribute
    model, _ = niti_model_from_onnx(model_pb)
    assert any(isinstance(l, NITIRelu6) for l in model.layers)

    # attribute-style (opset <= 10) still resolves
    del clip.input[1:]
    a = clip.attribute.add(); a.name = "min"; a.f = 0.0; a.type = 1
    a = clip.attribute.add(); a.name = "max"; a.f = 6.0; a.type = 1
    model2, _ = niti_model_from_onnx(model_pb)
    assert any(isinstance(l, NITIRelu6) for l in model2.layers)

    # Clip(0, max != 6) keeps the plain-relu approximation, input-style too
    model_pb3 = onnx_io.build_onnx_sequential(
        [("Conv", {"w": w}), ("Clip", {"min": 0.0, "max": 3.0})],
        (1, 1, 8, 8),
    )
    model3, _ = niti_model_from_onnx(model_pb3)
    assert any(isinstance(l, NITIRelu) for l in model3.layers)
    assert not any(isinstance(l, NITIRelu6) for l in model3.layers)


def test_niti_model_from_onnx_rejects_bias_and_branches():
    from mandheling_tpu.utils.onnx_model import niti_model_from_onnx

    rng = np.random.default_rng(0)
    w = rng.normal(0, 0.2, (4, 1, 3, 3)).astype(np.float32)
    pb_bias = onnx_io.build_onnx_sequential(
        [("Conv", {"w": w, "b": np.zeros(4, np.float32)})], (1, 1, 8, 8)
    )
    with pytest.raises(ValueError, match="bias"):
        niti_model_from_onnx(pb_bias)
