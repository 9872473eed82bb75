"""nn/transform.py: post-hoc dw per-channel upgrade (r5).

The transform is the import-pipeline half of the integer-MobileNet
training recipe (DIVERGENCE_r05.json): imported models carry per-tensor
depthwise weights; dw_to_per_channel re-quantizes them per channel so
fine-tuning integer-only does not hit the r4 chance-accuracy blocker.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mandheling_tpu.nn.blocks import NITIDepthwiseConv2D
from mandheling_tpu.nn.transform import dw_to_per_channel
from mandheling_tpu.ops.depthwise import pc_shift_cap
from mandheling_tpu.ops.qtensor import QTensor


def _deq(q: QTensor) -> np.ndarray:
    e = np.asarray(q.exp, np.float32)
    if e.ndim == 1:
        e = e[None, None, None, :]
    return np.asarray(q.data, np.float32) * np.exp2(e)


def test_dw_to_per_channel_preserves_values_and_caps_spread():
    from mandheling_tpu.models.mobilenet import mobilenet_v2_niti

    model = mobilenet_v2_niti(width_mult=0.25)
    params = model.init(jax.random.PRNGKey(0))
    dws = [l for l in model.layers if isinstance(l, NITIDepthwiseConv2D)]
    assert dws and not any(l.per_channel for l in dws)

    # remember the dequantized dw weights before the transform
    before = {}
    for i, (l, p) in enumerate(zip(model.layers, params)):
        if isinstance(l, NITIDepthwiseConv2D):
            before[i] = _deq(p["w"])

    model, params = dw_to_per_channel(model, params)
    assert all(l.per_channel for l in dws)
    for i, (l, p) in enumerate(zip(model.layers, params)):
        if not isinstance(l, NITIDepthwiseConv2D):
            continue
        w: QTensor = p["w"]
        assert w.exp.ndim == 1 and w.exp.shape[0] == l.channels
        spread = int(jnp.max(w.exp) - jnp.min(w.exp))
        assert spread <= pc_shift_cap(l.kernel[0] * l.kernel[1])
        after = _deq(w)
        # value-preserving: error <= half a quantization step of each
        # channel's own scale (one full step at the clipped +-127 rail,
        # which only occurs when the channel range is a power of two)
        step = np.exp2(np.asarray(w.exp, np.float32))[None, None, None, :]
        err = np.abs(after - before[i])
        at_rail = np.abs(np.asarray(w.data, np.int32)) == 127
        assert np.all(err <= np.where(at_rail, 1.0, 0.5) * step + 1e-7)
        assert int(np.max(np.abs(np.asarray(w.data, np.int32)))) <= 127

    # the transformed model trains
    from mandheling_tpu.data import onehot_padded
    from mandheling_tpu.train import make_train_step

    step_fn = jax.jit(make_train_step(model))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (8, 32, 32, 3)), jnp.float32)
    oh = jnp.asarray(onehot_padded(rng.integers(0, 10, 8), 10, 12))
    newp, loss = step_fn(params, x, oh)
    assert np.isfinite(float(loss))


def test_dw_to_per_channel_via_onnx_import():
    """The transform composes with the import pipeline: a depthwise ONNX
    graph -> trainable model -> per-channel upgrade keeps the forward
    close (within per-channel quantization error)."""
    from mandheling_tpu.train.train_step import quantize_batch
    from mandheling_tpu.utils import onnx_io
    from mandheling_tpu.utils.onnx_model import niti_model_from_onnx

    rng = np.random.default_rng(3)
    w_dw = rng.normal(0, 0.3, (8, 1, 3, 3)).astype(np.float32)
    w_pw = rng.normal(0, 0.3, (12, 8, 1, 1)).astype(np.float32)
    model_pb = onnx_io.build_onnx_sequential(
        [("Conv", {"w": w_dw, "group": 8, "pads": (1, 1, 1, 1)}),
         ("Relu", {}),
         ("Conv", {"w": w_pw}),
         ("GlobalAveragePool", {})],
        (1, 8, 8, 8),
    )
    model, params = niti_model_from_onnx(model_pb)
    x = jnp.asarray(rng.normal(0, 1, (4, 8, 8, 8)), jnp.float32)
    data, e = quantize_batch(x)
    out_before = model.fwd(params, QTensor(data, e))[0]
    model, params = dw_to_per_channel(model, params)
    assert any(getattr(l, "per_channel", False) for l in model.layers)
    out_after = model.fwd(params, QTensor(data, e))[0]
    a = _deq(QTensor(out_before.data, out_before.exp))
    b = _deq(QTensor(out_after.data, out_after.exp))
    # same function up to requant noise
    denom = max(float(np.max(np.abs(a))), 1e-6)
    assert float(np.max(np.abs(a - b))) / denom < 0.1
