"""TFLite import/export: wire-format round trip, NITI model import parity,
and converter-cursor compatibility (the TFLite leg of the reference's
converter, `tools/converter/source/tflite` — SURVEY.md section 2.9)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mandheling_tpu.models import lenet_niti
from mandheling_tpu.ops.qtensor import QTensor
from mandheling_tpu.utils import tflite_io as T
from mandheling_tpu.utils.tflite_model import (
    modules_from_tflite,
    niti_model_from_tflite,
    tflite_from_sequential,
)


def _export_lenet():
    model = lenet_niti()
    params = model.init(jax.random.PRNGKey(3))
    buf = tflite_from_sequential(model, params, (2, 28, 28, 1))
    return model, params, buf


def test_tflite_export_structure():
    _, _, buf = _export_lenet()
    m = T.load_tflite(buf)
    names = [op.name for op in m.ops]
    # LeNet-NITI: conv-pool-relu x2, flatten, fc(relu), fc
    assert names.count("CONV_2D") == 2
    assert names.count("MAX_POOL_2D") == 2
    assert names.count("FULLY_CONNECTED") == 2
    assert "RESHAPE" in names
    assert m.tensors[m.inputs[0]].shape == [2, 28, 28, 1]
    conv1 = next(op for op in m.ops if op.name == "CONV_2D")
    w = m.tensors[conv1.inputs[1]]
    assert w.shape == [20, 5, 5, 1]  # OHWI
    assert w.data is not None and w.data.dtype == np.float32


def test_tflite_roundtrip_bit_exact_forward():
    """Export -> import must reproduce the exact int8 forward: the NITI
    initializer scales max|data| to 127, so the power-of-two requantization
    on import is the identity."""
    model, params, buf = _export_lenet()
    model2, params2 = niti_model_from_tflite(buf)

    rng = np.random.default_rng(0)
    x = QTensor(jnp.asarray(rng.integers(-64, 64, (2, 28, 28, 1)), jnp.int8),
                jnp.int32(-5))
    y1, _ = model.fwd(params, x)
    y2, _ = model2.fwd(params2, x)
    np.testing.assert_array_equal(np.asarray(y1.data), np.asarray(y2.data))
    assert int(y1.exp) == int(y2.exp)


def test_tflite_modules_cursor():
    _, params, buf = _export_lenet()
    mods = modules_from_tflite(buf)
    kinds = [k for k, _ in mods]
    assert kinds == ["conv", "conv", "linear", "linear"]
    w0 = mods[0][1]["w"]  # HWIO
    assert w0.shape == (5, 5, 1, 20)
    q = params[0]["w"]
    np.testing.assert_allclose(
        w0, np.asarray(q.data, np.float32) * 2.0 ** int(q.exp), rtol=0, atol=0
    )


def test_tflite_quantized_weights_dequantize():
    """Per-tensor and per-axis quantized constants dequantize correctly —
    the path that imports PTQ'd int8 TFLite models into NITI."""
    t = T.TFLTensor(shape=[2, 2], dtype=9,
                    data=np.array([[10, -20], [30, 40]], np.int8),
                    scale=[0.5], zero_point=[2])
    np.testing.assert_allclose(
        t.dequantized(), (np.array([[10, -20], [30, 40]]) - 2) * 0.5
    )
    t2 = T.TFLTensor(shape=[2, 2], dtype=9,
                     data=np.array([[10, -20], [30, 40]], np.int8),
                     scale=[0.5, 0.25], zero_point=[0, 0],
                     quantized_dimension=0)
    np.testing.assert_allclose(
        t2.dequantized(), np.array([[5.0, -10.0], [7.5, 10.0]])
    )


def test_tflite_import_rejects_nonzero_bias_and_branching():
    w = T.TFLiteWriter()
    inp = w.tensor((1, 8, 8, 3), name="in")
    wt = w.const(np.ones((4, 3, 3, 3), np.float32))
    bias = w.const(np.ones((4,), np.float32))
    out = w.tensor((1, 6, 6, 4))
    w.op(T.CONV_2D, [inp, wt, bias], [out], T.OPT_CONV2D,
         {"padding": T.PAD_VALID, "stride": (1, 1)})
    buf = w.finish([inp], [out])
    with pytest.raises(ValueError, match="bias"):
        niti_model_from_tflite(buf)

    # branching now imports (r3): relu(x) + relu(x) -> ParallelAdd
    w = T.TFLiteWriter()
    inp = w.tensor((1, 8, 8, 3), name="in")
    o1 = w.tensor((1, 8, 8, 3))
    o2 = w.tensor((1, 8, 8, 3))
    o3 = w.tensor((1, 8, 8, 3))
    w.op(T.RELU, [inp], [o1])
    w.op(T.RELU, [inp], [o2])
    w.op(T.ADD, [o1, o2], [o3], T.OPT_ADD, {})
    buf = w.finish([inp], [o3])
    from mandheling_tpu.nn.blocks import ParallelAdd

    model, _ = niti_model_from_tflite(buf)
    assert isinstance(model.layers[0], ParallelAdd)


def test_tflite_fire_module_concat_import():
    """SqueezeNet Fire: squeeze 1x1 -> [expand1x1, expand3x3] -> channel
    CONCATENATION imports as ParallelConcat and runs the train step."""
    from mandheling_tpu.data import onehot_padded
    from mandheling_tpu.nn.blocks import ParallelConcat
    from mandheling_tpu.train import make_train_step

    rng = np.random.default_rng(5)
    w = T.TFLiteWriter()
    inp = w.tensor((1, 8, 8, 8), name="in")
    wsq = w.const(rng.normal(0, 0.3, (4, 1, 1, 8)).astype(np.float32))  # OHWI
    sq = w.tensor((1, 8, 8, 4))
    w.op(T.CONV_2D, [inp, wsq, -1], [sq], T.OPT_CONV2D,
         {"padding": T.PAD_VALID, "stride": (1, 1),
          "fused_activation": T.ACT_RELU})
    we1 = w.const(rng.normal(0, 0.3, (6, 1, 1, 4)).astype(np.float32))
    e1 = w.tensor((1, 8, 8, 6))
    w.op(T.CONV_2D, [sq, we1, -1], [e1], T.OPT_CONV2D,
         {"padding": T.PAD_VALID, "stride": (1, 1)})
    we3 = w.const(rng.normal(0, 0.3, (6, 3, 3, 4)).astype(np.float32))
    e3 = w.tensor((1, 8, 8, 6))
    w.op(T.CONV_2D, [sq, we3, -1], [e3], T.OPT_CONV2D,
         {"padding": T.PAD_SAME, "stride": (1, 1)})
    cat = w.tensor((1, 8, 8, 12))
    w.op(T.CONCATENATION, [e1, e3], [cat], T.OPT_CONCAT, {"axis": 3})
    buf = w.finish([inp], [cat])

    model, params = niti_model_from_tflite(buf)
    kinds = [type(l).__name__ for l in model.layers]
    assert "ParallelConcat" in kinds
    concat = next(l for l in model.layers if isinstance(l, ParallelConcat))
    assert len(concat.branches) == 2

    step = jax.jit(make_train_step(model))
    x = jnp.asarray(np.random.default_rng(0).normal(0, 1, (8, 8, 8, 8)),
                    jnp.float32)
    oh = jnp.asarray(onehot_padded(
        np.random.default_rng(0).integers(0, 10, 8), 10,
        8 * 8 * 12))
    newp, loss = step(params, x, oh)
    assert np.isfinite(float(loss))


def test_tflite_residual_identity_import():
    """ADD with identity skip imports as ResidualBlock, bit-equal to the
    hand-built block with the same quantized weights."""
    from mandheling_tpu.nn.blocks import ResidualBlock
    from mandheling_tpu.nn.layers import NITIConv2D
    from mandheling_tpu.nn.module import Sequential

    rng = np.random.default_rng(6)
    wt = rng.normal(0, 0.3, (8, 3, 3, 8)).astype(np.float32)  # OHWI
    w = T.TFLiteWriter()
    inp = w.tensor((1, 8, 8, 8), name="in")
    cw = w.const(wt)
    c0 = w.tensor((1, 8, 8, 8))
    w.op(T.CONV_2D, [inp, cw, -1], [c0], T.OPT_CONV2D,
         {"padding": T.PAD_SAME, "stride": (1, 1)})
    j = w.tensor((1, 8, 8, 8))
    w.op(T.ADD, [c0, inp], [j], T.OPT_ADD, {})
    buf = w.finish([inp], [j])

    model, params = niti_model_from_tflite(buf)
    assert isinstance(model.layers[0], ResidualBlock)

    from mandheling_tpu.ops.qtensor import quantize_weights

    hand = Sequential([
        ResidualBlock(Sequential([
            NITIConv2D(8, 8, (3, 3), (1, 1), "SAME"),
        ])),
    ])
    hand_params = [[{"w": quantize_weights(
        jnp.asarray(wt.transpose(1, 2, 3, 0), jnp.float32))}]]
    rng2 = np.random.default_rng(0)
    x = QTensor(jnp.asarray(rng2.integers(-64, 64, (2, 8, 8, 8)), jnp.int8),
                jnp.int32(-5))
    y1, _ = Sequential(model.layers[:-1]).fwd(params[:-1], x)
    y2, _ = hand.fwd(hand_params, x)
    np.testing.assert_array_equal(np.asarray(y1.data), np.asarray(y2.data))


def test_tflite_imported_model_trains():
    """Imported TFLite model plugs straight into the integer train step and
    the loss decreases (the turnModelToTrainable contract)."""
    from mandheling_tpu.data import onehot_padded
    from mandheling_tpu.train import make_train_step

    _, _, buf = _export_lenet()
    model, params = niti_model_from_tflite(buf)
    step = jax.jit(make_train_step(model))

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(0, 1, (64, 28, 28, 1)), jnp.float32)
    labels = rng.integers(0, 10, 64)
    oh = jnp.asarray(onehot_padded(labels, 10, 12))
    losses = []
    for _ in range(8):
        params, loss = step(params, x, oh)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_tflite_same_padding_and_depthwise_roundtrip():
    """SAME padding and depthwise layers survive export -> import."""
    from mandheling_tpu.nn.blocks import GlobalAvgPool, NITIDepthwiseConv2D
    from mandheling_tpu.nn.layers import NITIConv2D, NITIRelu, SqueezeLogits
    from mandheling_tpu.nn.module import Sequential

    model = Sequential([
        NITIConv2D(3, 16, (3, 3), (2, 2), "SAME"),
        NITIRelu(),
        NITIDepthwiseConv2D(16, (3, 3), (1, 1), "SAME"),
        GlobalAvgPool(),
        NITIConv2D(16, 12, (1, 1)),
        SqueezeLogits(),
    ])
    params = model.init(jax.random.PRNGKey(0))
    buf = tflite_from_sequential(model, params, (2, 16, 16, 3))
    m = T.load_tflite(buf)
    conv = m.ops[0]
    assert conv.options["padding"] == T.PAD_SAME
    assert conv.options["stride"] == (2, 2)
    dw = next(op for op in m.ops if op.name == "DEPTHWISE_CONV_2D")
    assert dw.options["depth_multiplier"] == 1

    model2, params2 = niti_model_from_tflite(buf)
    rng = np.random.default_rng(0)
    x = QTensor(jnp.asarray(rng.integers(-64, 64, (2, 16, 16, 3)), jnp.int8),
                jnp.int32(-5))
    y1, _ = model.fwd(params, x)
    y2, _ = model2.fwd(params2, x)
    np.testing.assert_array_equal(np.asarray(y1.data), np.asarray(y2.data))


def test_tflite_branching_export_roundtrip():
    """r3: branching models (residual / projected-residual / concat)
    export to TFLite ADD/CONCATENATION ops and re-import bit-exactly —
    the full train-in-framework -> deploy round trip for the model zoo."""
    from mandheling_tpu.models.resnet import ProjectedResidualBlock
    from mandheling_tpu.nn.blocks import ParallelConcat, ResidualBlock
    from mandheling_tpu.nn.layers import NITIConv2D, NITIRelu, SqueezeLogits
    from mandheling_tpu.nn.module import Sequential

    model = Sequential([
        NITIConv2D(3, 8, (3, 3), (1, 1), "SAME"),
        NITIRelu(),
        ResidualBlock(Sequential([
            NITIConv2D(8, 8, (3, 3), (1, 1), "SAME"),
            NITIRelu(),
            NITIConv2D(8, 8, (3, 3), (1, 1), "SAME"),
        ])),
        NITIRelu(),
        ProjectedResidualBlock(
            Sequential([NITIConv2D(8, 16, (3, 3), (2, 2), "SAME")]),
            NITIConv2D(8, 16, (1, 1), (2, 2)),
        ),
        ParallelConcat([
            Sequential([NITIConv2D(16, 4, (1, 1))]),
            Sequential([NITIConv2D(16, 4, (1, 1)), NITIRelu()]),
        ]),
        SqueezeLogits(),
    ])
    params = model.init(jax.random.PRNGKey(5))
    buf = tflite_from_sequential(model, params, (2, 8, 8, 3))
    m = T.load_tflite(buf)
    names = [op.name for op in m.ops]
    assert names.count("ADD") == 2
    assert names.count("CONCATENATION") == 1

    model2, params2 = niti_model_from_tflite(buf)
    rng = np.random.default_rng(0)
    x = QTensor(jnp.asarray(rng.integers(-64, 64, (2, 8, 8, 3)), jnp.int8),
                jnp.int32(-5))
    y1, _ = Sequential(model.layers[:-1]).fwd(params[:-1], x)
    y2, _ = Sequential(model2.layers[:-1]).fwd(params2[:-1], x)
    np.testing.assert_array_equal(np.asarray(y1.data), np.asarray(y2.data))
    assert int(y1.exp) == int(y2.exp)


def test_tflite_relu6_and_fused_act_roundtrip():
    """r4: NITIRelu6 and act="relu6"-fused conv/dw layers export as TFLite
    RELU6 ops and re-import as NITIRelu6 with a bit-identical forward.
    (Earlier rounds approximated TFLite RELU6 with plain NITI relu; the
    exact exponent-aware analog now round-trips.)"""
    from mandheling_tpu.nn.blocks import GlobalAvgPool, NITIDepthwiseConv2D
    from mandheling_tpu.nn.layers import (
        NITIConv2D,
        NITIRelu6,
        SqueezeLogits,
    )
    from mandheling_tpu.nn.module import Sequential

    model = Sequential([
        NITIConv2D(3, 16, (3, 3), (1, 1), "SAME", act="relu6"),
        NITIDepthwiseConv2D(16, (3, 3), (1, 1), "SAME", act="relu6"),
        NITIRelu6(),
        GlobalAvgPool(),
        NITIConv2D(16, 12, (1, 1)),
        SqueezeLogits(),
    ])
    params = model.init(jax.random.PRNGKey(0))
    buf = tflite_from_sequential(model, params, (2, 16, 16, 3))
    m = T.load_tflite(buf)
    assert sum(1 for op in m.ops if op.name == "RELU6") == 3

    model2, params2 = niti_model_from_tflite(buf)
    from mandheling_tpu.nn.layers import NITIRelu6 as R6

    assert sum(1 for l in model2.layers if isinstance(l, R6)) == 3
    rng = np.random.default_rng(0)
    x = QTensor(jnp.asarray(rng.integers(-64, 64, (2, 16, 16, 3)), jnp.int8),
                jnp.int32(-5))
    y1, _ = model.fwd(params, x)
    y2, _ = model2.fwd(params2, x)
    np.testing.assert_array_equal(np.asarray(y1.data), np.asarray(y2.data))
    assert int(y1.exp) == int(y2.exp)
