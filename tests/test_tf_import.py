"""TensorFlow frozen-graph (GraphDef) import — the TF leg of the
reference converter (`tools/converter/source/tensorflow`), through the
shared region walker. Wire format cross-validated against the real
tensorflow GraphDef parser when tensorflow is importable.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mandheling_tpu.data import onehot_padded
from mandheling_tpu.nn.blocks import ParallelConcat, ResidualBlock
from mandheling_tpu.train import make_train_step
from mandheling_tpu.utils import tf_graphdef as G
from mandheling_tpu.utils.tf_model import niti_model_from_graphdef

rng = np.random.default_rng(11)

F = np.float32
DT = ("dtype", G.DT_FLOAT)


def _const(name, arr):
    return (name, "Const", [], {"dtype": DT, "value": np.asarray(arr, F)})


def _lenet_graph():
    w1 = rng.normal(0, 0.2, (5, 5, 1, 8)).astype(F)   # HWIO
    w2 = rng.normal(0, 0.2, (3, 3, 8, 12)).astype(F)
    wf = rng.normal(0, 0.1, (12, 12)).astype(F)
    nodes = [
        ("input", "Placeholder", [], {"dtype": DT}),
        _const("w1", w1),
        ("conv1", "Conv2D", ["input", "w1"],
         {"strides": [1, 1, 1, 1], "padding": "VALID"}),
        ("relu1", "Relu", ["conv1"], {}),
        ("pool1", "MaxPool", ["relu1"],
         {"ksize": [1, 2, 2, 1], "strides": [1, 2, 2, 1],
          "padding": "VALID"}),
        _const("w2", w2),
        ("conv2", "Conv2D", ["pool1", "w2"],
         {"strides": [1, 1, 1, 1], "padding": "VALID"}),
        ("relu2", "Relu", ["conv2"], {}),
        _const("axes", np.asarray([1, 2], np.int32)),
        ("gap", "Mean", ["relu2", "axes"], {"keep_dims": True}),
        _const("shape", np.asarray([-1, 12], np.int32)),
        ("flat", "Reshape", ["gap", "shape"], {}),
        _const("wf", wf),
        ("logits", "MatMul", ["flat", "wf"], {"transpose_b": False}),
    ]
    return G.build_graphdef(nodes), (w1, w2, wf)


def test_wire_format_matches_real_tensorflow():
    tf = pytest.importorskip("tensorflow")
    buf, (w1, w2, wf) = _lenet_graph()
    gd = tf.compat.v1.GraphDef()
    gd.ParseFromString(buf)
    ops = [n.op for n in gd.node]
    assert ops.count("Conv2D") == 2 and "MatMul" in ops
    conv1 = next(n for n in gd.node if n.name == "conv1")
    assert list(conv1.attr["strides"].list.i) == [1, 1, 1, 1]
    assert conv1.attr["padding"].s == b"VALID"
    w1n = next(n for n in gd.node if n.name == "w1")
    got = tf.make_ndarray(w1n.attr["value"].tensor)
    np.testing.assert_array_equal(got, w1)
    # and our reader parses tensorflow's re-serialization identically
    rt = G.load_graphdef(gd.SerializeToString())
    assert [n.op for n in rt.node] == ops
    np.testing.assert_array_equal(
        next(n for n in rt.node if n.name == "w2").attr["value"].data, w2)


def test_tf_lenet_imports_and_trains():
    buf, _ = _lenet_graph()
    model, params = niti_model_from_graphdef(buf, input_shape=(1, 28, 28, 1))
    kinds = [type(l).__name__ for l in model.layers]
    assert kinds == ["NITIConv2D", "NITIRelu", "NITIMaxPool", "NITIConv2D",
                     "NITIRelu", "GlobalAvgPool", "Flatten", "NITIConv2D",
                     "SqueezeLogits"]
    step = jax.jit(make_train_step(model))
    x = jnp.asarray(rng.normal(0, 1, (16, 28, 28, 1)), jnp.float32)
    oh = jnp.asarray(onehot_padded(rng.integers(0, 10, 16), 10, 12))
    p, loss = step(params, x, oh)
    assert np.isfinite(float(loss))


def test_tf_residual_and_bn_fold():
    """conv+FusedBatchNormV3 folds; Add with identity skip becomes a
    ResidualBlock; zero BiasAdd is dropped."""
    w1 = rng.normal(0, 0.2, (3, 3, 8, 8)).astype(F)
    scale = rng.uniform(0.5, 2.0, 8).astype(F)
    var = rng.uniform(0.5, 2.0, 8).astype(F)
    nodes = [
        ("input", "Placeholder", [], {"dtype": DT}),
        _const("w1", w1),
        ("conv1", "Conv2D", ["input", "w1"],
         {"strides": [1, 1, 1, 1], "padding": "SAME"}),
        _const("bias", np.zeros(8, F)),
        ("badd", "BiasAdd", ["conv1", "bias"], {}),
        _const("scale", scale),
        _const("offset", np.zeros(8, F)),
        _const("mean", np.zeros(8, F)),
        _const("var", var),
        ("bn", "FusedBatchNormV3",
         ["badd", "scale", "offset", "mean", "var"], {"epsilon": 0.001}),
        ("join", "AddV2", ["bn", "input"], {}),
        ("out", "Relu", ["join"], {}),
    ]
    buf = G.build_graphdef(nodes)
    model, params = niti_model_from_graphdef(buf, input_shape=(1, 8, 8, 8))
    assert isinstance(model.layers[0], ResidualBlock)
    # folded weight quantizes w1 * scale/sqrt(var+eps)
    from mandheling_tpu.ops.qtensor import quantize_weights

    expected = quantize_weights(jnp.asarray(
        w1 * (scale / np.sqrt(var + 0.001))[None, None, None, :]))
    got = params[0][0]["w"]
    np.testing.assert_array_equal(np.asarray(got.data),
                                  np.asarray(expected.data))


def test_tf_concat_and_depthwise():
    wdw = rng.normal(0, 0.3, (3, 3, 8, 1)).astype(F)
    wa = rng.normal(0, 0.3, (1, 1, 8, 4)).astype(F)
    wb = rng.normal(0, 0.3, (1, 1, 8, 4)).astype(F)
    nodes = [
        ("input", "Placeholder", [], {"dtype": DT}),
        _const("wdw", wdw),
        ("dw", "DepthwiseConv2dNative", ["input", "wdw"],
         {"strides": [1, 1, 1, 1], "padding": "SAME"}),
        _const("wa", wa),
        ("a", "Conv2D", ["dw", "wa"],
         {"strides": [1, 1, 1, 1], "padding": "VALID"}),
        _const("wb", wb),
        ("b", "Conv2D", ["dw", "wb"],
         {"strides": [1, 1, 1, 1], "padding": "VALID"}),
        _const("axis", np.asarray([3], np.int32)),
        ("cat", "ConcatV2", ["a", "b", "axis"], {}),
    ]
    buf = G.build_graphdef(nodes)
    model, params = niti_model_from_graphdef(buf, input_shape=(1, 8, 8, 8))
    kinds = [type(l).__name__ for l in model.layers]
    assert kinds[:2] == ["NITIDepthwiseConv2D", "ParallelConcat"]
    concat = model.layers[1]
    assert isinstance(concat, ParallelConcat)
    from mandheling_tpu.ops.qtensor import QTensor
    from mandheling_tpu.train.train_step import quantize_batch

    x = jnp.asarray(rng.normal(0, 1, (4, 8, 8, 8)), jnp.float32)
    d, e = quantize_batch(x)
    out, _ = model.layers[0].fwd(params[0], QTensor(d, e))
    out2, _ = concat.fwd(params[1], out)
    assert out2.data.shape == (4, 8, 8, 8)
