"""Caffe .caffemodel import — the last converter leg (reference
`tools/converter/source/caffe`), through the shared region walker.
Round-trips our own wire writer; covers in-place layer renaming, BN+Scale
folding, Eltwise-SUM residuals, channel Concat, and end-to-end training.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mandheling_tpu.data import onehot_padded
from mandheling_tpu.nn.blocks import ParallelConcat, ResidualBlock
from mandheling_tpu.train import make_train_step
from mandheling_tpu.utils.caffe_model import (
    build_caffemodel,
    load_caffemodel,
    niti_model_from_caffemodel,
)

rng = np.random.default_rng(13)
F = np.float32


def _w(o, i, k=3):
    return rng.normal(0, 0.2, (o, i, k, k)).astype(F)


def test_wire_roundtrip_and_inplace_rename():
    w1 = _w(8, 3)
    layers = [
        ("conv1", "Convolution", ["data"], ["conv1"],
         {"num_output": 8, "kernel_size": 3, "pad": 1}, [w1]),
        ("relu1", "ReLU", ["conv1"], ["conv1"], {}, []),  # in-place
        ("conv2", "Convolution", ["conv1"], ["conv2"],
         {"num_output": 8, "kernel_size": 3, "pad": 1}, [_w(8, 8)]),
    ]
    buf = build_caffemodel(layers, ["data"], [[1, 3, 8, 8]])
    net = load_caffemodel(buf)
    assert net.inputs == ["data"]
    assert net.input_shapes == [[1, 3, 8, 8]]
    assert [l.type for l in net.layers] == ["Convolution", "ReLU",
                                            "Convolution"]
    np.testing.assert_array_equal(net.layers[0].blobs[0].data, w1)
    assert net.layers[0].params["pad"] == 1
    # in-place relu got a unique top; conv2 consumes it
    relu = net.layers[1]
    assert relu.top[0] != relu.bottom[0]
    assert net.layers[2].bottom == [relu.top[0]]


def test_caffe_lenet_imports_and_trains():
    layers = [
        ("conv1", "Convolution", ["data"], ["c1"],
         {"num_output": 8, "kernel_size": 5}, [_w(8, 1, 5)]),
        ("relu1", "ReLU", ["c1"], ["c1"], {}, []),
        ("pool1", "Pooling", ["c1"], ["p1"],
         {"pool": 0, "kernel_size": 2, "stride": 2}, []),
        ("conv2", "Convolution", ["p1"], ["c2"],
         {"num_output": 12, "kernel_size": 3}, [_w(12, 8)]),
        ("relu2", "ReLU", ["c2"], ["c2"], {}, []),
        ("gap", "Pooling", ["c2"], ["g"],
         {"pool": 1, "global_pooling": 1}, []),
        ("fc", "InnerProduct", ["g"], ["logits"],
         {"num_output": 12}, [rng.normal(0, 0.1, (12, 12)).astype(F)]),
    ]
    buf = build_caffemodel(layers, ["data"], [[1, 1, 28, 28]])
    model, params = niti_model_from_caffemodel(buf)
    kinds = [type(l).__name__ for l in model.layers]
    assert kinds == ["NITIConv2D", "NITIRelu", "NITIMaxPool", "NITIConv2D",
                     "NITIRelu", "GlobalAvgPool", "Flatten", "NITIConv2D",
                     "SqueezeLogits"]
    step = jax.jit(make_train_step(model))
    x = jnp.asarray(rng.normal(0, 1, (16, 28, 28, 1)), jnp.float32)
    oh = jnp.asarray(onehot_padded(rng.integers(0, 10, 16), 10, 12))
    p, loss = step(params, x, oh)
    assert np.isfinite(float(loss))


def test_caffe_bn_scale_fold_and_residual():
    w1 = _w(8, 8)
    mean = rng.normal(0, 1, 8).astype(F)
    var = rng.uniform(0.5, 2.0, 8).astype(F)
    gamma = rng.uniform(0.5, 2.0, 8).astype(F)
    sf = np.asarray([2.0], F)  # BatchNorm scale_factor blob
    layers = [
        ("conv1", "Convolution", ["data"], ["c1"],
         {"num_output": 8, "kernel_size": 3, "pad": 1}, [w1]),
        ("bn1", "BatchNorm", ["c1"], ["c1"],
         {"use_global_stats": 1}, [mean * 2.0, var * 2.0, sf]),
        ("sc1", "Scale", ["c1"], ["c1"], {"axis": 1}, [gamma]),
        ("res", "Eltwise", ["c1", "data"], ["r"], {"operation": 1}, []),
        ("relu", "ReLU", ["r"], ["out"], {}, []),
    ]
    buf = build_caffemodel(layers, ["data"], [[1, 8, 8, 8]])
    model, params = niti_model_from_caffemodel(buf)
    assert isinstance(model.layers[0], ResidualBlock)
    from mandheling_tpu.ops.qtensor import quantize_weights

    factor = gamma / np.sqrt(var + 1e-5)  # moments divided by sf first
    expected = quantize_weights(jnp.asarray(
        w1.transpose(2, 3, 1, 0) * factor[None, None, None, :]))
    got = params[0][0]["w"]
    np.testing.assert_array_equal(np.asarray(got.data),
                                  np.asarray(expected.data))


def test_caffe_concat_branches():
    wa = _w(4, 8, 1)
    wb = _w(4, 8, 1)
    layers = [
        ("a", "Convolution", ["data"], ["a"],
         {"num_output": 4, "kernel_size": 1}, [wa]),
        ("b", "Convolution", ["data"], ["b"],
         {"num_output": 4, "kernel_size": 1}, [wb]),
        ("cat", "Concat", ["a", "b"], ["out"], {"axis": 1}, []),
    ]
    buf = build_caffemodel(layers, ["data"], [[1, 8, 8, 8]])
    model, params = niti_model_from_caffemodel(buf)
    assert isinstance(model.layers[0], ParallelConcat)
    from mandheling_tpu.ops.qtensor import QTensor
    from mandheling_tpu.train.train_step import quantize_batch

    x = jnp.asarray(rng.normal(0, 1, (4, 8, 8, 8)), jnp.float32)
    d, e = quantize_batch(x)
    out, _ = model.layers[0].fwd(params[0], QTensor(d, e))
    assert out.data.shape == (4, 8, 8, 8)


def test_caffe_rejects_nonzero_bias():
    layers = [
        ("conv1", "Convolution", ["data"], ["c1"],
         {"num_output": 4, "kernel_size": 3},
         [_w(4, 1), np.ones(4, F)]),
    ]
    buf = build_caffemodel(layers, ["data"], [[1, 1, 8, 8]])
    with pytest.raises(ValueError, match="bias"):
        niti_model_from_caffemodel(buf)
