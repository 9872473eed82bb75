"""Benchmark-table model families: SqueezeNet v1.0, ResNet-v2-50,
Inception-v3 (the reference's headline benchmark models,
`execution-engine/benchmark/result/2020-3-22.md`) as trainable NITI models,
plus the multi-branch plumbing they are built from (int8 channel concat +
ParallelConcat)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mandheling_tpu.models import (
    inceptionv3_niti,
    resnet50v2_niti,
    squeezenet_niti,
)
from mandheling_tpu.nn.blocks import ParallelConcat
from mandheling_tpu.nn.layers import NITIConv2D, NITIRelu
from mandheling_tpu.nn.module import Sequential
from mandheling_tpu.ops.eltwise import concat_int8
from mandheling_tpu.ops.qtensor import QTensor
from mandheling_tpu.train import jit_train_step


def test_concat_int8_exponent_alignment():
    a = jnp.array([[100, -100]], jnp.int8)
    b = jnp.array([[64, -65]], jnp.int8)
    # b has the larger exponent: a must be right-shifted by 2 (truncating
    # toward zero, same rule as the residual add), b passes through.
    y, e = concat_int8([a, b], [jnp.int32(1), jnp.int32(3)])
    assert int(e) == 3
    np.testing.assert_array_equal(np.asarray(y), [[25, -25, 64, -65]])
    # equal exponents: pure concat
    y2, e2 = concat_int8([a, b], [jnp.int32(2), jnp.int32(2)])
    assert int(e2) == 2
    np.testing.assert_array_equal(np.asarray(y2), [[100, -100, 64, -65]])


def test_parallel_concat_fwd_bwd():
    layer = ParallelConcat(
        [
            Sequential([NITIConv2D(4, 8, (1, 1)), NITIRelu()]),
            Sequential([NITIConv2D(4, 4, (3, 3), (1, 1), "SAME"), NITIRelu()]),
        ]
    )
    params = layer.init(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    x = jax.random.randint(key, (2, 6, 6, 4), -100, 100, jnp.int8)
    q = QTensor(x, jnp.int32(0))
    out, res = layer.fwd(params, q)
    assert out.data.shape == (2, 6, 6, 12)
    assert out.data.dtype == jnp.int8

    gy = jax.random.randint(jax.random.PRNGKey(2), out.data.shape, -50, 50, jnp.int8)
    gx, grads = layer.bwd(params, res, gy)
    assert gx.shape == x.shape and gx.dtype == jnp.int8
    # each branch got exactly its channel slice: recompute branch 0 alone
    g0, gb0 = layer.branches[0].bwd(params[0], res[0][0], gy[..., :8])
    np.testing.assert_array_equal(
        np.asarray(grads[0][0]["w"].data), np.asarray(gb0[0]["w"].data)
    )
    g1, _ = layer.branches[1].bwd(params[1], res[0][1], gy[..., 8:])
    manual = jnp.clip(
        g0.astype(jnp.int32) + g1.astype(jnp.int32), -127, 127
    ).astype(jnp.int8)
    np.testing.assert_array_equal(np.asarray(gx), np.asarray(manual))


def _one_step(model, hw, ch=3, batch=4, classes=10):
    params = model.init(jax.random.PRNGKey(0))
    step = jit_train_step(model)
    x = np.random.RandomState(0).rand(batch, hw, hw, ch).astype(np.float32)
    logit_w = (classes + 3) // 4 * 4
    oh = np.zeros((batch, logit_w), np.float32)
    oh[np.arange(batch), np.arange(batch) % classes] = 1.0
    params, loss = step(params, jnp.asarray(x), jnp.asarray(oh))
    assert np.isfinite(float(loss)), float(loss)
    return params


@pytest.mark.slow
def test_squeezenet_train_step():
    _one_step(squeezenet_niti(num_classes=10), 32)


@pytest.mark.slow
def test_resnet50v2_train_step():
    _one_step(resnet50v2_niti(num_classes=10), 32, batch=2)


@pytest.mark.slow
def test_inceptionv3_train_step():
    _one_step(inceptionv3_niti(num_classes=10), 75, batch=2)


@pytest.mark.slow
def test_squeezenet_learns():
    from mandheling_tpu.data import DataLoader, onehot_padded, synthetic_mnist

    model = squeezenet_niti(num_classes=10)
    params = model.init(jax.random.PRNGKey(0))
    step = jit_train_step(model)
    x, y = synthetic_mnist(512, seed=0)
    x3 = np.repeat(x.reshape(-1, 28, 28, 1), 3, axis=-1)
    x3 = np.pad(x3, ((0, 0), (2, 2), (2, 2), (0, 0)))
    dl = DataLoader(x3, y, 64, seed=0)
    losses = []
    for _ in range(2):
        for bx, by in dl.epoch():
            oh = onehot_padded(by, 10, 12)
            params, loss = step(params, jnp.asarray(bx), jnp.asarray(oh))
            losses.append(float(loss))
    assert losses[-1] < losses[0], (losses[0], losses[-1])
