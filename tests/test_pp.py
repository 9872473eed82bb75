"""Pipeline-parallel training tests on the virtual 8-device CPU mesh.

Properties (mandheling_tpu/parallel/pp.py):
- With 1 microbatch, the GPipe pipeline is bit-identical to single-chip
  execution of the same stacked block sequence.
- Composed data x pipe (2x2) with 1 microbatch is also bit-identical.
- With >1 microbatches (the reference's split-batch gradient analog) training
  still runs and updates weights.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mandheling_tpu.data import onehot_padded
from mandheling_tpu.ops import conv as conv_ops
from mandheling_tpu.ops import relu as relu_ops
from mandheling_tpu.ops.loss import loss_cross_entropy_float, loss_grad_int8
from mandheling_tpu.ops.numerics import int8_clip
from mandheling_tpu.ops.qtensor import QTensor
from mandheling_tpu.parallel.pp import (
    init_pp_params,
    make_pp_train_step,
    pipe_mesh,
    quantize_microbatches,
    shard_pp_params,
)

KERNEL = (1, 1)
PADDING = "VALID"
C = 32
L = 8


def single_chip_step(params: QTensor, x_d, x_e, oh):
    """Hand-rolled single-chip reference of the same homogeneous block stack
    (conv 1x1 + relu, per-layer NITI requant, integer update)."""
    d, e = x_d, x_e
    xs, ys = [], []
    for l in range(L):
        y, y_exp = conv_ops.conv2d_forward(
            d, e, params.data[l], params.exp[l], (1, 1), PADDING
        )
        xs.append(d)
        ys.append(y)
        d, e = relu_ops.relu(y), y_exp
    logits = d.reshape(d.shape[0], -1)
    loss = loss_cross_entropy_float(logits, e, oh)
    g = loss_grad_int8(logits, e, oh).reshape(d.shape)
    gws = []
    for l in range(L - 1, -1, -1):
        g = relu_ops.relu_grad(ys[l], g)
        gw = conv_ops.conv2d_filter_grad(xs[l], g, KERNEL, (1, 1), PADDING)
        gws.insert(0, gw)
        g = conv_ops.conv2d_input_grad(
            g, params.data[l], x_d.shape[1:3], (1, 1), PADDING
        )
    new = int8_clip(
        params.data.astype(jnp.int32) - jnp.stack(gws).astype(jnp.int32)
    ).astype(jnp.int8)
    return QTensor(new, params.exp), loss


@pytest.fixture(scope="module")
def setup():
    assert len(jax.devices()) >= 8
    params = init_pp_params(jax.random.PRNGKey(0), L, C, KERNEL)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (16, 1, 1, C)), jnp.float32)
    labels = rng.integers(0, 10, 16)
    oh = jnp.asarray(onehot_padded(labels, 10, C))
    return params, x, oh


def test_pp_single_microbatch_bit_identical(setup):
    params, x, oh = setup
    x_d, x_e = quantize_microbatches(x, 1)

    ref_params, ref_loss = single_chip_step(params, x_d[0], x_e[0], oh)

    mesh = pipe_mesh(n_stages=4)
    step = make_pp_train_step(mesh, n_microbatches=1, kernel=KERNEL,
                              padding=PADDING, donate=False)
    p = shard_pp_params(mesh, params)
    new_params, loss = step(p, x_d, x_e, oh[None])

    assert abs(float(ref_loss) - float(loss)) < 1e-6
    np.testing.assert_array_equal(
        np.asarray(ref_params.data), np.asarray(new_params.data)
    )


def test_pp_times_dp_bit_identical(setup):
    params, x, oh = setup
    x_d, x_e = quantize_microbatches(x, 1)

    ref_params, ref_loss = single_chip_step(params, x_d[0], x_e[0], oh)

    mesh = pipe_mesh(n_stages=2, n_data=2)
    step = make_pp_train_step(mesh, n_microbatches=1, kernel=KERNEL,
                              padding=PADDING, data_parallel=True,
                              donate=False)
    p = shard_pp_params(mesh, params)
    new_params, loss = step(p, x_d, x_e, oh[None])

    assert abs(float(ref_loss) - float(loss)) < 1e-6
    np.testing.assert_array_equal(
        np.asarray(ref_params.data), np.asarray(new_params.data)
    )


def test_pp_microbatched_trains(setup):
    params, x, oh = setup
    M = 4
    x_d, x_e = quantize_microbatches(x, M)
    oh_mb = oh.reshape(M, -1, C)

    mesh = pipe_mesh(n_stages=4)
    step = make_pp_train_step(mesh, n_microbatches=M, kernel=KERNEL,
                              padding=PADDING, donate=False)
    p = shard_pp_params(mesh, params)
    losses = []
    for _ in range(3):
        p, loss = step(p, x_d, x_e, oh_mb)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert not np.array_equal(np.asarray(p.data), np.asarray(params.data))
