"""Data-parallel training tests on a virtual 8-device CPU mesh.

The key property (SURVEY.md section 7 hard part 5): sharded training is
bit-identical to single-chip training — forward range estimates use
cross-replica pmax, weight-grad int32 accumulators are psum'd before the
single global shift.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mandheling_tpu.data import onehot_padded, synthetic_mnist
from mandheling_tpu.models import NITI_LOGIT_CHANNELS, lenet_niti
from mandheling_tpu.parallel.mesh import data_mesh
from mandheling_tpu.parallel.sharded_step import (
    make_dp_eval_step,
    make_dp_train_step,
    replicate,
    shard_batch,
)
from mandheling_tpu.train import jit_train_step


@pytest.fixture(scope="module")
def setup():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    model = lenet_niti()
    params = model.init(jax.random.PRNGKey(0))
    x, y = synthetic_mnist(256, seed=0)
    return model, params, x, y


def test_dp_bit_identical_to_single_chip(setup):
    model, params, x, y = setup
    bx = jnp.asarray(x[:64].astype(np.float32))
    oh = jnp.asarray(onehot_padded(y[:64], 10, NITI_LOGIT_CHANNELS))

    single = jit_train_step(model)
    # the single-chip step donates its params — pass a deep copy
    p_single, loss_single = single(jax.tree.map(jnp.copy, params), bx, oh)

    mesh = data_mesh(8)
    dp_step = make_dp_train_step(model, mesh, donate=False)
    p_rep = replicate(mesh, params)
    bx_s, oh_s = shard_batch(mesh, bx, oh)
    p_dp, loss_dp = dp_step(p_rep, bx_s, oh_s)

    assert abs(float(loss_single) - float(loss_dp)) < 1e-6
    flat_s = jax.tree.leaves(p_single)
    flat_d = jax.tree.leaves(p_dp)
    for a, b in zip(flat_s, flat_d):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_int8_grad_allreduce_close_to_exact(setup):
    """Exponent-aligned int8 allreduce (ops/allreduce.py): the combined
    gradient must stay close to the exact int32-pre-shift gradient (same
    power-of-two scale, small count-level noise), and training under it
    must still learn (the accuracy gate of SURVEY section 7 hard part 5)."""
    from mandheling_tpu.ops.allreduce import use_grad_allreduce

    model, params, x, y = setup
    mesh = data_mesh(8)
    bx = jnp.asarray(x[:64].astype(np.float32))
    oh = jnp.asarray(onehot_padded(y[:64], 10, NITI_LOGIT_CHANNELS))
    bx_s, oh_s = shard_batch(mesh, bx, oh)

    p_rep = replicate(mesh, params)
    exact_step = make_dp_train_step(model, mesh, donate=False)
    p_exact, _ = exact_step(p_rep, bx_s, oh_s)

    with use_grad_allreduce("int8"):
        int8_step = make_dp_train_step(model, mesh, donate=False)
        p_int8, _ = int8_step(replicate(mesh, params), bx_s, oh_s)

    # same structure; weight deltas are small ints — the approximate mode
    # may differ per-element by a few counts but not wholesale
    for a, b, p0 in zip(jax.tree.leaves(p_exact), jax.tree.leaves(p_int8),
                        jax.tree.leaves(params)):
        a, b, p0 = np.asarray(a), np.asarray(b), np.asarray(p0)
        if a.ndim == 0 or a.size == 1:  # exponents
            continue
        d_exact = a.astype(np.int32) - p0.astype(np.int32)
        d_int8 = b.astype(np.int32) - p0.astype(np.int32)
        # updates agree in scale: mean |delta| within 2x of each other
        if np.abs(d_exact).sum() > 0:
            ratio = (np.abs(d_int8).mean() + 1e-6) / (np.abs(d_exact).mean() + 1e-6)
            assert 0.3 < ratio < 3.0, ratio


@pytest.mark.slow
def test_int8_grad_allreduce_training_learns(setup):
    from mandheling_tpu.ops.allreduce import use_grad_allreduce

    model, params, x, y = setup
    mesh = data_mesh(8)
    with use_grad_allreduce("int8"):
        step = make_dp_train_step(model, mesh, donate=False)
        evals = make_dp_eval_step(model, mesh)
        p = replicate(mesh, params)
        for _ in range(2):
            for i in range(4):
                bx = jnp.asarray(x[i * 64 : (i + 1) * 64].astype(np.float32))
                oh = jnp.asarray(
                    onehot_padded(y[i * 64 : (i + 1) * 64], 10,
                                  NITI_LOGIT_CHANNELS)
                )
                bx_s, oh_s = shard_batch(mesh, bx, oh)
                p, _ = step(p, bx_s, oh_s)
        bx = jnp.asarray(x[:256].astype(np.float32))
        by = jnp.asarray(y[:256])
        bx_s, by_s = shard_batch(mesh, bx, by)
        acc = int(evals(p, bx_s, by_s)) / 256
    assert acc > 0.5, f"int8-allreduce training failed to learn: acc={acc}"


def test_dp_multi_step_and_eval(setup):
    model, params, x, y = setup
    mesh = data_mesh(8)
    dp_step = make_dp_train_step(model, mesh, donate=False)
    dp_eval = make_dp_eval_step(model, mesh)
    p = replicate(mesh, params)
    losses = []
    for i in range(3):
        bx = jnp.asarray(x[i * 64 : (i + 1) * 64].astype(np.float32))
        oh = jnp.asarray(
            onehot_padded(y[i * 64 : (i + 1) * 64], 10, NITI_LOGIT_CHANNELS)
        )
        bx_s, oh_s = shard_batch(mesh, bx, oh)
        p, loss = dp_step(p, bx_s, oh_s)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    bx = jnp.asarray(x[:64].astype(np.float32))
    by = jnp.asarray(y[:64])
    bx_s, by_s = shard_batch(mesh, bx, by)
    correct = int(dp_eval(p, bx_s, by_s))
    assert 0 <= correct <= 64


def test_dp_bit_identical_mnv2_recipe():
    """DP bit-identity for the full r5 MNv2 stack in one program:
    per-channel dw exponent alignment, int16 linear projections
    (out_bits=15), fused relu6 masks, residual adds, and fgrad margin 1
    — every range estimate pmax'd, every grad accumulator psum'd before
    its single shift (DIVERGENCE_r05.json recipe under the mesh)."""
    from mandheling_tpu.models.mobilenet import mobilenet_v2_niti
    from mandheling_tpu.ops import conv as conv_ops
    from mandheling_tpu.ops import depthwise as dw_ops

    conv_ops.set_fgrad_margin(1)
    dw_ops.set_dw_fgrad_margin(1)
    try:
        model = mobilenet_v2_niti(width_mult=0.25, dw_per_channel=True,
                                  proj_bits=15)
        params = model.init(jax.random.PRNGKey(1))
        rng = np.random.default_rng(1)
        bx = jnp.asarray(rng.normal(0, 1, (32, 32, 32, 3)), jnp.float32)
        oh = jnp.asarray(onehot_padded(rng.integers(0, 10, 32), 10, 12))

        single = jit_train_step(model)
        p_single, loss_single = single(jax.tree.map(jnp.copy, params), bx, oh)

        mesh = data_mesh(8)
        dp_step = make_dp_train_step(model, mesh, donate=False)
        p_rep = replicate(mesh, params)
        bx_s, oh_s = shard_batch(mesh, bx, oh)
        p_dp, loss_dp = dp_step(p_rep, bx_s, oh_s)

        assert abs(float(loss_single) - float(loss_dp)) < 1e-6
        for a, b in zip(jax.tree.leaves(p_single), jax.tree.leaves(p_dp)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    finally:
        conv_ops.set_fgrad_margin(2)
        dw_ops.set_dw_fgrad_margin(2)
