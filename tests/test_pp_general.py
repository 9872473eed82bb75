"""General (heterogeneous-stage) pipeline parallelism tests: the real LeNet
staged across 4 devices.

Invariants (parallel/pp_general.py):
- 1 microbatch => bit-identical params and loss vs single-chip execution of
  the same quantized batch;
- multiple microbatches => runs, losses finite, weights move (per-microbatch
  forward range estimates are the documented deviation, exactly like the
  reference's split-batch gradient strategy);
- composes with data parallelism on a ('data','pipe') mesh, still
  bit-identical at 1 microbatch.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mandheling_tpu.data import onehot_padded, synthetic_mnist
from mandheling_tpu.models import NITI_LOGIT_CHANNELS, lenet_niti
from mandheling_tpu.ops.loss import loss_cross_entropy_float, loss_grad_int8
from mandheling_tpu.ops.qtensor import QTensor
from mandheling_tpu.parallel.pp import pipe_mesh, quantize_microbatches
from mandheling_tpu.parallel.pp_general import (
    GPipePlan,
    make_gpipe_train_step,
    shard_packed_params,
)
from mandheling_tpu.train.optim import niti_sgd_update
from mandheling_tpu.train.train_step import quantize_batch


def _single_chip_step(model, params, x_d, x_e, oh):
    """Reference: one full-batch step on the same quantized input."""
    logits, residuals = model.fwd(params, QTensor(x_d, x_e))
    loss = loss_cross_entropy_float(logits.data, logits.exp,
                                    oh.astype(jnp.int32))
    gy = loss_grad_int8(logits.data, logits.exp, oh.astype(jnp.int32))
    _, grads = model.bwd(params, residuals, gy, need_input_grad=False)
    return niti_sgd_update(params, grads), loss


def _data(batch):
    x, y = synthetic_mnist(batch, seed=0)
    xf = jnp.asarray(x.astype(np.float32))
    oh = jnp.asarray(onehot_padded(y, 10, NITI_LOGIT_CHANNELS))
    return xf, oh


def test_lenet_plan_shapes():
    model = lenet_niti()
    params = model.init(jax.random.PRNGKey(0))
    plan = GPipePlan(model, params, (8, 28, 28, 1), n_stages=4)
    assert plan.bounds[0] == 0 and plan.bounds[-1] == len(model.layers)
    # round-trip: pack -> unpack is the identity on params
    packed = plan.pack_params(params)
    rt = plan.unpack_params(packed)
    for a, b in zip(jax.tree.leaves(list(params)), jax.tree.leaves(rt)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_gpipe_lenet_one_microbatch_bit_identical():
    model = lenet_niti()
    params = model.init(jax.random.PRNGKey(0))
    batch = 16
    xf, oh = _data(batch)
    x_d, x_e = quantize_batch(xf)

    ref_params, ref_loss = jax.jit(
        lambda p, d, e, o: _single_chip_step(model, p, d, e, o)
    )(params, x_d, x_e, oh)

    mesh = pipe_mesh(4)
    plan = GPipePlan(model, params, (batch, 28, 28, 1), n_stages=4)
    step = make_gpipe_train_step(plan, mesh, n_microbatches=1, donate=False)
    packed = shard_packed_params(mesh, plan.pack_params(params))
    new_packed, loss = step(
        packed,
        x_d[None], x_e.reshape(1), oh[None],
    )
    assert abs(float(loss) - float(ref_loss)) < 1e-6
    got = plan.unpack_params(jax.device_get(new_packed))
    for a, b in zip(jax.tree.leaves(list(ref_params)),
                    jax.tree.leaves(got)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_gpipe_lenet_microbatched_runs_and_learns():
    model = lenet_niti()
    params = model.init(jax.random.PRNGKey(0))
    batch, M = 32, 4
    xf, oh = _data(batch)
    x_d, x_e = quantize_microbatches(xf, M)
    ohm = jnp.asarray(np.asarray(oh).reshape(M, batch // M, -1))

    mesh = pipe_mesh(4)
    plan = GPipePlan(model, params, (batch // M, 28, 28, 1), n_stages=4)
    step = make_gpipe_train_step(plan, mesh, n_microbatches=M, donate=False)
    packed = shard_packed_params(mesh, plan.pack_params(params))
    # full-batch reference on the same data: the M>1 split-batch gradient
    # must stay within a bounded loss delta of full-batch training (the
    # quantified contract — PP_QUANT_r03.json records the 10-epoch curves:
    # final-loss delta +0.015, accuracy delta +0.05 on real digits)
    ref_p = params
    x1, e1 = quantize_microbatches(xf, 1)
    ref_losses = []
    sstep = jax.jit(lambda p, d, e, o: _single_chip_step(model, p, d, e, o))
    losses = []
    for _ in range(3):
        packed, loss = step(packed, x_d, x_e, ohm)
        losses.append(float(loss))
        ref_p, ref_loss = sstep(ref_p, x1[0], e1[0], oh)
        ref_losses.append(float(ref_loss))
    assert np.isfinite(losses).all()
    got = plan.unpack_params(jax.device_get(packed))
    moved = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(list(params)), jax.tree.leaves(got))
    )
    assert moved
    # bounded delta: same decreasing trend; per-step |loss_m4 - loss_ref|
    # gate set at 2x the measured deltas for THIS config (r4 calibration,
    # batch 32 / M=4 / 10 steps on synthetic digits: per-step deltas
    # 0.015/0.098/0.046/0.044 over the first 4 steps, max 0.24 deep into
    # the noisy small-batch tail; PP_QUANT_r03.json records the
    # epoch-level contract: final-loss delta 0.015, accuracy delta +0.05
    # over 10 real epochs). 2 x max(first-3-step delta 0.098) = 0.2.
    assert losses[-1] < losses[0]
    for i, (a, b) in enumerate(zip(losses, ref_losses)):
        assert abs(a - b) < 0.2, (i, losses, ref_losses)


@pytest.mark.slow
def test_gpipe_composes_with_dp_bit_identical():
    model = lenet_niti()
    params = model.init(jax.random.PRNGKey(0))
    batch = 16
    xf, oh = _data(batch)
    x_d, x_e = quantize_batch(xf)

    ref_params, ref_loss = jax.jit(
        lambda p, d, e, o: _single_chip_step(model, p, d, e, o)
    )(params, x_d, x_e, oh)

    mesh = pipe_mesh(4, n_data=2)  # ('data', 'pipe') = (2, 4)
    plan = GPipePlan(model, params, (batch, 28, 28, 1), n_stages=4)
    step = make_gpipe_train_step(plan, mesh, n_microbatches=1,
                                 data_parallel=True, donate=False)
    packed = shard_packed_params(mesh, plan.pack_params(params))
    new_packed, loss = step(packed, x_d[None], x_e.reshape(1), oh[None])
    assert abs(float(loss) - float(ref_loss)) < 1e-6
    got = plan.unpack_params(jax.device_get(new_packed))
    for a, b in zip(jax.tree.leaves(list(ref_params)), jax.tree.leaves(got)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
