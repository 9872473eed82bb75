"""Pipeline-parallel training tests on the virtual 8-device CPU mesh —
the homogeneous toy block stack staged through the GENERAL planner
(parallel/pp_general; the r2 homogeneous-only pipeline was consolidated
away per the round-2 verdict).

Properties:
- With 1 microbatch, the GPipe pipeline is bit-identical to single-chip
  execution of the same stacked block sequence.
- Composed data x pipe (2x2) with 1 microbatch is also bit-identical.
- With >1 microbatches (the reference's split-batch gradient analog,
  NITI_DSPGradientSplitBatchConv_Int8.cpp) training still runs, updates
  weights, and stays within a bounded loss delta of full-batch training
  (see test_pp_general for the quantified M>1 gates).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mandheling_tpu.data import onehot_padded
from mandheling_tpu.ops.loss import loss_cross_entropy_float, loss_grad_int8
from mandheling_tpu.ops.qtensor import QTensor
from mandheling_tpu.parallel.pp import (
    homogeneous_blocks,
    pipe_mesh,
    quantize_microbatches,
)
from mandheling_tpu.parallel.pp_general import (
    GPipePlan,
    make_gpipe_train_step,
    shard_packed_params,
)
from mandheling_tpu.train.optim import niti_sgd_update

C = 32
L = 8


def single_chip_step(model, params, x_d, x_e, oh):
    """Single-chip reference on the same Sequential (explicit fwd/bwd)."""
    logits, residuals = model.fwd(params, QTensor(x_d, x_e))
    loss = loss_cross_entropy_float(logits.data, logits.exp, oh)
    gy = loss_grad_int8(logits.data, logits.exp, oh)
    _, grads = model.bwd(params, residuals, gy, need_input_grad=False)
    return niti_sgd_update(params, grads), loss


@pytest.fixture(scope="module")
def setup():
    assert len(jax.devices()) >= 8
    model = homogeneous_blocks(L, C)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (16, 1, 1, C)), jnp.float32)
    labels = rng.integers(0, 10, 16)
    oh = jnp.asarray(onehot_padded(labels, 10, C))
    return model, params, x, oh


def _weights(params):
    return [np.asarray(p["w"].data) for p in params if p]


def test_pp_single_microbatch_bit_identical(setup):
    model, params, x, oh = setup
    x_d, x_e = quantize_microbatches(x, 1)

    ref_params, ref_loss = single_chip_step(model, params, x_d[0], x_e[0], oh)

    mesh = pipe_mesh(n_stages=4)
    plan = GPipePlan(model, params, (16, 1, 1, C), n_stages=4)
    step = make_gpipe_train_step(plan, mesh, n_microbatches=1, donate=False)
    packed = shard_packed_params(mesh, plan.pack_params(params))
    new_packed, loss = step(packed, x_d, x_e, oh[None])
    new_params = plan.unpack_params(
        tuple(np.asarray(b) for b in new_packed))

    assert abs(float(ref_loss) - float(loss)) < 1e-6
    for a, b in zip(_weights(ref_params), _weights(new_params)):
        np.testing.assert_array_equal(a, b)


def test_pp_times_dp_bit_identical(setup):
    model, params, x, oh = setup
    x_d, x_e = quantize_microbatches(x, 1)

    ref_params, ref_loss = single_chip_step(model, params, x_d[0], x_e[0], oh)

    mesh = pipe_mesh(n_stages=2, n_data=2)
    plan = GPipePlan(model, params, (16, 1, 1, C), n_stages=2)
    step = make_gpipe_train_step(plan, mesh, n_microbatches=1,
                                 data_parallel=True, donate=False)
    packed = shard_packed_params(mesh, plan.pack_params(params))
    new_packed, loss = step(packed, x_d, x_e, oh[None])
    new_params = plan.unpack_params(
        tuple(np.asarray(b) for b in new_packed))

    assert abs(float(ref_loss) - float(loss)) < 1e-6
    for a, b in zip(_weights(ref_params), _weights(new_params)):
        np.testing.assert_array_equal(a, b)


def test_pp_microbatched_trains(setup):
    model, params, x, oh = setup
    M = 4
    x_d, x_e = quantize_microbatches(x, M)
    oh_mb = oh.reshape(M, -1, C)

    mesh = pipe_mesh(n_stages=4)
    plan = GPipePlan(model, params, (16 // M, 1, 1, C), n_stages=4)
    step = make_gpipe_train_step(plan, mesh, n_microbatches=M, donate=False)
    packed = shard_packed_params(mesh, plan.pack_params(params))
    p8_before = np.asarray(packed[0])
    losses = []
    for _ in range(3):
        packed, loss = step(packed, x_d, x_e, oh_mb)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert not np.array_equal(np.asarray(packed[0]), p8_before)
