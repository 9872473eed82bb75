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
