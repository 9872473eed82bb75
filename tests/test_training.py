"""Integration tests: NITI int8 and FP32 training must learn.

The reference validated NITI correctness end-to-end via MNIST accuracy
(SURVEY.md section 4, "No NITI op has a unit test"); we keep that
integration gate AND the unit tests. Uses the synthetic class-structured
dataset (no network egress on this box)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mandheling_tpu.data import DataLoader, onehot_padded, synthetic_mnist
from mandheling_tpu.models import (
    NITI_LOGIT_CHANNELS,
    LeNetFP32,
    lenet_niti,
)
from mandheling_tpu.train import jit_eval_step, jit_train_step
from mandheling_tpu.train.optim import lr_inv, sgd_init, sgd_update


@pytest.mark.slow
def test_niti_int8_training_learns():
    model = lenet_niti()
    params = model.init(jax.random.PRNGKey(0))
    step = jit_train_step(model)
    evals = jit_eval_step(model)

    x, y = synthetic_mnist(1024, seed=0)
    dl = DataLoader(x, y, 64, seed=0)
    losses = []
    for _ in range(2):
        for bx, by in dl.epoch():
            oh = onehot_padded(by, 10, NITI_LOGIT_CHANNELS)
            params, loss = step(params, jnp.asarray(bx), jnp.asarray(oh))
            losses.append(float(loss))

    assert losses[-1] < losses[0] * 0.5, (losses[0], losses[-1])

    xt, yt = synthetic_mnist(256, seed=1)
    correct = int(evals(params, jnp.asarray(xt.astype(np.float32)), jnp.asarray(yt)))
    acc = correct / 256
    assert acc > 0.7, acc


@pytest.mark.slow
def test_fp32_training_learns():
    model = LeNetFP32()
    params = model.init(jax.random.PRNGKey(0))
    velocity = sgd_init(params)

    def loss_fn(p, x, onehot):
        logits = model.apply(p, x)
        logp = jax.nn.log_softmax(logits)
        return -jnp.mean(jnp.sum(logp * onehot, axis=-1))

    @jax.jit
    def step(p, v, x, onehot, lr):
        loss, g = jax.value_and_grad(loss_fn)(p, x, onehot)
        p, v = sgd_update(p, g, v, lr)
        return p, v, loss

    x, y = synthetic_mnist(512, seed=0)
    dl = DataLoader(x, y, 64, seed=0)
    losses = []
    it = 0
    for _ in range(4):
        for bx, by in dl.epoch():
            oh = onehot_padded(by, 10, 10).astype(np.float32)
            bx = (bx / 255.0 - 0.5) * 2.0
            params, velocity, loss = step(
                params, velocity, jnp.asarray(bx), jnp.asarray(oh), lr_inv(0.01, it)
            )
            losses.append(float(loss))
            it += 1
    assert losses[-1] < losses[0] * 0.7, (losses[0], losses[-1])


def test_train_step_is_single_program():
    """The whole train step must trace into one jittable program (the analog
    of the reference's single cached DSP graph per iteration)."""
    model = lenet_niti()
    params = model.init(jax.random.PRNGKey(0))
    from mandheling_tpu.train import make_train_step

    x = jnp.zeros((8, 28, 28, 1), jnp.float32)
    oh = jnp.zeros((8, NITI_LOGIT_CHANNELS), jnp.int32)
    lowered = jax.jit(make_train_step(model)).lower(params, x, oh)
    assert lowered.as_text()  # compiles to a single HLO module
