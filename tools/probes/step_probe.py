#!/usr/bin/env python
"""Cumulative section timing of the full NITI train step (TPU):
quantize -> +forward -> +loss/grad -> +backward -> +update.
Differences between consecutive rows isolate each section's real cost
inside one jitted program."""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from mandheling_tpu.data import onehot_padded  # noqa: E402
from mandheling_tpu.models import NITI_LOGIT_CHANNELS, lenet_niti  # noqa: E402
from mandheling_tpu.ops.loss import (  # noqa: E402
    loss_cross_entropy_float,
    loss_grad_int8,
)
from mandheling_tpu.ops.qtensor import QTensor  # noqa: E402
from mandheling_tpu.train.optim import niti_sgd_update  # noqa: E402
from mandheling_tpu.train.train_step import quantize_batch  # noqa: E402

LO, HI = 10, 210
B = 2048


def device_ms(fn, *args):
    @functools.partial(jax.jit, static_argnums=0)
    def run(iters, *a):
        def body(i, dep):
            return fn(*a, dep)

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    np.asarray(run(LO, *args))
    np.asarray(run(HI, *args))
    deltas = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(run(LO, *args))
        t1 = time.perf_counter()
        np.asarray(run(HI, *args))
        t2 = time.perf_counter()
        deltas.append(((t2 - t1) - (t1 - t0)) / (HI - LO))
    return float(np.median(deltas)) * 1e3


def main():
    model = lenet_niti()
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (B, 28, 28, 1)), jnp.float32)
    oh = jnp.asarray(
        onehot_padded(rng.integers(0, 10, B), 10, NITI_LOGIT_CHANNELS)
    )

    def s_quant(p, x, oh, dep):
        d, a = quantize_batch(x + dep)
        return jnp.float32(jnp.sum(d.astype(jnp.int32)) + a)

    def s_fwd(p, x, oh, dep):
        d, a = quantize_batch(x + dep)
        logits, _ = model.fwd(p, QTensor(d, a))
        return jnp.float32(jnp.sum(logits.data.astype(jnp.int32))
                           + logits.exp)

    def s_loss(p, x, oh, dep):
        d, a = quantize_batch(x + dep)
        logits, _ = model.fwd(p, QTensor(d, a))
        loss = loss_cross_entropy_float(logits.data, logits.exp, oh)
        g = loss_grad_int8(logits.data, logits.exp, oh)
        return loss + jnp.float32(jnp.sum(g.astype(jnp.int32)))

    def s_bwd(p, x, oh, dep):
        d, a = quantize_batch(x + dep)
        logits, res = model.fwd(p, QTensor(d, a))
        loss = loss_cross_entropy_float(logits.data, logits.exp, oh)
        g = loss_grad_int8(logits.data, logits.exp, oh)
        _, grads = model.bwd(p, res, g, need_input_grad=False)
        tot = sum(jnp.sum(gr["w"].data.astype(jnp.int32))
                  for gr in grads if gr and isinstance(gr, dict))
        return loss + jnp.float32(tot)

    def s_full(p, x, oh, dep):
        d, a = quantize_batch(x + dep)
        logits, res = model.fwd(p, QTensor(d, a))
        loss = loss_cross_entropy_float(logits.data, logits.exp, oh)
        g = loss_grad_int8(logits.data, logits.exp, oh)
        _, grads = model.bwd(p, res, g, need_input_grad=False)
        newp = niti_sgd_update(p, grads)
        tot = sum(jnp.sum(l.data.astype(jnp.int32))
                  for l in jax.tree.leaves(newp,
                                           is_leaf=lambda v: isinstance(
                                               v, QTensor)))
        return loss + jnp.float32(tot)

    prev = 0.0
    for name, fn in [("quantize", s_quant), ("+fwd", s_fwd),
                     ("+loss", s_loss), ("+bwd", s_bwd), ("+update", s_full)]:
        ms = device_ms(fn, params, x, oh)
        print(f"{name}: {ms:.3f} ms  (section {ms - prev:+.3f})")
        prev = ms


if __name__ == "__main__":
    main()
