#!/usr/bin/env python
"""Bisect the in-step backward cost: time fwd+loss+backward truncated at
successive layers to find where the composed cost jumps."""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from mandheling_tpu.data import onehot_padded  # noqa: E402
from mandheling_tpu.models import NITI_LOGIT_CHANNELS, lenet_niti  # noqa: E402
from mandheling_tpu.ops.loss import loss_grad_int8  # noqa: E402
from mandheling_tpu.ops.qtensor import QTensor  # noqa: E402
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


def leaves_sum(tree):
    tot = jnp.int32(0)
    for leaf in jax.tree.leaves(tree):
        tot = tot + jnp.sum(leaf.data.astype(jnp.int32)) if isinstance(
            leaf, QTensor) else tot + jnp.sum(jnp.asarray(leaf,
                                                          jnp.int32))
    return tot


def main():
    model = lenet_niti()
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (B, 28, 28, 1)), jnp.float32)
    oh = jnp.asarray(
        onehot_padded(rng.integers(0, 10, B), 10, NITI_LOGIT_CHANNELS)
    )
    n = len(model.layers)

    def make(stop_i, params_only_at_0):
        def fn(p, x, oh, dep):
            d, a = quantize_batch(x + dep)
            logits, res = model.fwd(p, QTensor(d, a))
            g = loss_grad_int8(logits.data, logits.exp, oh)
            tot = jnp.int32(0)
            gy = g
            for i in range(n - 1, stop_i - 1, -1):
                if i == 0 and params_only_at_0:
                    gr = model.layers[0].bwd_params_only(p[0], res[0], gy)
                else:
                    gy, gr = model.layers[i].bwd(p[i], res[i], gy)
                for leaf in jax.tree.leaves(gr):
                    tot = tot + jnp.sum(jnp.asarray(leaf.data if isinstance(
                        leaf, QTensor) else leaf, jnp.int32))
            tot = tot + jnp.sum(gy.astype(jnp.int32))
            return jnp.float32(tot)

        return fn

    prev = 0.0
    names = [type(l).__name__ for l in model.layers]
    for stop in range(n, -1, -1):
        label = "none" if stop == n else names[stop]
        fn = make(stop, params_only_at_0=(stop == 0))
        ms = device_ms(fn, params, x, oh)
        print(f"bwd down to layer {stop:2d} ({label}): {ms:.3f} ms "
              f"(+{ms - prev:.3f})")
        prev = ms


if __name__ == "__main__":
    main()
