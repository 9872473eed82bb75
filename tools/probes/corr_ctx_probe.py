#!/usr/bin/env python
"""Why is the corr filter-grad slow in-context? Variants of the full
fwd+bwd step with different conv1-filter-grad strategies / barriers."""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from mandheling_tpu.data import onehot_padded  # noqa: E402
from mandheling_tpu.models import NITI_LOGIT_CHANNELS, lenet_niti  # noqa: E402
from mandheling_tpu.ops import conv as conv_ops  # noqa: E402
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


def main():
    model = lenet_niti()
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (B, 28, 28, 1)), jnp.float32)
    oh = jnp.asarray(
        onehot_padded(rng.integers(0, 10, B), 10, NITI_LOGIT_CHANNELS)
    )
    n = len(model.layers)

    def make(mode):
        def fn(p, x, oh, dep):
            d, a = quantize_batch(x + dep)
            logits, res = model.fwd(p, QTensor(d, a))
            g = loss_grad_int8(logits.data, logits.exp, oh)
            tot = jnp.int32(0)
            gy = g
            for i in range(n - 1, 0, -1):
                gy, gr = model.layers[i].bwd(p[i], res[i], gy)
                for leaf in jax.tree.leaves(gr):
                    tot = tot + jnp.sum(jnp.asarray(
                        leaf.data if isinstance(leaf, QTensor) else leaf,
                        jnp.int32))
            x0 = res[0]
            if mode == "skip":
                gw = jnp.zeros((5, 5, 1, 20), jnp.int32)
            elif mode.startswith("barrier"):
                x0b, gyb = jax.lax.optimization_barrier((x0, gy))
                with conv_ops.use_filter_grad_strategy(
                        "corr" if "corr" in mode else "conv"):
                    gw = conv_ops.conv2d_filter_grad_acc(
                        x0b, gyb, (5, 5), (1, 1), "VALID")
            else:
                with conv_ops.use_filter_grad_strategy(mode):
                    gw = conv_ops.conv2d_filter_grad_acc(
                        x0, gy, (5, 5), (1, 1), "VALID")
            tot = tot + jnp.sum(gw)
            return jnp.float32(tot)

        return fn

    for mode in ("skip", "corr", "conv", "barrier_corr", "barrier_conv"):
        ms = device_ms(make(mode), params, x, oh)
        print(f"conv1 filter-grad mode {mode}: {ms:.3f} ms")


if __name__ == "__main__":
    main()
