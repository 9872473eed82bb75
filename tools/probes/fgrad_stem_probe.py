#!/usr/bin/env python
"""Filter-grad strategy at small input-channel counts (model stems):
"corr" (stacked-slab GEMM + gather-sum — the r1 winner when the "conv"
strategy materialized transposes) vs "conv" with the r3 logical dimension
numbers (no transposes). Decides the auto-threshold in ops/conv.py.

Run on TPU: python tools/probes/fgrad_stem_probe.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp
import numpy as np

from mandheling_tpu.utils import compile_cache

compile_cache.enable()

from mandheling_tpu.ops import conv as conv_ops

LO, HI, ROUNDS = 5, 55, 3


def dev_time(fn):
    @jax.jit
    def run(iters):
        def body(i, carry):
            dep, acc = carry
            y = fn(dep)
            return ((y.ravel()[0] & 1).astype(jnp.int8),
                    acc + jnp.sum(y, dtype=jnp.int32))

        _, acc = jax.lax.fori_loop(
            0, iters, body, (jnp.zeros((), jnp.int8), jnp.int32(0)))
        return acc

    lo, hi = jnp.int32(LO), jnp.int32(HI)
    np.asarray(run(lo)); np.asarray(run(hi))
    deltas = []
    for _ in range(ROUNDS):
        t0 = time.perf_counter(); np.asarray(run(lo))
        t1 = time.perf_counter(); np.asarray(run(hi))
        t2 = time.perf_counter()
        deltas.append(((t2 - t1) - (t1 - t0)) / (HI - LO))
    return float(np.median(deltas))


def main():
    rng = np.random.default_rng(0)
    cases = [
        ("stem 3->64 3x3 @32x32 b256", (256, 32, 32, 3), (3, 3), 64),
        ("lenet 1->20 5x5 @28x28 b2048", (2048, 28, 28, 1), (5, 5), 20),
        ("mid 8->32 3x3 @16x16 b256", (256, 16, 16, 8), (3, 3), 32),
    ]
    for name, xshape, k, oc in cases:
        b, h, w_, ic = xshape
        oh, ow = h - k[0] + 1, w_ - k[1] + 1
        x = jnp.asarray(rng.integers(-30, 30, xshape).astype(np.int8))
        gy = jnp.asarray(rng.integers(-30, 30, (b, oh, ow, oc)).astype(np.int8))
        for strat in ("corr", "conv", "matmul"):
            with conv_ops.use_filter_grad_strategy(strat):
                try:
                    ms = dev_time(
                        lambda d, x=x, gy=gy, k=k: conv_ops.conv2d_filter_grad(
                            x + d, gy, k, (1, 1), "VALID")) * 1e3
                    print(json.dumps({"op": f"fgrad {name} {strat}",
                                      "ms": round(ms, 4)}), flush=True)
                except Exception as e:
                    print(json.dumps({"op": f"fgrad {name} {strat}",
                                      "error": str(e)[:120]}), flush=True)


if __name__ == "__main__":
    main()
