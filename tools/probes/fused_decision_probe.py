#!/usr/bin/env python
"""Median-of-rounds timing (relay-jitter robust, like bench.py) of the
fused Pallas vs XLA paths on decision-relevant shapes; sets the fused-path
eligibility defaults.

Run on TPU: python tools/probes/fused_decision_probe.py
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp
import numpy as np

from mandheling_tpu.ops import conv as conv_ops
from mandheling_tpu.ops.kernels import use_backend

LO, HI, ROUNDS = 10, 110, 3


def dev_time(fn):
    """fn(dep_i8_scalar) -> int8 output. The dep argument MUST perturb
    fn's input: a loop-invariant body gets hoisted out of the while loop
    by XLA LICM whenever its output is no larger than its inputs, and the
    'measurement' collapses to the loop overhead (observed: 0.002 ms for
    a kernel whose output write alone costs 0.02 ms)."""

    @jax.jit
    def run(iters):
        def body(i, carry):
            dep, acc = carry
            out = fn(dep)
            y = out[0] if isinstance(out, tuple) else out
            return ((y.ravel()[0] & 1).astype(jnp.int8),
                    acc + jnp.sum(y, dtype=jnp.int32))

        _, acc = jax.lax.fori_loop(
            0, iters, body, (jnp.zeros((), jnp.int8), jnp.int32(0))
        )
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

    def ri8(s):
        return jnp.asarray(rng.integers(-30, 30, s).astype(np.int8))

    B = 2048
    cases = [
        ("conv1_fwd b2048 28x28x1 k5x20",
         lambda d: conv_ops.conv2d_forward(x1 + d, jnp.int32(-5), w1, jnp.int32(-6), (1, 1), "VALID")),
        ("conv2_fwd b2048 12x12x20 k5x52",
         lambda d: conv_ops.conv2d_forward(x2 + d, jnp.int32(-5), w2, jnp.int32(-6), (1, 1), "VALID")),
        ("fc1_fwd b2048 832x500",
         lambda d: conv_ops.conv2d_forward(x3 + d, jnp.int32(-5), w3, jnp.int32(-6), (1, 1), "VALID")),
        ("conv2_igrad",
         lambda d: conv_ops.conv2d_input_grad(g2 + d, w2, (12, 12), (1, 1), "VALID")),
        ("resnetL1_fwd b256 32x32x64 k3x64 SAME",
         lambda d: conv_ops.conv2d_forward(x4 + d, jnp.int32(-5), w4, jnp.int32(-6), (1, 1), "SAME")),
        ("mnv2_pw_fwd b256 16x16x96 -> 64 (1x1)",
         lambda d: conv_ops.conv2d_forward(x5 + d, jnp.int32(-5), w5, jnp.int32(-6), (1, 1), "VALID")),
    ]
    x1, w1 = ri8((B, 28, 28, 1)), ri8((5, 5, 1, 20))
    x2, w2 = ri8((B, 12, 12, 20)), ri8((5, 5, 20, 52))
    x3, w3 = ri8((B, 1, 1, 832)), ri8((1, 1, 832, 500))
    g2 = ri8((B, 8, 8, 52))
    x4, w4 = ri8((256, 32, 32, 64)), ri8((3, 3, 64, 64))
    x5, w5 = ri8((256, 16, 16, 96)), ri8((1, 1, 96, 64))

    for name, fn in cases:
        row = {"op": name}
        for backend in ("xla", "pallas"):
            with use_backend(backend):
                try:
                    row[backend] = round(dev_time(fn) * 1e3, 3)
                except Exception as e:
                    row[backend] = f"{type(e).__name__}"[:40]
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
