#!/usr/bin/env python
"""Recompute-requant sweep 2: 1x1-conv/matmul shapes + depthwise taps (r4).

Probe 1 (recompute_requant_probe.py) showed recompute loses on spatial
convs (XLA's spatial conv is itself expensive — VMEM slab DMAs — so
doubling it costs more than the acc round-trip saves) but wins 1.9x on the
MNv2 expansion 1x1. This sweep maps the win region for matmul-shaped ops
(1x1 convs / FC) and depthwise-taps, which are cheap to recompute.

Run on TPU: python tools/probes/recompute_requant_probe2.py
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

from mandheling_tpu.ops import depthwise as dw_ops
from mandheling_tpu.ops import numerics

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


def mm_acc(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)


def mm_materialized(a, b):
    acc = mm_acc(a, b)
    bw = numerics.range_estimate_from_max(jnp.max(jnp.abs(acc)))
    y, _ = numerics.requant_forward_from_bw(acc, jnp.int32(0), bw)
    return y


def mm_recompute(a, b):
    bw = numerics.range_estimate_from_max(jnp.max(jnp.abs(mm_acc(a, b))))
    a2, b2 = jax.lax.optimization_barrier((a, b))
    y, _ = numerics.requant_forward_from_bw(mm_acc(a2, b2), jnp.int32(0), bw)
    return y


def dw_materialized(x, w):
    acc = dw_ops._dw_acc_taps(x, w, (1, 1), ((1, 1), (1, 1)))
    bw = numerics.range_estimate_from_max(jnp.max(jnp.abs(acc)))
    y, _ = numerics.requant_forward_from_bw(acc, jnp.int32(0), bw)
    return y


def dw_recompute(x, w):
    acc = dw_ops._dw_acc_taps(x, w, (1, 1), ((1, 1), (1, 1)))
    bw = numerics.range_estimate_from_max(jnp.max(jnp.abs(acc)))
    x2, w2 = jax.lax.optimization_barrier((x, w))
    acc2 = dw_ops._dw_acc_taps(x2, w2, (1, 1), ((1, 1), (1, 1)))
    y, _ = numerics.requant_forward_from_bw(acc2, jnp.int32(0), bw)
    return y


def main():
    rng = np.random.default_rng(0)
    out = []

    # --- matmul (M = b*h*w of the 1x1 conv, or FC batch) ---
    mm_cases = [
        ("mnv2 16->96 @32 b256", 256 * 32 * 32, 16, 96),
        ("mnv2 24->144 @32 b256", 256 * 32 * 32, 24, 144),
        ("mnv2 32->192 @16 b256", 256 * 16 * 16, 32, 192),
        ("mnv2 64->384 @8 b256", 256 * 8 * 8, 64, 384),
        ("mnv2 96->576 @8 b256", 256 * 8 * 8, 96, 576),
        ("mnv2 160->960 @4 b256", 256 * 4 * 4, 160, 960),
        ("mnv2 144->24 @32 b256", 256 * 32 * 32, 144, 24),
        ("mnv2 96->24 @32 b256", 256 * 32 * 32, 96, 16),
        ("rn ds 64->128 @16 b256", 256 * 16 * 16, 64, 128),
        ("lenet fc1 832->500 b2048", 2048, 832, 500),
        ("lenet fc2 500->12 b2048", 2048, 500, 12),
        ("sq expand 64->256 @16 b256", 256 * 16 * 16, 64, 256),
    ]
    for name, m, k, n in mm_cases:
        a = jnp.asarray(rng.integers(-30, 30, (m, k)).astype(np.int8))
        b = jnp.asarray(rng.integers(-30, 30, (k, n)).astype(np.int8))
        ya = np.asarray(jax.jit(mm_materialized)(a, b))
        yb = np.asarray(jax.jit(mm_recompute)(a, b))
        assert np.array_equal(ya, yb), f"parity FAIL {name}"
        ms_a = dev_time(lambda d, a=a, b=b: mm_materialized(a + d, b)) * 1e3
        ms_b = dev_time(lambda d, a=a, b=b: mm_recompute(a + d, b)) * 1e3
        row = {"case": f"mm {name}", "materialized_ms": round(ms_a, 4),
               "recompute_ms": round(ms_b, 4),
               "speedup": round(ms_a / ms_b, 3)}
        out.append(row); print(json.dumps(row), flush=True)

    # --- depthwise taps 3x3 SAME ---
    dw_cases = [
        ("dw 144 @32 b256", (256, 32, 32, 144)),
        ("dw 192 @16 b256", (256, 16, 16, 192)),
        ("dw 384 @8 b256", (256, 8, 8, 384)),
        ("dw 960 @4 b256", (256, 4, 4, 960)),
    ]
    for name, xshape in dw_cases:
        x = jnp.asarray(rng.integers(-30, 30, xshape).astype(np.int8))
        w = jnp.asarray(
            rng.integers(-30, 30, (3, 3, 1, xshape[-1])).astype(np.int8))
        ya = np.asarray(jax.jit(dw_materialized)(x, w))
        yb = np.asarray(jax.jit(dw_recompute)(x, w))
        assert np.array_equal(ya, yb), f"parity FAIL {name}"
        ms_a = dev_time(lambda d, x=x, w=w: dw_materialized(x + d, w)) * 1e3
        ms_b = dev_time(lambda d, x=x, w=w: dw_recompute(x + d, w)) * 1e3
        row = {"case": name, "materialized_ms": round(ms_a, 4),
               "recompute_ms": round(ms_b, 4),
               "speedup": round(ms_a / ms_b, 3)}
        out.append(row); print(json.dumps(row), flush=True)

    with open("/tmp/recompute_requant_probe2.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
