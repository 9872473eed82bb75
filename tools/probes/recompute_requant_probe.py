#!/usr/bin/env python
"""Recompute-based two-pass requant vs materialized-acc two-pass (r4).

The exact-NITI requant needs the global |acc| max before the shift, so the
conv is inherently two-pass. The r3 accounting assumed pass 2 reads a
materialized int32 accumulator from HBM (4 B/elt round trip). Alternative:
RECOMPUTE the conv in pass 2 with the shift fused as its epilogue — pass 1
becomes conv+abs-max with a scalar output (no acc in HBM), pass 2 becomes
conv+psto-shift writing int8. Traffic drops ~8x for traffic-bound shapes
(LeNet conv1: 213 MB -> 27 MB) at the cost of 2x conv FLOPs. A CSE
barrier (optimization_barrier on the second conv's operands) keeps XLA
from merging the two convs back into one materializing fusion.

Run on TPU: python tools/probes/recompute_requant_probe.py
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


def conv_acc(x, w, stride=(1, 1), pad=((0, 0), (0, 0))):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=stride, padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)


def materialized(x, w, stride=(1, 1), pad=((0, 0), (0, 0))):
    acc = conv_acc(x, w, stride, pad)
    m = jnp.max(jnp.abs(acc))
    bw = numerics.range_estimate_from_max(m)
    y, _ = numerics.requant_forward_from_bw(acc, jnp.int32(0), bw)
    return y


def recompute(x, w, stride=(1, 1), pad=((0, 0), (0, 0))):
    m = jnp.max(jnp.abs(conv_acc(x, w, stride, pad)))
    bw = numerics.range_estimate_from_max(m)
    x2, w2 = jax.lax.optimization_barrier((x, w))
    acc2 = conv_acc(x2, w2, stride, pad)
    y, _ = numerics.requant_forward_from_bw(acc2, jnp.int32(0), bw)
    return y


def main():
    rng = np.random.default_rng(0)
    cases = [
        ("lenet c1 1->20 5x5 @28 b2048", (2048, 28, 28, 1), (5, 5, 1, 20)),
        ("lenet c2 20->52 5x5 @12 b2048", (2048, 12, 12, 20), (5, 5, 20, 52)),
        ("rn 64->64 3x3 @32 b256", (256, 32, 32, 64), (3, 3, 64, 64)),
        ("rn 128->128 3x3 @16 b256", (256, 16, 16, 128), (3, 3, 128, 128)),
        ("mnv2 pw 24->144 1x1 @32 b256", (256, 32, 32, 24), (1, 1, 24, 144)),
        ("mnv2 pw 144->24 1x1 @32 b256", (256, 32, 32, 144), (1, 1, 144, 24)),
        ("stem 3->64 3x3 @32 b256", (256, 32, 32, 3), (3, 3, 3, 64)),
    ]
    out = []
    for name, xshape, wshape in cases:
        x = jnp.asarray(rng.integers(-30, 30, xshape).astype(np.int8))
        w = jnp.asarray(rng.integers(-30, 30, wshape).astype(np.int8))
        # bit-parity first
        ya = np.asarray(jax.jit(materialized)(x, w))
        yb = np.asarray(jax.jit(recompute)(x, w))
        assert np.array_equal(ya, yb), f"parity FAIL {name}"
        ms_a = dev_time(lambda d, x=x, w=w: materialized(x + d, w)) * 1e3
        ms_b = dev_time(lambda d, x=x, w=w: recompute(x + d, w)) * 1e3
        row = {"case": name, "materialized_ms": round(ms_a, 4),
               "recompute_ms": round(ms_b, 4),
               "speedup": round(ms_a / ms_b, 3)}
        out.append(row)
        print(json.dumps(row), flush=True)
    with open("/tmp/recompute_requant_probe.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
