#!/usr/bin/env python
"""Dense conv+requant: does splitting the abs-max reduce out of the conv
fusion (optimization_barrier) change MXU utilization on the ResNet-class
shapes where the r3 profile shows conv+reduce fusions at ~15% of peak?

Run on TPU: python tools/probes/conv_barrier_probe.py
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


def conv_requant(x, w, barrier):
    acc = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    if barrier:
        acc = jax.lax.optimization_barrier(acc)
    m = jnp.max(jnp.abs(acc))
    bw = numerics.range_estimate_from_max(m)
    y, _ = numerics.requant_forward_from_bw(acc, jnp.int32(-5), bw)
    return y


def main():
    rng = np.random.default_rng(0)
    B = 256
    shapes = [(32, 64, 64), (16, 128, 128), (8, 256, 256), (4, 512, 512)]
    for hw, ic, oc in shapes:
        x = jnp.asarray(rng.integers(-30, 30, (B, hw, hw, ic)).astype(np.int8))
        w = jnp.asarray(rng.integers(-20, 20, (3, 3, ic, oc)).astype(np.int8))
        flops = 2 * B * hw * hw * 9 * ic * oc
        for barrier in (False, True):
            name = f"conv3x3 {hw}x{hw} {ic}->{oc} {'barrier' if barrier else 'fused'}"
            dt = dev_time(lambda d, x=x, w=w, b=barrier: conv_requant(
                x + d, w, b))
            print(json.dumps({"op": name, "ms": round(dt * 1e3, 4),
                              "tops": round(flops / dt / 1e12, 1)}),
                  flush=True)


if __name__ == "__main__":
    main()
