#!/usr/bin/env python
"""Roofline harness: int8 matmul/conv kernel throughput vs MXU peak.

Measures the Pallas int8 MXU matmul, the XLA int8 dot, and the fused
conv+requant paths on training-relevant shapes; reports achieved int8 TOPS
and fraction of the chip's peak (BASELINE.json north star: >=80% of int8
roofline on the conv/matmul-gradient kernels).

Run on TPU:  python tools/roofline.py [--sizes 4096] [--json]
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mandheling_tpu.utils import compile_cache

compile_cache.enable()

# peak int8 TOPS per chip (MXU); v5e ~394.7, v4 ~275 (bf16x2), v5p ~918
PEAK_INT8_TOPS = {
    "v5 lite": 394.7,
    "v5e": 394.7,
    "v5p": 918.0,
    "v4": 275.0,
    "v6e": 918.0,  # trillium int8
}


def detect_peak() -> float:
    kind = jax.devices()[0].device_kind.lower()
    for k, v in PEAK_INT8_TOPS.items():
        if k in kind:
            return v
    return 394.7


def time_fn_device(int8_fn, a, b, iters_lo=5, iters_hi=55):
    """Time `int8_fn(a, b) -> int8 (n, n)` with the loop ON DEVICE: each
    iteration's output feeds the next iteration's input (true data
    dependency, nothing hoistable), one jitted dispatch, scalar readback.
    Host-side block_until_ready is NOT reliable through the axon relay —
    naive timing overstates throughput by >10x (see bench.py). The relay
    also adds a large FIXED cost per dispatch (~30 ms), so the per-iteration
    time is the difference between a long and a short loop."""

    @jax.jit
    def run(a, b, iters):
        def body(i, a):
            return int8_fn(a, b)

        out = jax.lax.fori_loop(0, iters, body, a)
        return jnp.sum(out.astype(jnp.int32))

    iters_lo, iters_hi = jnp.int32(iters_lo), jnp.int32(iters_hi)
    np.asarray(run(a, b, iters_lo))  # compile (once: iters is traced) + warm
    np.asarray(run(a, b, iters_hi))
    t0 = time.perf_counter()
    np.asarray(run(a, b, iters_lo))
    t1 = time.perf_counter()
    np.asarray(run(a, b, iters_hi))
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / int(iters_hi - iters_lo)


def _to_int8(c32):
    # cheap (O(n^2)) epilogue to close the int8->int8 loop without
    # saturating: keep the low 7 bits.
    return (c32 & 0x3F).astype(jnp.int8)


def bench_matmul(n: int, backend: str):
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(-100, 100, (n, n)), jnp.int8)
    b = jnp.asarray(rng.integers(-100, 100, (n, n)), jnp.int8)

    if backend == "pallas":
        from mandheling_tpu.ops.kernels.matmul_int8 import matmul_acc_pallas_padded

        fn = lambda a, b: _to_int8(matmul_acc_pallas_padded(a, b))
    else:
        fn = lambda a, b: _to_int8(
            jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
            )
        )
    dt = time_fn_device(fn, a, b)
    tops = 2 * n**3 / dt / 1e12
    return dt, tops


def bench_matmul_requant(n: int):
    """Full NITI pattern: int8 GEMM -> range estimate -> psto shift -> int8."""
    from mandheling_tpu.ops.matmul import matmul_int8_forward

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(-100, 100, (n, n)), jnp.int8)
    b = jnp.asarray(rng.integers(-100, 100, (n, n)), jnp.int8)
    fn = lambda a, b: matmul_int8_forward(a, jnp.int32(-5), b, jnp.int32(-6))[0]
    dt = time_fn_device(fn, a, b)
    return dt, 2 * n**3 / dt / 1e12


def bench_matmul_requant_fused(n: int):
    """Same NITI pattern through the fused two-phase Pallas kernels: the
    int32 accumulator never leaves VMEM (2x the GEMM flops, 1/3 the HBM
    traffic of the unfused 3-pass lowering)."""
    from mandheling_tpu.ops import numerics
    from mandheling_tpu.ops.kernels.fused_matmul_int8 import (
        matmul_max_pallas,
        matmul_requant_pallas,
    )

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(-100, 100, (n, n)), jnp.int8)
    b = jnp.asarray(rng.integers(-100, 100, (n, n)), jnp.int8)

    def fn(a, b):
        m = matmul_max_pallas(a, b)
        shift = numerics.forward_shift(numerics.range_estimate_from_max(m))
        return matmul_requant_pallas(a, b, shift)

    dt = time_fn_device(fn, a, b)
    return dt, 2 * n**3 / dt / 1e12


def bench_conv_requant(backend: str, shape=(256, 32, 32, 64), oc=64, k=3):
    """Full NITI conv forward (requant included) on a CIFAR-model shape;
    TOPS counted in DENSE conv flops (what a user's model buys)."""
    from mandheling_tpu.ops import conv as conv_ops
    from mandheling_tpu.ops.kernels import use_backend

    rng = np.random.default_rng(0)
    b, h, w_, ic = shape
    x = jnp.asarray(rng.integers(-100, 100, shape), jnp.int8)
    w = jnp.asarray(rng.integers(-20, 20, (k, k, ic, oc)), jnp.int8)

    def fn(x, w):
        with use_backend(backend):
            y, _ = conv_ops.conv2d_forward(
                x, jnp.int32(-5), w, jnp.int32(-6), (1, 1), "SAME"
            )
        return y

    dt = time_fn_device(fn, x, w)
    flops = 2 * b * h * w_ * k * k * ic * oc
    return dt, flops / dt / 1e12


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="*", default=[2048, 4096, 8192])
    ap.add_argument("--json", action="store_true")
    ap.add_argument("--out", default=None,
                    help="also write the JSON artifact to this path")
    args = ap.parse_args()

    peak = detect_peak()
    rows = []

    def add(kernel, n, dt, tops):
        rows.append(
            {
                "kernel": kernel,
                "n": n,
                "ms": round(dt * 1e3, 3),
                "tops": round(tops, 1),
                "frac_peak": round(tops / peak, 3),
            }
        )

    for n in args.sizes:
        for backend in ("xla", "pallas"):
            dt, tops = bench_matmul(n, backend)
            add(f"matmul_int8_{backend}", n, dt, tops)
        dt, tops = bench_matmul_requant(n)
        add("matmul_int8_xla+requant", n, dt, tops)
        dt, tops = bench_matmul_requant_fused(n)
        add("matmul_int8_fused2phase+requant", n, dt, tops)
    for backend in ("xla", "pallas"):
        dt, tops = bench_conv_requant(backend)
        add(f"conv3x3_b256_32x32x64_{backend}+requant", 0, dt, tops)

    payload = {
        "peak_tops": peak,
        "device": jax.devices()[0].device_kind,
        "rows": rows,
    }
    if args.out:
        with open(args.out, "w") as f:
            json.dump(payload, f, indent=1)
    if args.json:
        print(json.dumps(payload))
    else:
        print(f"device: {jax.devices()[0].device_kind}, peak int8 ~{peak} TOPS")
        for r in rows:
            print(
                f"{r['kernel']:28s} n={r['n']:5d}  {r['ms']:8.3f} ms  "
                f"{r['tops']:7.1f} TOPS  {100*r['frac_peak']:5.1f}% of peak"
            )


if __name__ == "__main__":
    main()
