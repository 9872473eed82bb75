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

    @functools.partial(jax.jit, static_argnums=2)
    def run(a, b, iters):
        def body(i, a):
            return int8_fn(a, b)

        out = jax.lax.fori_loop(0, iters, body, a)
        return jnp.sum(out.astype(jnp.int32))

    np.asarray(run(a, b, iters_lo))  # compile + warm
    np.asarray(run(a, b, iters_hi))
    t0 = time.perf_counter()
    np.asarray(run(a, b, iters_lo))
    t1 = time.perf_counter()
    np.asarray(run(a, b, iters_hi))
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (iters_hi - iters_lo)


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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="*", default=[2048, 4096, 8192])
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    peak = detect_peak()
    rows = []
    for n in args.sizes:
        for backend in ("xla", "pallas"):
            dt, tops = bench_matmul(n, backend)
            rows.append(
                {
                    "kernel": f"matmul_int8_{backend}",
                    "n": n,
                    "ms": round(dt * 1e3, 3),
                    "tops": round(tops, 1),
                    "frac_peak": round(tops / peak, 3),
                }
            )
        dt, tops = bench_matmul_requant(n)
        rows.append(
            {
                "kernel": "matmul_int8_xla+requant",
                "n": n,
                "ms": round(dt * 1e3, 3),
                "tops": round(tops, 1),
                "frac_peak": round(tops / peak, 3),
            }
        )

    if args.json:
        print(json.dumps({"peak_tops": peak, "rows": rows}))
    else:
        print(f"device: {jax.devices()[0].device_kind}, peak int8 ~{peak} TOPS")
        for r in rows:
            print(
                f"{r['kernel']:28s} n={r['n']:5d}  {r['ms']:8.3f} ms  "
                f"{r['tops']:7.1f} TOPS  {100*r['frac_peak']:5.1f}% of peak"
            )


if __name__ == "__main__":
    main()
