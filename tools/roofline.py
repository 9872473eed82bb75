#!/usr/bin/env python
"""Roofline harness: int8 matmul/conv/depthwise throughput vs MXU peak.

Measures the Pallas int8 MXU matmul, the XLA int8 dot, the conv+requant
paths, and the depthwise formulations on training-relevant shapes; reports
achieved int8 TOPS as a fraction of the chip's peak AND of the
exact-NITI-algorithm roofline (BASELINE.json north star: >=80% of int8
roofline on the conv/matmul-gradient kernels).

Exact-NITI accounting: the NITI requant needs the GLOBAL max|acc| before
any element can be shifted, so every exact implementation either computes
the contraction twice (two-phase: max pass + requant pass) or materializes
the int32 accumulator to HBM and reads it twice more. The two-pass form
caps useful-flops utilization at 50% of peak; `frac_exact_roofline` = 
achieved useful TOPS / (peak/2) is the fraction of what the ALGORITHM
permits — the honest gap attributable to the kernel rather than to the
requant contract.

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

    n_iters = int(iters_hi - iters_lo)
    iters_lo, iters_hi = jnp.int32(iters_lo), jnp.int32(iters_hi)
    np.asarray(run(a, b, iters_lo))  # compile (once: iters is traced) + warm
    np.asarray(run(a, b, iters_hi))
    deltas = []
    for _ in range(3):  # median over rounds: single differentials have
        t0 = time.perf_counter()  # gone negative under relay jitter
        np.asarray(run(a, b, iters_lo))
        t1 = time.perf_counter()
        np.asarray(run(a, b, iters_hi))
        t2 = time.perf_counter()
        deltas.append(((t2 - t1) - (t1 - t0)) / n_iters)
    return float(np.median(deltas))


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


def bench_expand_requant(shape=(256, 32, 32, 24), oc=144):
    """The MNv2 expansion 1x1 at its shipping shape — the one op family
    whose measured residence mode is RECOMPUTE (ops/conv.py auto rule,
    r4): the int32 acc never reaches HBM and the contraction runs twice,
    so its exact-NITI ceiling is peak/2, not the acc-spill HBM bound."""
    from mandheling_tpu.ops import conv as conv_ops

    rng = np.random.default_rng(0)
    b, h, w_, ic = shape
    x = jnp.asarray(rng.integers(-100, 100, shape), jnp.int8)
    w = jnp.asarray(rng.integers(-20, 20, (1, 1, ic, oc)), jnp.int8)

    # the conv expands ic -> oc, so the output cannot feed the next
    # iteration directly (time_fn_device requires a type-stable carry);
    # thread the dependency through a cheap slice back to the input shape
    def fn(x, w):
        y, _ = conv_ops.conv2d_forward(
            x, jnp.int32(-5), w, jnp.int32(-6), (1, 1), "VALID")
        return y[..., :ic]

    dt = time_fn_device(fn, x, w)
    flops = 2 * b * h * w_ * ic * oc
    return dt, flops / dt / 1e12


def bench_dw_requant(impl: str, shape=(256, 32, 32, 144), k=3):
    """Full NITI depthwise forward (requant included); TOPS counted in
    depthwise MAC flops (VPU work — no channel contraction)."""
    from mandheling_tpu.ops import depthwise as dw_ops

    rng = np.random.default_rng(0)
    b, h, w_, c = shape
    x = jnp.asarray(rng.integers(-100, 100, shape), jnp.int8)
    w = jnp.asarray(rng.integers(-20, 20, (k, k, 1, c)), jnp.int8)

    def fn(x, w):
        prev = dw_ops.get_dw_impl()
        dw_ops.set_dw_impl(impl)
        try:
            y, _ = dw_ops.dwconv2d_forward(
                x, jnp.int32(-5), w, jnp.int32(-6), (1, 1), "SAME")
        finally:
            dw_ops.set_dw_impl(prev)
        return y

    dt = time_fn_device(fn, x, w)
    flops = 2 * b * h * w_ * k * k * c
    return dt, flops / dt / 1e12


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="*", default=[2048, 4096, 8192])
    ap.add_argument("--json", action="store_true")
    ap.add_argument("--out", default=None,
                    help="also write the JSON artifact to this path")
    args = ap.parse_args()

    peak = detect_peak()
    hbm_bw = 819e9  # v5e measured-class HBM BW (B/s); the spill ceilings
    # below scale linearly if another chip's BW is substituted
    rows = []

    def add(kernel, n, dt, tops, exact=None, spill_bytes=None,
            stream_bytes=None):
        """exact=None (no requant) | "recompute" (contraction runs TWICE,
        acc never in HBM: ceiling = max(2x compute time, stream_bytes/BW
        where stream_bytes = 2*in + out)) | "materialize" (contraction
        once + int32 acc spill: ceiling = max(compute-once time,
        spill_bytes/BW)). Mode-correct per-row ceilings — r5, VERDICT r4
        task 5: the old artifact applied the two-pass peak/2 ceiling to
        every row, which stopped describing the shipping config once the
        r4 residence policy made the expansion 1x1s recompute and
        everything else materialize."""
        row = {
            "kernel": kernel,
            "n": n,
            "ms": round(dt * 1e3, 3),
            "tops": round(tops, 1),
            "frac_peak": round(tops / peak, 3),
        }
        if exact is not None:
            flops = tops * 1e12 * dt
            if exact == "recompute":
                t_cmp2 = flops / (peak * 1e12 / 2)
                t_hbm = (stream_bytes or 0) / hbm_bw
                ceil_t = max(t_cmp2, t_hbm)
                row["ceiling"] = ("2x-compute" if t_cmp2 > t_hbm
                                  else "stream-hbm (recompute residence)")
            else:
                t_hbm = (spill_bytes or 0) / hbm_bw
                t_cmp = flops / (peak * 1e12)
                ceil_t = max(t_hbm, t_cmp)
                row["ceiling"] = ("acc-spill-hbm" if t_hbm > t_cmp
                                  else "compute-once")
            row["mode"] = exact
            row["frac_exact_roofline"] = round(ceil_t / dt, 3)
        rows.append(row)

    for n in args.sizes:
        for backend in ("xla", "pallas"):
            dt, tops = bench_matmul(n, backend)
            add(f"matmul_int8_{backend}", n, dt, tops)
        dt, tops = bench_matmul_requant(n)
        # square GEMM: N == K, the auto residence policy materializes
        # (in 2*n^2 + acc spill 8*n^2 + out n^2 bytes)
        add("matmul_int8_xla+requant", n, dt, tops, exact="materialize",
            spill_bytes=11 * n * n)
        dt, tops = bench_matmul_requant_fused(n)
        add("matmul_int8_fused2phase+requant", n, dt, tops,
            exact="recompute", stream_bytes=2 * 2 * n * n + n * n)
    for backend in ("xla", "pallas"):
        dt, tops = bench_conv_requant(backend)
        nelt = 256 * 32 * 32 * 64
        add(f"conv3x3_b256_32x32x64_{backend}+requant", 0, dt, tops,
            exact="materialize", spill_bytes=10 * nelt)
    try:
        dt, tops = bench_expand_requant()
        nin = 256 * 32 * 32 * 24
        add("expand1x1_b256_32x32_24to144+requant", 0, dt, tops,
            exact="recompute", stream_bytes=2 * nin + nin * 6)
    except Exception as e:
        rows.append({"kernel": "expand1x1_b256_32x32_24to144+requant",
                     "error": f"{type(e).__name__}: {e}"[:120]})
    for impl in ("taps", "grouped"):
        try:
            dt, tops = bench_dw_requant(impl)
            nelt = 256 * 32 * 32 * 144
            add(f"dw3x3_b256_32x32x144_{impl}+requant", 0, dt, tops,
                exact="materialize", spill_bytes=10 * nelt)
        except Exception as e:
            rows.append({"kernel": f"dw3x3_b256_32x32x144_{impl}+requant",
                         "error": f"{type(e).__name__}: {e}"[:120]})

    payload = {
        "peak_tops": peak,
        "device": jax.devices()[0].device_kind,
        "rows": rows,
        "hbm_bw_gbps": hbm_bw / 1e9,
        "expand_row_caveat": (
            "the expand1x1 row measures ~1.1 ms in THIS isolated "
            "fori-loop harness vs 0.24 ms in-context (r4 "
            "recompute_requant_probe2 / the MNv2 step profile) — the "
            "dep-threaded slice feeding the next iteration changes "
            "XLA's layout/fusion choices for this op; read the "
            "in-context number for the shipping config, this row only "
            "shows the harness floor"),
        "notes": 'Timing: device-side dep-threaded loops, median of 3 long-minus-short differentials (relay dispatch jitter still inflates sub-0.1 ms rows; n=2048 matmul reads >100% of peak — read the n=4096 and conv rows). frac_exact_roofline is MODE-CORRECT per row (r5): the exact-NITI requant needs the global max|acc| before any element shifts, so an op either computes the contraction twice ("recompute" residence — ceiling peak/2; the shipping mode for the MNv2 expansion 1x1s and the fused two-phase Pallas kernels) or computes once and spills the int32 accumulator ("materialize" — ceiling max(compute-once, spill-bytes/HBM BW); the shipping mode for spatial convs, square GEMMs, and depthwise). The dw rows are VPU work (no channel contraction): their MXU-peak fraction is definitionally tiny; they compare the two surviving XLA formulations (taps vs grouped — see README kernel finding; the r3 batch-on-lanes Pallas dw kernel measured 2x slower than either and was removed in r4).',
    }
    if args.out:
        with open(args.out, "w") as f:
            json.dump(payload, f, indent=1)
    if args.json:
        print(json.dumps(payload))
    else:
        print(f"device: {jax.devices()[0].device_kind}, peak int8 ~{peak} TOPS")
        for r in rows:
            if "error" in r:
                print(f"{r['kernel']:28s} ERROR {r['error']}")
                continue
            print(
                f"{r['kernel']:28s} n={r.get('n', 0):5d}  "
                f"{r['ms']:8.3f} ms  {r['tops']:7.1f} TOPS  "
                f"{100 * r['frac_peak']:5.1f}% of peak"
            )


if __name__ == "__main__":
    main()
