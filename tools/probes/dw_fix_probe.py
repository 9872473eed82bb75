#!/usr/bin/env python
"""Candidate fixes for the depthwise hot spots found by the r3 per-op
profile (tools/profile_model.py on mobilenet_v2 b256: the four stage-4
dw+abs-reduce fusions cost 3.09 ms EACH — half the step's compute — and
the dw filter-grad 9-slice einsum feeds ~7 GB/step of async slice traffic).

Measures, per shape, hoist-proof dep-threaded device times for:
  A. dw fwd as-is (conv_general feature_group + fused abs-reduce + requant)
  B. dw fwd with optimization_barrier between acc and the range estimate
     (splits the pathological fusion)
  C. dw fwd with the acc computed as 9 shifted elementwise multiply-adds
     (no grouped conv at all)
  D. dw fgrad as-is (9-slice einsum)
  E. dw fgrad as ONE batch-grouped conv (batch_group_count=C — the lowering
     XLA autodiff itself uses for depthwise weight grads)
  F. dense pw fgrad as-is (physical transposes + conv)
  G. dense pw fgrad with logical dimension_numbers ("CHWN","IHWO","NHWC")
     — no materialized transposes

Run on TPU: python tools/probes/dw_fix_probe.py
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
from mandheling_tpu.ops import depthwise as dw_ops
from mandheling_tpu.ops import numerics

LO, HI, ROUNDS = 5, 55, 3


def dev_time(fn):
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


def dw_acc_taps(xp, w):
    """dw acc as kh*kw shifted elementwise multiply-adds (no grouped conv)."""
    kh, kw, _, c = w.shape
    b, hp, wp, _ = xp.shape
    oh, ow = hp - kh + 1, wp - kw + 1
    acc = jnp.zeros((b, oh, ow, c), jnp.int32)
    for dy in range(kh):
        for dx in range(kw):
            tap = jax.lax.slice(
                xp, (0, dy, dx, 0), (b, dy + oh, dx + ow, c)
            ).astype(jnp.int32)
            acc = acc + tap * w[dy, dx, 0].astype(jnp.int32)
    return acc


def dw_fwd_variant(x, w, exp_in, mode):
    pad = ((1, 1), (1, 1))
    if mode == "taps":
        xp = jnp.pad(x, ((0, 0), pad[0], pad[1], (0, 0)))
        acc = dw_acc_taps(xp, w)
    else:
        acc = jax.lax.conv_general_dilated(
            x, w, (1, 1), pad, dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=x.shape[-1],
            preferred_element_type=jnp.int32,
        )
    if mode == "barrier":
        acc = jax.lax.optimization_barrier(acc)
    m = jnp.max(jnp.abs(acc))
    bw = numerics.range_estimate_from_max(m)
    return numerics.requant_forward_from_bw(acc, exp_in, bw)


def dw_fgrad_bgc(x, gy, pad):
    """dw filter grad as one batch-grouped conv."""
    c = x.shape[-1]
    acc = jax.lax.conv_general_dilated(
        x, gy, (1, 1), pad,
        dimension_numbers=("CHWN", "IHWO", "NHWC"),
        batch_group_count=c,
        preferred_element_type=jnp.int32,
    )  # (1, kh, kw, C)
    acc = jnp.transpose(acc, (1, 2, 0, 3))
    return numerics.requant_grad(acc, margin=2)


def pw_fgrad_logical(x, gy):
    acc = jax.lax.conv_general_dilated(
        x, gy, (1, 1), ((0, 0), (0, 0)),
        dimension_numbers=("CHWN", "IHWO", "NHWC"),
        preferred_element_type=jnp.int32,
    )  # (Cin, 1, 1, Cout)
    acc = jnp.transpose(acc, (1, 2, 0, 3))
    return numerics.requant_grad(acc, margin=2)


def main():
    rng = np.random.default_rng(0)

    def ri8(s):
        return jnp.asarray(rng.integers(-30, 30, s).astype(np.int8))

    B = 256
    e = jnp.int32(-5)
    shapes = [(32, 144), (16, 192), (8, 384), (8, 576), (4, 960)]
    for hw, c in shapes:
        x = ri8((B, hw, hw, c))
        g = ri8((B, hw, hw, c))
        w = ri8((3, 3, 1, c))
        for mode in ("asis", "barrier", "taps"):
            name = f"dw fwd {hw}x{hw}x{c} {mode}"
            try:
                ms = dev_time(
                    lambda d, x=x, w=w, mode=mode: dw_fwd_variant(
                        x + d, w, e, mode)) * 1e3
                print(json.dumps({"op": name, "ms": round(ms, 4)}), flush=True)
            except Exception as ex:
                print(json.dumps({"op": name,
                                  "error": f"{type(ex).__name__}: {ex}"[:140]}),
                      flush=True)
        for mode in ("asis", "bgc"):
            name = f"dw fgrad {hw}x{hw}x{c} {mode}"
            try:
                if mode == "asis":
                    fn = lambda d, x=x, g=g: dw_ops.dwconv2d_filter_grad(
                        x + d, g, (3, 3), (1, 1), "SAME")
                else:
                    fn = lambda d, x=x, g=g: dw_fgrad_bgc(
                        x + d, g, ((1, 1), (1, 1)))
                ms = dev_time(fn) * 1e3
                print(json.dumps({"op": name, "ms": round(ms, 4)}), flush=True)
            except Exception as ex:
                print(json.dumps({"op": name,
                                  "error": f"{type(ex).__name__}: {ex}"[:140]}),
                      flush=True)

    # dense pw fgrad: physical vs logical transposes
    x24 = ri8((B, 32, 32, 24))
    g144 = ri8((B, 32, 32, 144))
    x64 = ri8((B, 8, 8, 64))
    g384 = ri8((B, 8, 8, 384))
    for name, fn in [
        ("pw fgrad 24->144 @32x32 asis",
         lambda d: conv_ops.conv2d_filter_grad(x24 + d, g144, (1, 1), (1, 1), "VALID")),
        ("pw fgrad 24->144 @32x32 logical",
         lambda d: pw_fgrad_logical(x24 + d, g144)),
        ("pw fgrad 64->384 @8x8 asis",
         lambda d: conv_ops.conv2d_filter_grad(x64 + d, g384, (1, 1), (1, 1), "VALID")),
        ("pw fgrad 64->384 @8x8 logical",
         lambda d: pw_fgrad_logical(x64 + d, g384)),
    ]:
        try:
            ms = dev_time(fn) * 1e3
            print(json.dumps({"op": name, "ms": round(ms, 4)}), flush=True)
        except Exception as ex:
            print(json.dumps({"op": name,
                              "error": f"{type(ex).__name__}: {ex}"[:140]}),
                  flush=True)


if __name__ == "__main__":
    main()
