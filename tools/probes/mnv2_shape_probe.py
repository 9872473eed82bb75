#!/usr/bin/env python
"""Per-op timing of MobileNetV2-NITI's dominant shapes (b256, CIFAR) —
locates where the ~27 ms/step goes. Hoist-proof dep-threaded device loops
(see fused_decision_probe.dev_time).

Run on TPU: python tools/probes/mnv2_shape_probe.py
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

LO, HI, ROUNDS = 5, 55, 3


def dev_time(fn):
    """fn(dep_i8_scalar) -> int8 tensor (or tuple with it first)."""

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

    B = 256
    e5, e6 = jnp.int32(-5), jnp.int32(-6)
    # representative (multiplicity, case) rows of the b256 CIFAR model
    x144 = ri8((B, 32, 32, 144))
    w_dw144 = ri8((3, 3, 1, 144))
    x24 = ri8((B, 32, 32, 24))
    w_pw_up = ri8((1, 1, 24, 144))
    w_pw_dn = ri8((1, 1, 144, 24))
    g144 = ri8((B, 32, 32, 144))
    x384 = ri8((B, 8, 8, 384))
    w_dw384 = ri8((3, 3, 1, 384))
    x64 = ri8((B, 8, 8, 64))
    w_pw384 = ri8((1, 1, 64, 384))
    g384 = ri8((B, 8, 8, 384))

    cases = [
        ("pw_up 32x32 24->144 fwd",
         lambda d: conv_ops.conv2d_forward(x24 + d, e5, w_pw_up, e6, (1, 1), "VALID")),
        ("dw 3x3 144 @32x32 fwd",
         lambda d: dw_ops.dwconv2d_forward(x144 + d, e5, w_dw144, e6, (1, 1), "SAME")),
        ("pw_dn 32x32 144->24 fwd",
         lambda d: conv_ops.conv2d_forward(x144 + d, e5, w_pw_dn, e6, (1, 1), "VALID")),
        ("dw 3x3 144 @32x32 igrad",
         lambda d: dw_ops.dwconv2d_input_grad(g144 + d, w_dw144, (32, 32), (1, 1), "SAME")),
        ("dw 3x3 144 @32x32 fgrad",
         lambda d: dw_ops.dwconv2d_filter_grad(x144 + d, g144, (3, 3), (1, 1), "SAME")),
        ("pw_up igrad 144->24 @32x32",
         lambda d: conv_ops.conv2d_input_grad(g144 + d, w_pw_up, (32, 32), (1, 1), "VALID")),
        ("pw_up fgrad 24->144 @32x32",
         lambda d: conv_ops.conv2d_filter_grad(x24 + d, g144, (1, 1), (1, 1), "VALID")),
        ("dw 3x3 384 @8x8 fwd",
         lambda d: dw_ops.dwconv2d_forward(x384 + d, e5, w_dw384, e6, (1, 1), "SAME")),
        ("pw_up 8x8 64->384 fwd",
         lambda d: conv_ops.conv2d_forward(x64 + d, e5, w_pw384, e6, (1, 1), "VALID")),
        ("dw 3x3 384 @8x8 fgrad",
         lambda d: dw_ops.dwconv2d_filter_grad(x384 + d, g384, (3, 3), (1, 1), "SAME")),
    ]
    for name, fn in cases:
        row = {"op": name}
        try:
            row["ms"] = round(dev_time(fn) * 1e3, 4)
        except Exception as e:
            row["error"] = f"{type(e).__name__}: {e}"[:120]
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
