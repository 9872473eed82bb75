#!/usr/bin/env python
"""Per-op timing of the LeNet/MobileNet hot shapes under xla vs pallas
backends — locates where the pallas train step loses time.

Run on TPU: python tools/probes/fused_shape_probe.py
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

from mandheling_tpu.utils import compile_cache

compile_cache.enable()

from mandheling_tpu.ops import conv as conv_ops
from mandheling_tpu.ops.kernels import use_backend

LO, HI = 5, 45


def dev_time(fn, *args):
    """Device-loop differential timing of y = fn(x, *args) (y int8).

    The first array argument is perturbed each iteration by a value
    derived from the previous output — a true loop-carried data
    dependency. Without it XLA's while-loop LICM hoists bodies whose
    outputs are no larger than their inputs (measured: a 'kernel' timed
    at 0.002 ms that cannot physically run under 0.02 ms)."""

    x0 = args[0]
    rest = args[1:]

    @jax.jit
    def run(x0, iters):
        def body(i, carry):
            d, acc = carry
            out = fn(x0 + d, *rest)
            y = out[0] if isinstance(out, tuple) else out
            return ((y.ravel()[0] & 1).astype(x0.dtype),
                    acc + jnp.sum(y, dtype=jnp.int32))

        _, acc = jax.lax.fori_loop(
            0, iters, body, (jnp.zeros((), x0.dtype), jnp.int32(0))
        )
        return acc

    lo, hi = jnp.int32(LO), jnp.int32(HI)
    np.asarray(run(x0, lo)); np.asarray(run(x0, hi))
    t0 = time.perf_counter(); np.asarray(run(x0, lo))
    t1 = time.perf_counter(); np.asarray(run(x0, hi))
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (HI - LO)


def main():
    rng = np.random.default_rng(0)

    def ri8(s):
        return jnp.asarray(rng.integers(-30, 30, s).astype(np.int8))

    B = 2048
    cases = [
        # name, fn-builder, args
        ("conv1_fwd 28x28x1->24x24x20 k5", conv_ops.conv2d_forward,
         (ri8((B, 28, 28, 1)), jnp.int32(-5), ri8((5, 5, 1, 20)), jnp.int32(-6), (1, 1), "VALID")),
        ("conv2_fwd 12x12x20->8x8x52 k5", conv_ops.conv2d_forward,
         (ri8((B, 12, 12, 20)), jnp.int32(-5), ri8((5, 5, 20, 52)), jnp.int32(-6), (1, 1), "VALID")),
        ("fc1_fwd 832->500 (1x1)", conv_ops.conv2d_forward,
         (ri8((B, 1, 1, 832)), jnp.int32(-5), ri8((1, 1, 832, 500)), jnp.int32(-6), (1, 1), "VALID")),
        ("fc2_fwd 500->12 (1x1)", conv_ops.conv2d_forward,
         (ri8((B, 1, 1, 500)), jnp.int32(-5), ri8((1, 1, 500, 12)), jnp.int32(-6), (1, 1), "VALID")),
        ("conv2_igrad", conv_ops.conv2d_input_grad,
         (ri8((B, 8, 8, 52)), ri8((5, 5, 20, 52)), (12, 12), (1, 1), "VALID")),
        ("fc1_igrad", conv_ops.conv2d_input_grad,
         (ri8((B, 1, 1, 500)), ri8((1, 1, 832, 500)), (1, 1), (1, 1), "VALID")),
        ("conv2_fgrad", conv_ops.conv2d_filter_grad,
         (ri8((B, 12, 12, 20)), ri8((B, 8, 8, 52)), (5, 5), (1, 1), "VALID")),
        ("conv1_fgrad", conv_ops.conv2d_filter_grad,
         (ri8((B, 28, 28, 1)), ri8((B, 24, 24, 20)), (5, 5), (1, 1), "VALID")),
        ("fc1_fgrad", conv_ops.conv2d_filter_grad,
         (ri8((B, 1, 1, 832)), ri8((B, 1, 1, 500)), (1, 1), (1, 1), "VALID")),
    ]
    import contextlib

    variants = [
        ("xla", "xla", contextlib.nullcontext),
        ("pallas", "pallas", contextlib.nullcontext),
        ("pallas_all", "pallas",
         lambda: conv_ops.use_fused_conv_mode("all")),
    ]
    for name, fn, args in cases:
        row = {"op": name}
        for label, backend, mode_ctx in variants:
            with use_backend(backend), mode_ctx():
                try:
                    dt = dev_time(fn, *args)
                    row[label] = round(dt * 1e3, 3)
                except Exception as e:
                    row[label] = f"{type(e).__name__}"[:60]
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
