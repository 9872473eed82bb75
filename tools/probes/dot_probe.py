#!/usr/bin/env python
"""Micro-probe: which Pallas dot configurations hit the MXU on this chip.

Times a grid of (r, K) @ (K, N) int8->int32 dots with K in {28, 128, 256}
and int8-vs-bf16 operands, standalone (same tile sizes as the fused conv
kernels use).
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LO, HI = 10, 110
ROWS = 49152
R = 1024


def device_ms(fn, *args):
    @functools.partial(jax.jit, static_argnums=0)
    def run(iters, *a):
        def body(i, dep):
            return fn(*a, dep)

        return jax.lax.fori_loop(0, iters, body, jnp.int32(0))

    np.asarray(run(LO, *args))
    np.asarray(run(HI, *args))
    t0 = time.perf_counter()
    np.asarray(run(LO, *args))
    t1 = time.perf_counter()
    np.asarray(run(HI, *args))
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (HI - LO) * 1e3


def make_dot(k, n, dtype):
    def kernel(a_ref, b_ref, o_ref):
        a = a_ref[:]
        b = b_ref[:]
        if dtype == "bf16":
            a = a.astype(jnp.bfloat16)
            b = b.astype(jnp.bfloat16)
            acc = jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(jnp.int32)
        else:
            acc = jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
        o_ref[0, 0] = jnp.max(jnp.abs(acc))

    @jax.jit
    def run(a, b):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
            grid=(ROWS // R,),
            in_specs=[
                pl.BlockSpec((R, k), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((k, n), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0),
                                   memory_space=pltpu.SMEM),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
        )(a, b)[0, 0]

    return run


def main():
    rng = np.random.default_rng(0)
    for k in (28, 128, 256):
        for n in (512,):
            a = jnp.asarray(rng.integers(-80, 80, (ROWS, k)), jnp.int8)
            b = jnp.asarray(rng.integers(-80, 80, (k, n)), jnp.int8)
            for dt in ("int8", "bf16"):
                f = make_dot(k, n, dt)

                def probe(a, b, dep):
                    return f(a + dep.astype(jnp.int8), b) + dep

                try:
                    ms = device_ms(probe, a, b)
                    gmacs = ROWS * k * n / 1e9
                    print(f"K={k:4d} N={n} {dt}: {ms:7.3f} ms "
                          f"({gmacs/ms*1000:.0f} GMAC/s)")
                except Exception as e:  # noqa: BLE001
                    print(f"K={k:4d} N={n} {dt}: FAILED {str(e)[:80]}")


if __name__ == "__main__":
    main()
