#!/usr/bin/env python
"""Does recompute-instead-of-materialize win for NITI conv requant on TPU?

Variant A (current): acc = conv(x,w); m = max|acc|; y = psto(acc, f(m))
  -> acc is materialized and read twice (3 HBM passes of int32).
Variant B (recompute): m = max|conv(x,w)|; y = psto(conv(barrier(x),w), f(m))
  -> if XLA fuses the reduce into the first conv and the requant into the
     second, the int32 accumulator never hits HBM.
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from mandheling_tpu.ops import numerics  # noqa: E402

LO, HI = 10, 110


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


def conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )


def variant_a(x, w, dep):
    x = x + dep.astype(jnp.int8)
    acc = conv(x, w)
    m = jnp.max(jnp.abs(acc))
    bw = numerics.range_estimate_from_max(m)
    y, e = numerics.requant_forward_from_bw(acc, jnp.int32(0), bw)
    return jnp.sum(y.astype(jnp.int32)) + e


def variant_b(x, w, dep):
    x = x + dep.astype(jnp.int8)
    m = jnp.max(jnp.abs(conv(x, w)))
    bw = numerics.range_estimate_from_max(m)
    x2 = jax.lax.optimization_barrier(x)
    acc2 = conv(x2, w)
    y, e = numerics.requant_forward_from_bw(acc2, jnp.int32(0), bw)
    return jnp.sum(y.astype(jnp.int32)) + e


def main():
    rng = np.random.default_rng(0)
    shapes = [
        ("conv1-like", (2048, 28, 28, 1), (5, 5, 1, 20)),
        ("conv2-like", (2048, 12, 12, 20), (5, 5, 20, 52)),
        ("wide", (256, 32, 32, 64), (3, 3, 64, 128)),
    ]
    for name, xs, ws in shapes:
        x = jnp.asarray(rng.integers(-80, 80, xs), jnp.int8)
        w = jnp.asarray(rng.integers(-80, 80, ws), jnp.int8)
        ra = device_ms(variant_a, x, w)
        rb = device_ms(variant_b, x, w)
        # correctness: identical outputs
        va = jax.jit(variant_a)(x, w, jnp.int32(0))
        vb = jax.jit(variant_b)(x, w, jnp.int32(0))
        ok = int(va) == int(vb)
        print(f"{name}: materialize {ra:.3f} ms | recompute {rb:.3f} ms "
              f"| speedup {ra/rb:.2f}x | match={ok}")


if __name__ == "__main__":
    main()
