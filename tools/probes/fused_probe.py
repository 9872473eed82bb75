#!/usr/bin/env python
"""TPU timing: fused Pallas NITI conv vs materializing XLA path."""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from mandheling_tpu.ops import conv as conv_ops  # noqa: E402
from mandheling_tpu.ops.kernels import dispatch  # noqa: E402

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


def main():
    rng = np.random.default_rng(0)
    cases = [
        ("conv1", (2048, 28, 28, 1), (5, 5, 1, 20)),
        ("conv2", (2048, 12, 12, 20), (5, 5, 20, 52)),
        ("fc1", (2048, 1, 1, 832), (1, 1, 832, 500)),
    ]
    for name, xs, ws in cases:
        x = jnp.asarray(rng.integers(-80, 80, xs), jnp.int8)
        w = jnp.asarray(rng.integers(-80, 80, ws), jnp.int8)

        def fwd(x, w, dep):
            y, e = conv_ops.conv2d_forward(
                x + dep.astype(jnp.int8), jnp.int32(-3), w, jnp.int32(-6)
            )
            return jnp.sum(y.astype(jnp.int32)) + e

        with dispatch.use_backend("xla"):
            ta = device_ms(fwd, x, w)
            ya = jax.jit(fwd)(x, w, jnp.int32(0))
        with dispatch.use_backend("pallas"):
            tb = device_ms(fwd, x, w)
            yb = jax.jit(fwd)(x, w, jnp.int32(0))
        print(f"{name}: xla {ta:.3f} ms | fused {tb:.3f} ms | "
              f"speedup {ta/tb:.2f}x | match={int(ya)==int(yb)}")


if __name__ == "__main__":
    main()
