#!/usr/bin/env python
"""Filter-gradient formulation shoot-out for the ic-small case (TPU)."""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from mandheling_tpu.ops import conv as conv_ops  # noqa: E402
from mandheling_tpu.ops.kernels.conv_int8 import im2col  # noqa: E402

LO, HI = 10, 110
B = 2048


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


def make_variants(kernel, pad):
    def v_conv(x, gy):
        with conv_ops.use_filter_grad_strategy("conv"):
            return conv_ops.conv2d_filter_grad_acc(x, gy, kernel, (1, 1),
                                                   pad)

    def v_matmul(x, gy):
        with conv_ops.use_filter_grad_strategy("matmul"):
            return conv_ops.conv2d_filter_grad_acc(x, gy, kernel, (1, 1),
                                                   pad)

    def v_chunked(x, gy, G=64):
        kh, kw = kernel
        ic, oc = x.shape[-1], gy.shape[-1]
        pads = conv_ops.resolve_padding(pad, kernel, (1, 1), x.shape[1:3])
        patches, (oh, ow) = im2col(x, kernel, (1, 1), pads)
        K = patches.shape[1]
        pa = patches.reshape(G, -1, K)
        gg = gy.reshape(G, -1, oc)
        part = jax.lax.dot_general(
            pa, gg, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32,
        )  # (G, K, oc)
        return jnp.sum(part, axis=0).reshape(kh, kw, ic, oc)

    def v_corr(x, gy):
        with conv_ops.use_filter_grad_strategy("corr"):
            return conv_ops.conv2d_filter_grad_acc(x, gy, kernel, (1, 1),
                                                   pad)

    return {"conv": v_conv, "corr": v_corr}


def main():
    rng = np.random.default_rng(0)
    cases = [
        ("conv1 (ic=1)", (B, 28, 28, 1), (B, 24, 24, 20), (5, 5)),
        ("conv2 (ic=20)", (B, 12, 12, 20), (B, 8, 8, 52), (5, 5)),
    ]
    for name, xs, gs, kernel in cases:
        x = jnp.asarray(rng.integers(-80, 80, xs), jnp.int8)
        gy = jnp.asarray(rng.integers(-80, 80, gs), jnp.int8)
        ref = None
        for vname, fn in make_variants(kernel, "VALID").items():
            def probe(x, gy, dep):
                out = fn(x + dep.astype(jnp.int8), gy)
                return jnp.int32(jnp.sum(out))

            ms = device_ms(probe, x, gy)
            out = np.asarray(jax.jit(lambda x, gy: fn(x, gy))(x, gy))
            if ref is None:
                ref = out
            ok = np.array_equal(out, ref)
            print(f"{name} {vname}: {ms:.3f} ms match={ok}")


if __name__ == "__main__":
    main()
