#!/usr/bin/env python
"""Per-op device timing of the NITI LeNet backward pass (TPU)."""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from mandheling_tpu.ops import conv as conv_ops  # noqa: E402
from mandheling_tpu.ops import pool as pool_ops  # noqa: E402
from mandheling_tpu.ops import relu as relu_ops  # noqa: E402
from mandheling_tpu.ops.loss import loss_grad_int8  # noqa: E402
from mandheling_tpu.train.train_step import quantize_batch  # noqa: E402

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


def i8(rng, shape):
    return jnp.asarray(rng.integers(-80, 80, shape), jnp.int8)


def main():
    rng = np.random.default_rng(0)
    # LeNet activation shapes
    x0 = i8(rng, (B, 28, 28, 1))     # input
    y1 = i8(rng, (B, 24, 24, 20))    # conv1 out
    p1 = i8(rng, (B, 12, 12, 20))    # pool1 out
    y2 = i8(rng, (B, 8, 8, 52))      # conv2 out
    p2 = i8(rng, (B, 4, 4, 52))      # pool2 out
    w1 = i8(rng, (5, 5, 1, 20))
    w2 = i8(rng, (5, 5, 20, 52))
    wf1 = i8(rng, (1, 1, 832, 500))
    wf2 = i8(rng, (1, 1, 500, 12))
    f1in = i8(rng, (B, 1, 1, 832))
    f1out = i8(rng, (B, 1, 1, 500))
    g12 = i8(rng, (B, 12))

    def t(name, fn, *args):
        ms = device_ms(fn, *args)
        print(f"{name}: {ms:.3f} ms")

    def dep8(a, dep):
        return a + dep.astype(jnp.int8)

    s32 = lambda v: jnp.int32(jnp.sum(v.astype(jnp.int32)))  # noqa: E731

    t("quantize_batch", lambda x, dep: s32(quantize_batch(x + dep.astype(
        jnp.float32))[0]), jnp.asarray(rng.normal(0, 1, (B, 28, 28, 1)),
                                       jnp.float32))
    t("loss_grad", lambda l, dep: s32(
        loss_grad_int8(dep8(l, dep), jnp.int32(-3),
                       jnp.zeros((B, 12), jnp.int8))), g12)
    t("fc2 input grad (matmul 12->500)", lambda g, dep: s32(
        conv_ops.conv2d_input_grad(dep8(g, dep).reshape(B, 1, 1, 12), wf2,
                                   (1, 1))), g12)
    t("fc2 filter grad", lambda g, dep: s32(conv_ops.conv2d_filter_grad(
        f1out, dep8(g, dep).reshape(B, 1, 1, 12), (1, 1))), g12)
    t("fc1 input grad", lambda g, dep: s32(conv_ops.conv2d_input_grad(
        dep8(g, dep), wf1, (1, 1))), f1out)
    t("fc1 filter grad", lambda g, dep: s32(conv_ops.conv2d_filter_grad(
        f1in, dep8(g, dep), (1, 1))), f1out)
    t("pool2 grad", lambda g, dep: s32(pool_ops.maxpool2d_grad(
        y2, p2, dep8(g, dep), (2, 2), (2, 2))), p2)
    t("relu2 grad", lambda g, dep: s32(relu_ops.relu_grad(y2, dep8(g, dep))),
      y2)
    t("conv2 input grad", lambda g, dep: s32(conv_ops.conv2d_input_grad(
        dep8(g, dep), w2, (12, 12))), y2)
    t("conv2 filter grad", lambda g, dep: s32(conv_ops.conv2d_filter_grad(
        p1, dep8(g, dep), (5, 5))), y2)
    t("pool1 grad", lambda g, dep: s32(pool_ops.maxpool2d_grad(
        y1, p1, dep8(g, dep), (2, 2), (2, 2))), p1)
    t("conv1 input grad", lambda g, dep: s32(conv_ops.conv2d_input_grad(
        dep8(g, dep), w1, (28, 28))), y1)
    t("conv1 filter grad", lambda g, dep: s32(conv_ops.conv2d_filter_grad(
        x0, dep8(g, dep), (5, 5))), y1)
    # forward convs for comparison
    t("conv1 fwd", lambda x, dep: s32(conv_ops.conv2d_forward(
        dep8(x, dep), jnp.int32(-3), w1, jnp.int32(-6))[0]), x0)
    t("conv2 fwd", lambda x, dep: s32(conv_ops.conv2d_forward(
        dep8(x, dep), jnp.int32(-3), w2, jnp.int32(-6))[0]), p1)
    t("fc1 fwd", lambda x, dep: s32(conv_ops.conv2d_forward(
        dep8(x, dep), jnp.int32(-3), wf1, jnp.int32(-6))[0]), f1in)
    t("pool1 fwd", lambda x, dep: s32(pool_ops.maxpool2d(
        dep8(x, dep), jnp.int32(0), (2, 2), (2, 2))[0]), y1)


if __name__ == "__main__":
    main()
