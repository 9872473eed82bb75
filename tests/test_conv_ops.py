"""Conv op tests: int32 accumulators vs naive scalar reference, gradient
geometry, and requant plumbing.

Mirrors the reference test style of comparing kernels against naive inline
implementations (`test/op/ConvInt8Test.cpp:38-80` pattern, SURVEY.md §4).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from mandheling_tpu.ops import conv as conv_ops
from mandheling_tpu.ops import numerics


def naive_conv_acc(x, w, stride=(1, 1), pad=((0, 0), (0, 0))):
    """Naive int32 NHWC/HWIO conv accumulator."""
    x = np.asarray(x, np.int32)
    w = np.asarray(w, np.int32)
    x = np.pad(x, ((0, 0), pad[0], pad[1], (0, 0)))
    b, ih, iw, ic = x.shape
    kh, kw, _, oc = w.shape
    sh, sw = stride
    oh = (ih - kh) // sh + 1
    ow = (iw - kw) // sw + 1
    out = np.zeros((b, oh, ow, oc), np.int32)
    for bi in range(b):
        for y in range(oh):
            for xx in range(ow):
                patch = x[bi, y * sh : y * sh + kh, xx * sw : xx * sw + kw, :]
                out[bi, y, xx, :] = np.tensordot(patch, w, axes=([0, 1, 2], [0, 1, 2]))
    return out


def rand_int8(rng, shape, lo=-20, hi=20):
    return rng.integers(lo, hi, shape).astype(np.int8)


@pytest.mark.parametrize(
    "stride,pad", [((1, 1), "VALID"), ((2, 2), "VALID"), ((1, 1), "SAME")]
)
def test_conv_acc_matches_naive(stride, pad):
    rng = np.random.default_rng(0)
    x = rand_int8(rng, (2, 9, 9, 3))
    w = rand_int8(rng, (3, 3, 3, 5))
    got = np.asarray(conv_ops.conv2d_int8_acc(jnp.asarray(x), jnp.asarray(w), stride, pad))
    if pad == "SAME":
        padt = ((1, 1), (1, 1))
    else:
        padt = ((0, 0), (0, 0))
    expected = naive_conv_acc(x, w, stride, padt)
    np.testing.assert_array_equal(got, expected)


def test_forward_exponent_arithmetic():
    rng = np.random.default_rng(1)
    x = rand_int8(rng, (1, 6, 6, 2), -50, 50)
    w = rand_int8(rng, (3, 3, 2, 4), -50, 50)
    acc = naive_conv_acc(x, w)
    bw = 0 if np.abs(acc).max() == 0 else int(np.ceil(np.log2(np.abs(acc).max())))
    shift = bw - 7
    eff = shift if shift > 1 else (2 if shift == 1 else 0)
    y, exp = conv_ops.conv2d_forward(
        jnp.asarray(x), jnp.int32(-5), jnp.asarray(w), jnp.int32(-6)
    )
    assert int(exp) == -5 + -6 + eff
    assert y.dtype == jnp.int8
    # spot-check values against shared requant on the naive accumulator
    yref, _ = numerics.requant_forward(jnp.asarray(acc), jnp.int32(-11))
    np.testing.assert_array_equal(np.asarray(y), np.asarray(yref))


def naive_input_grad_acc(gy, w, x_shape, stride=(1, 1)):
    """dx[b,i,j,ic] = sum_{oh,ow,oc} gy[b,oh,ow,oc] * w[i-oh*sh, j-ow*sw, ic, oc]"""
    gy = np.asarray(gy, np.int32)
    w = np.asarray(w, np.int32)
    b, oh, ow, oc = gy.shape
    kh, kw, ic, _ = w.shape
    sh, sw = stride
    dx = np.zeros(x_shape, np.int32)
    for bi in range(b):
        for y in range(oh):
            for x in range(ow):
                for dy in range(kh):
                    for dxx in range(kw):
                        dx[bi, y * sh + dy, x * sw + dxx, :] += (
                            w[dy, dxx, :, :] @ gy[bi, y, x, :]
                        )
    return dx


@pytest.mark.parametrize("stride", [(1, 1), (2, 2)])
def test_input_grad_acc_matches_naive(stride):
    rng = np.random.default_rng(2)
    ih = iw = 9
    kh = kw = 3
    sh, sw = stride
    oh = (ih - kh) // sh + 1
    x_shape = (2, ih, iw, 3)
    gy = rand_int8(rng, (2, oh, oh, 5))
    w = rand_int8(rng, (kh, kw, 3, 5))
    got = np.asarray(
        conv_ops.conv2d_input_grad_acc(
            jnp.asarray(gy), jnp.asarray(w), (ih, iw), stride, "VALID"
        )
    )
    expected = naive_input_grad_acc(gy, w, x_shape, stride)
    np.testing.assert_array_equal(got, expected)


def naive_filter_grad_acc(x, gy, kernel, stride=(1, 1)):
    x = np.asarray(x, np.int32)
    gy = np.asarray(gy, np.int32)
    b, ih, iw, ic = x.shape
    _, oh, ow, oc = gy.shape
    kh, kw = kernel
    sh, sw = stride
    dw = np.zeros((kh, kw, ic, oc), np.int32)
    for dy in range(kh):
        for dx in range(kw):
            for y in range(oh):
                for xx in range(ow):
                    patch = x[:, y * sh + dy, xx * sw + dx, :]  # (B, IC)
                    dw[dy, dx] += patch.T @ gy[:, y, xx, :]
    return dw


@pytest.mark.parametrize("stride", [(1, 1), (2, 2)])
def test_filter_grad_acc_matches_naive(stride):
    rng = np.random.default_rng(3)
    ih = iw = 9
    kh = kw = 3
    sh, sw = stride
    oh = (ih - kh) // sh + 1
    x = rand_int8(rng, (2, ih, iw, 3))
    gy = rand_int8(rng, (2, oh, oh, 5))
    got = np.asarray(
        conv_ops.conv2d_filter_grad_acc(
            jnp.asarray(x), jnp.asarray(gy), (kh, kw), stride, "VALID"
        )
    )
    expected = naive_filter_grad_acc(x, gy, (kh, kw), stride)
    np.testing.assert_array_equal(got, expected)


def test_filter_grad_bw2_requant():
    rng = np.random.default_rng(4)
    x = rand_int8(rng, (2, 5, 5, 2), -90, 90)
    gy = rand_int8(rng, (2, 3, 3, 3), -90, 90)
    acc = naive_filter_grad_acc(x, gy, (3, 3))
    expected = np.asarray(numerics.requant_grad(jnp.asarray(acc), margin=2))
    got = np.asarray(
        conv_ops.conv2d_filter_grad(jnp.asarray(x), jnp.asarray(gy), (3, 3))
    )
    np.testing.assert_array_equal(got, expected)


def test_filter_grad_shape_strided_1x1():
    """Regression: a 1x1 stride-2 conv's filter gradient must be (1,1,C,O).
    The batch-contraction conv formulation slides over extra taps when
    stride > 1 (a 2x2 correlation for this shape) — only the leading kh x kw
    block is the gradient. Before the fix the oversized gradient silently
    broadcast into the weight update and corrupted ResNet18 projection
    shapes (caught by the fori-loop carry check on TPU)."""
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.integers(-20, 20, (2, 32, 32, 4)).astype(np.int8))
    gy = jnp.asarray(rng.integers(-20, 20, (2, 16, 16, 6)).astype(np.int8))
    acc = conv_ops.conv2d_filter_grad_acc(x, gy, (1, 1), (2, 2), "VALID")
    assert acc.shape == (1, 1, 4, 6)
    naive = np.einsum(
        "bhwc,bhwo->co",
        np.asarray(x, np.int64)[:, ::2, ::2, :],
        np.asarray(gy, np.int64),
    )
    np.testing.assert_array_equal(np.asarray(acc[0, 0], np.int64), naive)


def test_resnet18_train_step_shapes_stable():
    """The train step must be a fixed point in param shapes/dtypes (fori-loop
    carry contract — the device-loop bench and any scan-based training rely
    on it)."""
    import jax

    from mandheling_tpu.data import onehot_padded
    from mandheling_tpu.models.resnet import resnet18_niti
    from mandheling_tpu.train import make_train_step

    model = resnet18_niti()
    params = model.init(jax.random.PRNGKey(0))
    step = make_train_step(model)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (4, 32, 32, 3)), jnp.float32)
    oh = jnp.asarray(onehot_padded(rng.integers(0, 10, 4), 10, 12))
    new_params, _ = jax.eval_shape(step, params, x, oh)
    a = jax.tree.leaves(jax.tree.map(lambda l: (l.shape, str(l.dtype)), params))
    b = jax.tree.leaves(jax.tree.map(lambda l: (l.shape, str(l.dtype)), new_params))
    assert a == b


def test_requant_impl_modes_bit_identical():
    """The requant accumulator policy (materialize / recompute / auto,
    ops/conv.py) must be a pure residence decision: both passes compute the
    identical int32 accumulator, so conv forward, 1x1 input grad, matmul
    forward, and the depthwise forms are byte-identical across modes."""
    import jax

    from mandheling_tpu.ops import depthwise as dw_ops
    from mandheling_tpu.ops import matmul as mm_ops

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.integers(-90, 90, (4, 9, 9, 6)).astype(np.int8))
    w = jnp.asarray(rng.integers(-90, 90, (1, 1, 6, 10)).astype(np.int8))
    gy = jnp.asarray(rng.integers(-90, 90, (4, 9, 9, 10)).astype(np.int8))
    a = jnp.asarray(rng.integers(-90, 90, (32, 24)).astype(np.int8))
    b = jnp.asarray(rng.integers(-90, 90, (24, 40)).astype(np.int8))
    xd = jnp.asarray(rng.integers(-90, 90, (4, 9, 9, 8)).astype(np.int8))
    wd = jnp.asarray(rng.integers(-90, 90, (3, 3, 1, 8)).astype(np.int8))

    outs = {}
    for impl in ("materialize", "recompute"):
        with conv_ops.use_requant_impl(impl):
            outs[impl] = [
                np.asarray(o)
                for o in (
                    *jax.jit(conv_ops.conv2d_forward)(
                        x, jnp.int32(-7), w, jnp.int32(-7)
                    ),
                    jax.jit(
                        lambda g, wt: conv_ops.conv2d_input_grad(g, wt, (9, 9))
                    )(gy, w),
                    *jax.jit(mm_ops.matmul_int8_forward)(
                        a, jnp.int32(-7), b, jnp.int32(-7)
                    ),
                    *jax.jit(dw_ops.dwconv2d_forward)(
                        xd, jnp.int32(-7), wd, jnp.int32(-7)
                    ),
                    jax.jit(
                        lambda g, wt: dw_ops.dwconv2d_input_grad(g, wt, (9, 9))
                    )(gy[..., :8], wd),
                )
            ]
    for got, want in zip(outs["recompute"], outs["materialize"]):
        np.testing.assert_array_equal(got, want)
