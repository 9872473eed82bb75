"""Pallas kernel tests in interpret mode (the analog of the reference's
MNN_HEXAGON_DSP_SIMU CPU simulation of DSP numerics + *_ref op pairs,
SURVEY.md section 4). All backends must produce identical int32 accumulators.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from mandheling_tpu.ops import conv as conv_ops
from mandheling_tpu.ops.kernels import use_backend
from mandheling_tpu.ops.kernels.conv_int8 import conv_acc_pallas, im2col
from mandheling_tpu.ops.kernels.matmul_int8 import (
    matmul_acc_pallas,
    matmul_acc_pallas_padded,
)


def rand_int8(rng, shape):
    return rng.integers(-30, 30, shape).astype(np.int8)


@pytest.mark.parametrize("m,k,n", [(8, 16, 8), (100, 50, 30), (256, 256, 256)])
def test_pallas_matmul_matches_xla(m, k, n):
    rng = np.random.default_rng(m + k + n)
    a = jnp.asarray(rand_int8(rng, (m, k)))
    b = jnp.asarray(rand_int8(rng, (k, n)))
    expected = jnp.dot(
        a.astype(jnp.int32), b.astype(jnp.int32)
    )
    got = matmul_acc_pallas_padded(a, b, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(expected))


def test_pallas_matmul_dispatch_falls_back_on_skinny_shapes():
    """The dispatch entry declines shapes whose tile padding would inflate
    HBM traffic (K<128 or N<64) — the caller then uses XLA's dot."""
    rng = np.random.default_rng(0)
    a = jnp.asarray(rand_int8(rng, (256, 25)))
    b = jnp.asarray(rand_int8(rng, (25, 20)))
    assert matmul_acc_pallas(a, b, interpret=True) is None
    a = jnp.asarray(rand_int8(rng, (256, 256)))
    b = jnp.asarray(rand_int8(rng, (256, 128)))
    got = matmul_acc_pallas(a, b, interpret=True)
    expected = jnp.dot(a.astype(jnp.int32), b.astype(jnp.int32))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(expected))


def test_im2col_ordering_matches_hwio_reshape():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rand_int8(rng, (2, 7, 7, 3)))
    w = jnp.asarray(rand_int8(rng, (3, 3, 3, 5)))
    patches, (oh, ow) = im2col(x, (3, 3), (1, 1), ((0, 0), (0, 0)))
    acc = patches.astype(jnp.int32) @ w.reshape(-1, 5).astype(jnp.int32)
    expected = conv_ops.conv2d_int8_acc(x, w)
    np.testing.assert_array_equal(
        np.asarray(acc.reshape(2, oh, ow, 5)), np.asarray(expected)
    )


@pytest.mark.parametrize(
    "stride,lhs_dil,rhs_dil",
    [((1, 1), (1, 1), (1, 1)), ((2, 2), (1, 1), (1, 1)),
     ((1, 1), (2, 2), (1, 1)), ((1, 1), (1, 1), (2, 2))],
)
def test_pallas_conv_matches_xla(stride, lhs_dil, rhs_dil):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rand_int8(rng, (2, 9, 9, 3)))
    w = jnp.asarray(rand_int8(rng, (3, 3, 3, 5)))
    pad = ((2, 2), (2, 2))
    import jax

    expected = jax.lax.conv_general_dilated(
        x, w, stride, pad, lhs_dilation=lhs_dil, rhs_dilation=rhs_dil,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    got = conv_acc_pallas(x, w, stride, pad, lhs_dil, rhs_dil, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(expected))


def test_backend_switch_end_to_end():
    """Forward conv through the dispatch layer must be bit-identical across
    backends (requant included)."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rand_int8(rng, (2, 8, 8, 4)))
    w = jnp.asarray(rand_int8(rng, (3, 3, 4, 8)))
    y_xla, e_xla = conv_ops.conv2d_forward(x, jnp.int32(-5), w, jnp.int32(-6))
    with use_backend("pallas_interpret"):
        y_p, e_p = conv_ops.conv2d_forward(x, jnp.int32(-5), w, jnp.int32(-6))
    np.testing.assert_array_equal(np.asarray(y_xla), np.asarray(y_p))
    assert int(e_xla) == int(e_p)
