"""Filter-gradient strategy selection (the parallel.txt analog).

Both strategies — conv-with-batch-contraction and im2col+matmul (the
reference's NITI_DSPMatmulGradientConv chain) — must produce the identical
int32 accumulator, hence bit-identical int8 gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mandheling_tpu.ops import conv as conv_ops


CASES = [
    # (batch, h, w, ic, oc, kernel, stride, padding)
    (4, 12, 12, 8, 16, (5, 5), (1, 1), "VALID"),
    (4, 12, 12, 8, 16, (3, 3), (2, 2), "SAME"),
    (8, 8, 8, 4, 4, (3, 3), (1, 1), "SAME"),
    (2, 7, 7, 16, 8, (1, 1), (1, 1), "VALID"),
    (2, 9, 9, 4, 12, (3, 3), (2, 2), "VALID"),
]


@pytest.mark.parametrize("b,h,w,ic,oc,k,s,pad", CASES)
def test_matmul_strategy_matches_conv(b, h, w, ic, oc, k, s, pad):
    rng = np.random.default_rng(42)
    x = jnp.asarray(rng.integers(-127, 128, (b, h, w, ic)), jnp.int8)
    pads = conv_ops.resolve_padding(pad, k, s, (h, w))
    oh = (h + pads[0][0] + pads[0][1] - k[0]) // s[0] + 1
    ow = (w + pads[1][0] + pads[1][1] - k[1]) // s[1] + 1
    gy = jnp.asarray(rng.integers(-127, 128, (b, oh, ow, oc)), jnp.int8)

    with conv_ops.use_filter_grad_strategy("conv"):
        acc_conv = conv_ops.conv2d_filter_grad_acc(x, gy, k, s, pad)
        g_conv = conv_ops.conv2d_filter_grad(x, gy, k, s, pad)
    with conv_ops.use_filter_grad_strategy("matmul"):
        acc_mm = conv_ops.conv2d_filter_grad_acc(x, gy, k, s, pad)
        g_mm = conv_ops.conv2d_filter_grad(x, gy, k, s, pad)
    with conv_ops.use_filter_grad_strategy("corr"):
        acc_corr = conv_ops.conv2d_filter_grad_acc(x, gy, k, s, pad)

    np.testing.assert_array_equal(np.asarray(acc_conv), np.asarray(acc_mm))
    np.testing.assert_array_equal(np.asarray(g_conv), np.asarray(g_mm))
    np.testing.assert_array_equal(np.asarray(acc_conv), np.asarray(acc_corr))


def test_auto_strategy_runs_and_matches():
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.integers(-127, 128, (8, 14, 14, 8)), jnp.int8)
    gy = jnp.asarray(rng.integers(-127, 128, (8, 10, 10, 16)), jnp.int8)
    with conv_ops.use_filter_grad_strategy("conv"):
        ref = conv_ops.conv2d_filter_grad_acc(x, gy, (5, 5), (1, 1), "VALID")
    with conv_ops.use_filter_grad_strategy("auto"):
        auto = conv_ops.conv2d_filter_grad_acc(x, gy, (5, 5), (1, 1), "VALID")
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(auto))


def test_strategy_guard():
    with pytest.raises(ValueError):
        conv_ops.set_filter_grad_strategy("bogus")
    assert conv_ops.get_filter_grad_strategy() in ("conv", "matmul", "auto")
