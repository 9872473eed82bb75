"""Pallas kernel tests in interpret mode (the analog of the reference's
MNN_HEXAGON_DSP_SIMU CPU simulation of DSP numerics + *_ref op pairs,
SURVEY.md section 4). All backends must produce identical int32 accumulators.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mandheling_tpu.ops import conv as conv_ops
from mandheling_tpu.ops.conv import use_fused_conv_mode
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
    # big enough channels to pass the profitability guard (K>=128, OC>=64)
    x = jnp.asarray(rand_int8(rng, (2, 9, 9, 16)))
    w = jnp.asarray(rand_int8(rng, (3, 3, 16, 64)))
    pad = ((2, 2), (2, 2))
    import jax

    expected = jax.lax.conv_general_dilated(
        x, w, stride, pad, lhs_dilation=lhs_dil, rhs_dilation=rhs_dil,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    got = conv_acc_pallas(x, w, stride, pad, lhs_dil, rhs_dil, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(expected))


@pytest.mark.parametrize(
    "x_shape,w_shape,stride,padding",
    [
        ((2, 9, 9, 3), (3, 3, 3, 8), (2, 2), "SAME"),     # strided banded
        ((2, 9, 9, 3), (5, 5, 3, 8), (2, 2), "SAME"),     # 5x5 stride-2
        ((2, 33, 33, 8), (3, 3, 8, 16), (2, 2), "SAME"),  # downsample shape
        ((4, 16, 16, 256), (1, 1, 256, 128), (1, 1), "VALID"),  # 1x1 matmul
        ((4, 16, 16, 256), (1, 1, 256, 128), (2, 2), "VALID"),  # 1x1 stride-2
    ],
)
def test_fused_conv_strided_and_1x1_parity(x_shape, w_shape, stride, padding):
    """Strided/1x1 fused two-phase kernels must be bit-identical to the
    unfused XLA path, forward and input-grad — the supernode computes the
    shift on-accelerator for *every* conv shape
    (niti_op_supernode_new.c:4630-6094), so must we."""
    rng = np.random.default_rng(sum(x_shape) + sum(w_shape))
    x = jnp.asarray(rand_int8(rng, x_shape))
    w = jnp.asarray(rand_int8(rng, w_shape))
    y0, e0 = conv_ops.conv2d_forward(x, jnp.int32(-5), w, jnp.int32(-6),
                                     stride, padding)
    with use_backend("pallas_interpret"), use_fused_conv_mode("all"):
        y1, e1 = conv_ops.conv2d_forward(x, jnp.int32(-5), w, jnp.int32(-6),
                                         stride, padding)
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))
    assert int(e0) == int(e1)

    gy = jnp.asarray(rand_int8(rng, np.asarray(y0).shape))
    g0 = conv_ops.conv2d_input_grad(gy, w, x_shape[1:3], stride, padding)
    with use_backend("pallas_interpret"), use_fused_conv_mode("all"):
        g1 = conv_ops.conv2d_input_grad(gy, w, x_shape[1:3], stride, padding)
    np.testing.assert_array_equal(np.asarray(g0), np.asarray(g1))


def test_fused_matmul_two_phase_parity():
    """Fused matmul max/requant phases vs the unfused dot + numerics path."""
    from mandheling_tpu.ops import numerics
    from mandheling_tpu.ops.kernels.fused_matmul_int8 import (
        matmul_max_pallas,
        matmul_requant_pallas,
    )

    rng = np.random.default_rng(7)
    a = jnp.asarray(rand_int8(rng, (300, 100)))
    b = jnp.asarray(rand_int8(rng, (100, 70)))
    acc = jnp.dot(a.astype(jnp.int32), b.astype(jnp.int32))
    m = matmul_max_pallas(a, b, interpret=True)
    assert int(m) == int(jnp.max(jnp.abs(acc)))
    shift = numerics.forward_shift(numerics.range_estimate_from_max(m))
    expected, _ = numerics.requant_forward_from_bw(
        acc, jnp.int32(0), numerics.range_estimate_from_max(m)
    )
    got = matmul_requant_pallas(a, b, shift, grad=False, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(expected))
    # grad epilogue (pure psto, no wrap-cast branch)
    gshift = jnp.int32(3)
    np.testing.assert_array_equal(
        np.asarray(matmul_requant_pallas(a, b, gshift, grad=True,
                                         interpret=True)),
        np.asarray(numerics.psto_shift_int8(acc, gshift)),
    )


@pytest.mark.slow
@pytest.mark.parametrize("fused_mode", ["matmul_only", "all"])
def test_train_step_cross_backend_bit_parity(fused_mode):
    """N full train steps under xla vs pallas_interpret must produce
    identical params, losses, and exponents — the whole-graph SIMU check
    (reference: nn/NN.cpp:1250-1255, NITI_ConvMinMax_Int8.cpp:162-268
    validate the offloaded graph's numerics on CPU). Runs under both the
    measured-default fused mode and "all" (banded conv kernels in the
    whole graph)."""
    import jax

    from mandheling_tpu.data import onehot_padded
    from mandheling_tpu.models import NITI_LOGIT_CHANNELS, lenet_niti
    from mandheling_tpu.train import make_train_step

    model = lenet_niti()
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(0, 1, (16, 28, 28, 1)), jnp.float32)
    oh = jnp.asarray(onehot_padded(rng.integers(0, 10, 16), 10,
                                   NITI_LOGIT_CHANNELS))

    def run(backend):
        params = model.init(jax.random.PRNGKey(0))
        losses = []
        with use_backend(backend), use_fused_conv_mode(fused_mode):
            step = jax.jit(make_train_step(model))
            for _ in range(5):
                params, loss = step(params, x, oh)
                losses.append(float(loss))
        return params, losses

    p_xla, l_xla = run("xla")
    p_int, l_int = run("pallas_interpret")
    assert l_xla == l_int
    flat_x, _ = jax.tree.flatten(p_xla)
    flat_i, _ = jax.tree.flatten(p_int)
    for a, b in zip(flat_x, flat_i):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_backend_switch_end_to_end():
    """Forward conv through the dispatch layer must be bit-identical across
    backends (requant included)."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rand_int8(rng, (2, 8, 8, 4)))
    w = jnp.asarray(rand_int8(rng, (3, 3, 4, 8)))
    y_xla, e_xla = conv_ops.conv2d_forward(x, jnp.int32(-5), w, jnp.int32(-6))
    with use_backend("pallas_interpret"), use_fused_conv_mode("all"):
        y_p, e_p = conv_ops.conv2d_forward(x, jnp.int32(-5), w, jnp.int32(-6))
    np.testing.assert_array_equal(np.asarray(y_xla), np.asarray(y_p))
    assert int(e_xla) == int(e_p)


def test_fused_small_kn_matmul_parity():
    """Unpadded small-K/N fused matmul path (MobileNet pointwise shapes)
    vs the unfused dot + numerics path, max and requant, grad and fwd."""
    from mandheling_tpu.ops import numerics
    from mandheling_tpu.ops.kernels.fused_matmul_int8 import (
        matmul_max_pallas,
        matmul_requant_pallas,
    )

    rng = np.random.default_rng(11)
    for m, k, n in [(1024, 24, 144), (512, 144, 24), (256, 96, 576)]:
        a = jnp.asarray(rand_int8(rng, (m, k)))
        b = jnp.asarray(rand_int8(rng, (k, n)))
        acc = jnp.dot(a.astype(jnp.int32), b.astype(jnp.int32))
        mx = matmul_max_pallas(a, b, interpret=True)
        assert int(mx) == int(jnp.max(jnp.abs(acc))), (m, k, n)
        bw = numerics.range_estimate_from_max(mx)
        shift = numerics.forward_shift(bw)
        expected, _ = numerics.requant_forward_from_bw(acc, jnp.int32(0), bw)
        got = matmul_requant_pallas(a, b, shift, grad=False, interpret=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(expected))
        got_g = matmul_requant_pallas(a, b, jnp.int32(3), grad=True,
                                      interpret=True)
        np.testing.assert_array_equal(
            np.asarray(got_g),
            np.asarray(numerics.psto_shift_int8(acc, jnp.int32(3))),
        )


@pytest.mark.parametrize("stride", [(1, 1), (2, 2)])
def test_fused_depthwise_parity(stride):
    """Fused two-phase depthwise conv (fwd, igrad, fgrad) bit-identical to
    the unfused XLA path; strided fwd falls back, strided igrad dilates."""
    from mandheling_tpu.ops import depthwise as dw_ops

    rng = np.random.default_rng(5)
    x = jnp.asarray(rand_int8(rng, (4, 16, 16, 24)))
    w = jnp.asarray(rand_int8(rng, (3, 3, 1, 24)))
    y0, e0 = dw_ops.dwconv2d_forward(x, jnp.int32(-5), w, jnp.int32(-6),
                                     stride, "SAME")
    with use_backend("pallas_interpret"):
        y1, e1 = dw_ops.dwconv2d_forward(x, jnp.int32(-5), w, jnp.int32(-6),
                                         stride, "SAME")
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))
    assert int(e0) == int(e1)

    gy = jnp.asarray(rand_int8(rng, np.asarray(y0).shape))
    g0 = dw_ops.dwconv2d_input_grad(gy, w, (16, 16), stride, "SAME")
    with use_backend("pallas_interpret"):
        g1 = dw_ops.dwconv2d_input_grad(gy, w, (16, 16), stride, "SAME")
    np.testing.assert_array_equal(np.asarray(g0), np.asarray(g1))

    f0 = dw_ops.dwconv2d_filter_grad(x, gy, (3, 3), stride, "SAME")
    with use_backend("pallas_interpret"):
        f1 = dw_ops.dwconv2d_filter_grad(x, gy, (3, 3), stride, "SAME")
    np.testing.assert_array_equal(np.asarray(f0), np.asarray(f1))


def test_dw_impl_selector_cross_parity():
    """dwconv2d_forward must produce identical results under every
    _DW_IMPL routing (taps / grouped)."""
    import jax.numpy as jnp

    from mandheling_tpu.ops import depthwise as dw_ops

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.integers(-40, 40, (8, 9, 9, 24)).astype(np.int8))
    w = jnp.asarray(rng.integers(-40, 40, (3, 3, 1, 24)).astype(np.int8))
    e = jnp.int32(-4)
    outs = {}
    for impl in ("taps", "grouped"):
        dw_ops.set_dw_impl(impl)
        try:
            for stride in ((1, 1), (2, 2)):
                y, ye = dw_ops.dwconv2d_forward(x, e, w, e, stride, "SAME")
                outs.setdefault(stride, []).append(
                    (np.asarray(y), int(ye)))
                g = dw_ops.dwconv2d_input_grad(
                    y, w, (9, 9), stride, "SAME")
                outs[stride].append((np.asarray(g), 0))
        finally:
            dw_ops.set_dw_impl("taps")
    for stride, results in outs.items():
        half = len(results) // 2
        for (a, ea), (b, eb) in zip(results[:half], results[half:]):
            np.testing.assert_array_equal(a, b)
            assert ea == eb
