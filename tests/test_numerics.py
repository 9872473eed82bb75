"""Bit-exactness tests for the NITI numerics core.

The golden model is a pure-Python mirror of the C semantics in
`/root/reference/execution-engine/source/backend/cpu/compute/
CommonOptFunction.cpp:1548-1680` (truncating division, abs-remainder
pseudo-random bit). The reference has no unit tests for these (SURVEY.md
section 4); we add them as the foundation everything else sits on.
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from mandheling_tpu.ops import numerics


def c_trunc_div(a: int, b: int) -> int:
    """C integer division: truncation toward zero."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def py_psto_shift(x: int, shift: int) -> int:
    """Literal Python mirror of NITI_MNNPstoShiftInt32 (C semantics)."""
    if shift <= 0:
        # jnp impl clamps to 0 (identity path); C never sees negative shift
        shift = 0
    round_temp = c_trunc_div(x, 1 << shift)
    prob = abs(x - round_temp * (1 << shift))
    qprob = c_trunc_div(prob, 1 << (shift // 2))
    prand = prob - qprob * (1 << (shift // 2))
    if shift % 2 == 1:
        prand *= 2
    round_1 = 1 if qprob > prand else 0
    sign = 1 if x > 0 else (-1 if x < 0 else 0)
    return max(-127, min(127, round_temp + round_1 * sign))


def py_range_estimate(vals) -> int:
    m = max((abs(int(v)) for v in vals), default=0)
    return 0 if m == 0 else math.ceil(math.log2(m))


@pytest.mark.parametrize("shift", [0, 1, 2, 3, 4, 5, 7, 8, 12, 15, 23])
def test_psto_shift_bit_exact(shift):
    rng = np.random.default_rng(42 + shift)
    vals = np.concatenate(
        [
            rng.integers(-(2**30), 2**30, 2000),
            rng.integers(-300, 300, 500),
            np.array([0, 1, -1, 2**shift, -(2**shift), 2**30 - 1, -(2**30)]),
        ]
    ).astype(np.int32)
    expected = np.array([py_psto_shift(int(v), shift) for v in vals], np.int32)
    got = np.asarray(numerics.psto_round(jnp.asarray(vals), jnp.int32(shift)))
    np.testing.assert_array_equal(got, expected)


def test_psto_shift_int8_dtype():
    out = numerics.psto_shift_int8(jnp.arange(-100, 100, dtype=jnp.int32), jnp.int32(3))
    assert out.dtype == jnp.int8


def test_range_estimate_exact():
    cases = [
        [0],
        [1],
        [2],
        [3],
        [127],
        [128],
        [129],
        [2**20],
        [2**20 + 1],
        [2**24 + 1],  # float32 log2 would misround here
        [2**30],
        [-5, 3],
        [0, 0, 0],
    ]
    for vals in cases:
        got = int(numerics.range_estimate(jnp.asarray(vals, jnp.int32)))
        assert got == py_range_estimate(vals), vals


def test_range_estimate_randomized():
    rng = np.random.default_rng(7)
    for _ in range(20):
        vals = rng.integers(-(2**28), 2**28, 64).astype(np.int32)
        got = int(numerics.range_estimate(jnp.asarray(vals)))
        assert got == py_range_estimate(vals)


def test_requant_forward_branches():
    # shift > 1 branch: bw=9 -> shift=2
    acc = jnp.asarray([400, -400, 100, 0], jnp.int32)  # max 400 -> bw 9
    out, exp = numerics.requant_forward(acc, jnp.int32(-3))
    assert int(exp) == -3 + 2
    expected = [py_psto_shift(int(v), 2) for v in [400, -400, 100, 0]]
    np.testing.assert_array_equal(np.asarray(out), np.array(expected, np.int8))

    # shift == 1 branch (bw=8): shift forced to 2, exp_in + 2
    acc = jnp.asarray([200, -129], jnp.int32)
    out, exp = numerics.requant_forward(acc, jnp.int32(0))
    assert int(exp) == 2
    np.testing.assert_array_equal(
        np.asarray(out), np.array([py_psto_shift(200, 2), py_psto_shift(-129, 2)], np.int8)
    )

    # shift <= 0 branch: plain C cast (wraps: 128 -> -128)
    acc = jnp.asarray([128, -128, 127, -5], jnp.int32)
    out, exp = numerics.requant_forward(acc, jnp.int32(5))
    assert int(exp) == 5
    np.testing.assert_array_equal(
        np.asarray(out), np.array([-128, -128, 127, -5], np.int8)
    )


def test_requant_grad_zero_stays_zero():
    acc = jnp.zeros((8,), jnp.int32)
    out = numerics.requant_grad(acc, margin=2)
    np.testing.assert_array_equal(np.asarray(out), np.zeros(8, np.int8))


def test_requant_grad_margins():
    rng = np.random.default_rng(3)
    acc = rng.integers(-(2**15), 2**15, 256).astype(np.int32)
    bw = py_range_estimate(acc)
    for margin in (2, 3):
        out = numerics.requant_grad(jnp.asarray(acc), margin=margin)
        expected = np.array(
            [py_psto_shift(int(v), bw - margin) for v in acc], np.int8
        )
        np.testing.assert_array_equal(np.asarray(out), expected)


def py_psto_shift_rail(x: int, shift: int, rail: int) -> int:
    """py_psto_shift with a parametric clip rail (int16 extension)."""
    if shift <= 0:
        shift = 0
    round_temp = c_trunc_div(x, 1 << shift)
    prob = abs(x - round_temp * (1 << shift))
    qprob = c_trunc_div(prob, 1 << (shift // 2))
    prand = prob - qprob * (1 << (shift // 2))
    if shift % 2 == 1:
        prand *= 2
    round_1 = 1 if qprob > prand else 0
    sign = 1 if x > 0 else (-1 if x < 0 else 0)
    return max(-rail, min(rail, round_temp + round_1 * sign))


@pytest.mark.parametrize("shift", [0, 1, 3, 8, 14])
def test_psto_round_int16_rail(shift):
    """rail=32767 (the r5 int16 linear-projection extension) keeps the
    identical psto bit-math, only the clip widens."""
    rng = np.random.default_rng(7 + shift)
    vals = rng.integers(-(2 ** 30), 2 ** 30, 2000).astype(np.int32)
    expected = np.array(
        [py_psto_shift_rail(int(v), shift, 32767) for v in vals], np.int32)
    got = np.asarray(numerics.psto_round(jnp.asarray(vals), jnp.int32(shift),
                                         rail=32767))
    np.testing.assert_array_equal(got, expected)


def test_requant_forward_int16():
    """out_bits=15: shift = bw - 15 with the same promote rules; int16
    output dtype; values <= 2^15 pass through unshifted (plain cast)."""
    # bw = 17 for max 2^17 - 1 > 2^16: shift = 2
    acc = jnp.asarray(np.array([(1 << 17) - 1, -(1 << 16), 12345, 0],
                               np.int32))
    y, e = numerics.requant_forward(acc, jnp.int32(-20), out_bits=15)
    assert y.dtype == jnp.int16
    assert int(e) == -20 + 2
    # shift=2 exact mirror
    expected = np.array(
        [py_psto_shift_rail(int(v), 2, 32767) for v in np.asarray(acc)],
        np.int32)
    np.testing.assert_array_equal(np.asarray(y, np.int32), expected)
    # small accumulator: plain cast, exponent passthrough
    acc2 = jnp.asarray(np.array([32767, -32767, 100], np.int32))
    y2, e2 = numerics.requant_forward(acc2, jnp.int32(-20), out_bits=15)
    assert int(e2) == -20
    np.testing.assert_array_equal(np.asarray(y2), [32767, -32767, 100])


def test_add_int8_auto_widens_to_int16():
    """Residual adds of int16 operands (the MNv2 projection extension)
    produce an int16 sum; int8 operands keep the int8 contract."""
    from mandheling_tpu.ops import eltwise

    a = jnp.asarray(np.array([30000, -30000, 5], np.int16))
    b = jnp.asarray(np.array([10000, -10000, 3], np.int16))
    y, e = eltwise.add_int8(a, jnp.int32(-10), b, jnp.int32(-10))
    assert y.dtype == jnp.int16
    # 40000 needs bw=16 -> shift=1 -> promoted to 2, exp -10+2
    assert int(e) == -8
    a8 = jnp.asarray(np.array([100, -100], np.int8))
    y8, _ = eltwise.add_int8(a8, jnp.int32(-3), a8, jnp.int32(-3))
    assert y8.dtype == jnp.int8


def test_mnv2_int16_projection_dtypes():
    """proj_bits=15 model: projection outputs (and residual joins) are
    int16 in flight; relu6-capped convs stay int8; the step trains."""
    import jax

    from mandheling_tpu.models.mobilenet import mobilenet_v2_niti
    from mandheling_tpu.nn.layers import NITIConv2D

    model = mobilenet_v2_niti(width_mult=0.25, proj_bits=15)
    projs = [l for l in model.layers
             if isinstance(l, NITIConv2D) and l.out_bits == 15]
    assert len(projs) >= 5  # every bottleneck projection got the width
    params = model.init(jax.random.PRNGKey(0))
    from mandheling_tpu.ops.qtensor import QTensor
    from mandheling_tpu.train.train_step import quantize_batch

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (4, 32, 32, 3)), jnp.float32)
    data, ascale = quantize_batch(x)
    q = QTensor(data, ascale)
    seen_i16 = False
    for layer, p in zip(model.layers, params):
        q, _ = layer.fwd(p, q)
        if getattr(layer, "out_bits", 7) == 15:
            assert q.data.dtype == jnp.int16
            seen_i16 = True
        elif getattr(layer, "act", None) == "relu6":
            assert q.data.dtype == jnp.int8
    assert seen_i16
