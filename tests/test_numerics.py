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
