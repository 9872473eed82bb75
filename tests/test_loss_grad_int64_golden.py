"""Exhaustive differential test of the integer loss gradient against an
int64 golden model.

The reference computes NITI_LOSS_Grad in int64 (NITI_CPULossGrad_Int8.cpp:
84-200); ops/loss.py computes in int32 (TPU-native — s64 is emulated on
TPU) with ascale clamped to [-9, 15] and claims: bit-identical for
ascale >= -9, and within +/-1 count pre-psto-shift for ascale < -9.
This file validates those claims against a direct int64 port of the C
kernel across the full ascale range and extreme logits.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from mandheling_tpu.ops.loss import loss_grad_int8


def _trunc_div(a, b):
    """C-style trunc-toward-zero integer division (numpy // floors)."""
    q = np.abs(a) // np.abs(b)
    return np.sign(a) * np.sign(b) * q


def _psto_shift_int8_golden(x, shift):
    """NITI_MNNPstoShiftInt32ToInt8 (CommonOptFunction.cpp:1595-1658),
    scalar int64 golden."""
    out = np.empty(x.shape, np.int64)
    for i, v in np.ndenumerate(x):
        v = int(v)
        round_temp = int(_trunc_div(np.int64(v), np.int64(1 << shift)))
        prob = abs(v - round_temp * (1 << shift))
        h = shift // 2
        qprob = prob >> h
        prand = (prob - (qprob << h)) * (2 if shift % 2 else 1)
        r = round_temp + (1 if qprob > prand else 0) * (1 if v > 0 else (-1 if v < 0 else 0))
        out[i] = max(-127, min(127, r))
    return out.astype(np.int8)


def loss_grad_golden_int64(logits, ascale, target_onehot):
    """Direct int64 port of NITI_CPULossGrad_Int8.cpp:84-200."""
    x = logits.astype(np.int64)
    b, c = x.shape
    a = int(ascale)
    if a > -7:
        t = _trunc_div(x * 47274, np.int64(1 << 15))
        if a >= 0:
            s = t * (1 << a)
        else:
            s = _trunc_div(t, np.int64(1 << (-a)))
        m = s.max(axis=-1, keepdims=True) - 10
        e = np.maximum(s - m, 0)
        soft = (np.int64(1) << e) - 1
    else:
        base = np.int64(1) << (1 - 2 * a)
        shiftbase = np.int64(1) << (1 - a)
        soft = base + x * shiftbase + x * x
    ssum = soft.sum(axis=-1, keepdims=True)
    p = _trunc_div(soft * (1 << 11), ssum)
    psum = p.sum(axis=-1, keepdims=True)
    g = p - psum * target_onehot.astype(np.int64)
    return _psto_shift_int8_golden(g, 4), g


def _cases(rng, b=8, c=12):
    logits = [
        rng.integers(-127, 128, (b, c)).astype(np.int8),
        np.full((b, c), 127, np.int8),
        np.full((b, c), -127, np.int8),
        np.zeros((b, c), np.int8),
        np.tile(np.linspace(-127, 127, c).astype(np.int8), (b, 1)),
    ]
    # extreme contrast: one huge logit per row
    spike = np.full((b, c), -127, np.int8)
    spike[np.arange(b), rng.integers(0, c, b)] = 127
    logits.append(spike)
    return logits


@pytest.mark.parametrize("ascale", list(range(-25, 16)))
def test_bit_identical_to_int64_golden(ascale):
    """The whole representable range must match the int64 golden exactly:
    the linear branch (ascale > -7) in int32 by proof of bounds, the
    quadratic branch in real int64. Below -25 the reference's own int64
    arithmetic overflows (soft*2^11 > 2^63), so the clamp there only
    diverges where the reference is undefined."""
    rng = np.random.default_rng(100 + ascale)
    for x in _cases(rng):
        b, c = x.shape
        onehot = np.zeros((b, c), np.int32)
        onehot[np.arange(b), rng.integers(0, 10, b)] = 1
        golden, _ = loss_grad_golden_int64(x, ascale, onehot)
        got = np.asarray(
            loss_grad_int8(jnp.asarray(x), jnp.int32(ascale),
                           jnp.asarray(onehot))
        )
        np.testing.assert_array_equal(got, golden)


def test_loss_grad_int8_output_range():
    """psto-shift clips to [-127, 127]; outputs must be in-range int8."""
    rng = np.random.default_rng(0)
    x = rng.integers(-127, 128, (16, 12)).astype(np.int8)
    onehot = np.zeros((16, 12), np.int32)
    onehot[np.arange(16), rng.integers(0, 10, 16)] = 1
    out = np.asarray(loss_grad_int8(jnp.asarray(x), jnp.int32(-5),
                                    jnp.asarray(onehot)))
    assert out.dtype == np.int8
    assert out.min() >= -127 and out.max() <= 127
