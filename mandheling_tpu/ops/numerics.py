"""Core NITI integer numerics: range estimation and pseudo-stochastic shift.

These are the TPU-native equivalents of the reference's scalar helpers
(`execution-engine/source/backend/cpu/compute/CommonOptFunction.cpp:1548-1680`):

- ``NITI_int8_clip``      -> :func:`int8_clip`
- ``NITI_sign``           -> :func:`int_sign`
- ``NITI_RangeEstimate``  -> :func:`range_estimate`  (bw = ceil(log2(max|x|)), 0 if all-zero)
- ``NITI_MNNPstoShiftInt32[ToInt8]`` -> :func:`psto_shift`

The pseudo-stochastic rounding ("psto") derives its random bit from the
*discarded low bits themselves* — it is deterministic and data-dependent, and
we reproduce the exact C bit-math (truncating division, |remainder| split into
a "quantized probability" and a "pseudo random number") so that TPU results
are bit-identical to the reference CPU/DSP kernels.

Everything here is shape-static and jit-friendly: `shift` is a traced int32
scalar, all tensor math is int32 on the VPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

INT8_MIN = -127  # reference clips symmetrically to +/-127 (NITI_int8_clip)
INT8_MAX = 127


def int8_clip(x: jax.Array) -> jax.Array:
    """Clip int32 values to the symmetric int8 range [-127, 127]."""
    return jnp.clip(x, INT8_MIN, INT8_MAX)


def int_sign(x: jax.Array) -> jax.Array:
    """Integer sign: 1 for positive, -1 for negative, 0 for zero."""
    return jnp.sign(x).astype(jnp.int32)


def range_estimate(acc: jax.Array) -> jax.Array:
    """bw = ceil(log2(max|acc|)) as an exact int32 scalar; 0 if max == 0.

    Reference: ``NITI_RangeEstimate`` (CommonOptFunction.cpp:1565-1577).

    Computed without floating point: ceil(log2(m)) equals the number of
    k in [0, 31) with 2^k < m, which is exact for any int32 magnitude
    (float log2 would misround near powers of two for m > 2^24).
    """
    m = jnp.max(jnp.abs(acc.astype(jnp.int32)))
    thresholds = jnp.left_shift(jnp.int32(1), jnp.arange(31, dtype=jnp.int32))
    return jnp.sum((m > thresholds).astype(jnp.int32))


def range_estimate_from_max(m: jax.Array) -> jax.Array:
    """ceil(log2(m)) for a precomputed non-negative int32 max magnitude.

    Split out so that data-parallel training can `pmax` the local maxima
    across replicas before deriving the (then globally consistent) shift.
    """
    m = m.astype(jnp.int32)
    thresholds = jnp.left_shift(jnp.int32(1), jnp.arange(31, dtype=jnp.int32))
    return jnp.sum((m > thresholds).astype(jnp.int32))


def trunc_shift_div(x: jax.Array, s: jax.Array) -> jax.Array:
    """C-style trunc-toward-zero division of int32 by 2^s (s >= 0, traced),
    lowered to shift/mask bit ops — TPU has no s32 divide instruction, so
    `lax.div` with a traced divisor is emulated and extremely slow."""
    x = x.astype(jnp.int32)
    s = s.astype(jnp.int32)
    mask = jnp.left_shift(jnp.int32(1), s) - 1
    bias = jnp.bitwise_and(jnp.right_shift(x, jnp.int32(31)), mask)
    return jnp.right_shift(x + bias, s)


def psto_round(acc: jax.Array, shift: jax.Array, rail: int = 127) -> jax.Array:
    """Pseudo-stochastic right shift of int32 by `shift` bits -> int32 in
    [-rail, rail] (rail=127 is the reference int8 contract; rail=32767 is
    this framework's int16 extension for the MobileNetV2 linear-bottleneck
    study, r5).

    Bit-exact port of the formula in ``NITI_MNNPstoShiftInt32``
    (CommonOptFunction.cpp:1595-1627):

        round_temp = trunc(acc / 2^shift)                  # C division truncates
        prob       = |acc - round_temp * 2^shift|          # discarded magnitude
        qprob      = trunc(prob / 2^(shift/2))
        prand      = (prob - qprob * 2^(shift/2)) * (2 if shift odd else 1)
        out        = clip(round_temp + (qprob > prand) * sign(acc))

    `shift` may be a traced scalar; it is clamped to [0, 30] (the reference
    never calls with negative shift in a well-formed graph; C `1 << -1` would
    be UB — we make it an identity shift instead).
    """
    shift = jnp.clip(shift.astype(jnp.int32), 0, 30)
    acc = acc.astype(jnp.int32)
    # All divisions are by powers of two, so they lower to shift/mask bit ops
    # (TPU has no s32 divide — lax.div with a traced divisor is emulated and
    # dominates the whole training step). Trunc-toward-zero division by 2^s
    # is an arithmetic shift with a bias for negatives:
    #   trunc(a / 2^s) = (a + ((a >> 31) & (2^s - 1))) >> s
    mask = jnp.left_shift(jnp.int32(1), shift) - 1
    bias = jnp.bitwise_and(jnp.right_shift(acc, jnp.int32(31)), mask)
    round_temp = jnp.right_shift(acc + bias, shift)
    prob = jnp.abs(acc - jnp.left_shift(round_temp, shift))

    h = jnp.right_shift(shift, jnp.int32(1))  # shift // 2
    hmask = jnp.left_shift(jnp.int32(1), h) - 1
    odd = jnp.bitwise_and(shift, jnp.int32(1))
    qprob = jnp.right_shift(prob, h)  # prob >= 0: logical == trunc div
    prand = jnp.left_shift(jnp.bitwise_and(prob, hmask), odd)
    round_1 = (qprob > prand).astype(jnp.int32)
    return jnp.clip(round_temp + round_1 * int_sign(acc), -rail, rail)


def psto_shift_int8(acc: jax.Array, shift: jax.Array) -> jax.Array:
    """:func:`psto_round` cast to int8 (NITI_MNNPstoShiftInt32ToInt8)."""
    return psto_round(acc, shift).astype(jnp.int8)


def requant_forward(acc: jax.Array, exp_in: jax.Array, out_bits: int = 7):
    """Forward-conv requantization: int32 accumulator -> (intN, exp_out).

    Reference: NITI_Conv_Int8.cpp:255-307 (also NITI_DeConv_Int8.cpp:294-318).

        bw = range_estimate(acc); shift = bw - 7
        shift > 1 : psto-shift by `shift`, exp_out = exp_in + shift
        shift == 1: psto-shift by 2,       exp_out = exp_in + 2
        shift <= 0: plain int8 cast,       exp_out = exp_in

    `exp_in` must already include the weight exponent (exp_x + exp_w).
    Returns (int8 tensor, int32 scalar exponent).

    out_bits=7 is the reference int8 contract. out_bits=15 is this
    framework's int16 extension (same rules with shift = bw - 15, psto
    rail 32767, int16 output) — used for MobileNetV2 linear-projection
    outputs, where per-tensor int8 requant destroys the bottleneck signal
    (r5 study; the reference never trains MNv2 integer-only at all,
    demo/MobilenetV2Utils.cpp).
    """
    bw = range_estimate(acc)
    return requant_forward_from_bw(acc, exp_in, bw, out_bits)


def forward_shift(bw: jax.Array, out_bits: int = 7) -> jax.Array:
    """Effective forward shift from the bitwidth: bw-out_bits, promoted to
    2 when exactly 1, 0 when <= 0 (NITI_Conv_Int8.cpp:262-305)."""
    shift = bw - out_bits
    return jnp.where(shift > 1, shift, jnp.where(shift == 1, 2, 0))


def requant_forward_from_bw(acc: jax.Array, exp_in: jax.Array, bw: jax.Array,
                            out_bits: int = 7):
    """Forward requantization given a precomputed bitwidth (see requant_forward).

    Split out so data-parallel callers can compute `bw` from a cross-replica
    pmax of |acc| and keep every replica's shift identical.
    """
    if out_bits not in (7, 15):
        raise ValueError(f"out_bits must be 7 or 15, got {out_bits}")
    dtype = jnp.int8 if out_bits == 7 else jnp.int16
    rail = (1 << out_bits) - 1
    eff_shift = forward_shift(bw, out_bits)
    exp_out = exp_in.astype(jnp.int32) + eff_shift
    shifted = psto_round(acc, eff_shift, rail)
    # shift <= 0 path is a *plain C cast* (wraps, not clips):
    # `output_ptr[i] = (int8_t)outputDataPtr[i]` — NITI_Conv_Int8.cpp:301-305.
    plain = acc.astype(jnp.int32).astype(dtype).astype(jnp.int32)
    out = jnp.where(eff_shift > 0, shifted, plain)
    return out.astype(dtype), exp_out


def requant_grad(acc: jax.Array, margin: int):
    """Gradient requantization: shift = bw - margin; all-zero stays zero.

    Reference uses margin=2 for conv filter gradients
    (NITI_GradientConv_Int8.cpp:274-296) and margin=3 for FC/matmul
    gradients (NITI_Matmul_Int8.cpp:219-231). If the accumulator is
    all-zero (bw == 0), the output is zero (memset in the reference).
    """
    bw = range_estimate(acc)
    return requant_grad_from_bw(acc, bw, margin)


def requant_grad_from_bw(acc: jax.Array, bw: jax.Array, margin: int):
    """Gradient requantization with precomputed bitwidth (see requant_grad)."""
    out = psto_shift_int8(acc, bw - margin)
    return jnp.where(bw == 0, jnp.int8(0), out)
