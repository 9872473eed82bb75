"""NITI int8 elementwise ops (residual adds) and padding.

Reference: `NITI_Eltwise_Int8.cpp:26` (int8 eltwise used for residual
connections) and `NITI_PAD_Int8` (symmetric spatial zero-pad).

For residual adds of two QTensors with different exponents, the smaller-
exponent operand is right-shifted to the larger exponent before the int32
add, then the sum is requantized forward-style — keeping everything
power-of-two (the mixed-precision CNN configs in SURVEY.md section 7 step 5).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from . import numerics


def add_int8(
    a: jax.Array, a_exp: jax.Array, b: jax.Array, b_exp: jax.Array,
    out_bits: int = None,
) -> Tuple[jax.Array, jax.Array]:
    """Exponent-aligned integer residual add -> (intN, exp_out).

    align to max(a_exp, b_exp): x >> (max_exp - x_exp), int32 sum, then
    forward requant (shift = bw - out_bits rules) relative to the aligned
    exponent. out_bits defaults to the width of the wider operand (int16
    operands — the MNv2 linear-projection extension, ops/numerics
    out_bits=15 — produce an int16 sum so the bottleneck chain keeps its
    precision through the residual joins)."""
    if out_bits is None:
        out_bits = 15 if (a.dtype == jnp.int16 or b.dtype == jnp.int16) else 7
    a_exp = a_exp.astype(jnp.int32)
    b_exp = b_exp.astype(jnp.int32)
    e = jnp.maximum(a_exp, b_exp)
    ai = numerics.trunc_shift_div(a.astype(jnp.int32), e - a_exp)
    bi = numerics.trunc_shift_div(b.astype(jnp.int32), e - b_exp)
    acc = ai + bi
    return numerics.requant_forward(acc, e, out_bits)


def pad_int8(x: jax.Array, pad: int) -> jax.Array:
    """Symmetric spatial zero-pad of an NHWC int8 tensor (NITI_PAD_Int8)."""
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))


def concat_int8(datas, exps) -> Tuple[jax.Array, jax.Array]:
    """Exponent-aligned channel concat of N int8 branches -> (int8, exp_out).

    Multi-branch topologies (SqueezeNet Fire, Inception modules — the models
    of the reference's headline benchmark table,
    `execution-engine/benchmark/result/2020-3-22.md`) join branch outputs
    along the channel axis. Under NITI every branch carries its own
    power-of-two exponent, so the joined tensor must share one: align every
    branch to e = max(exps) by truncating right-shift (same alignment rule as
    the residual add above; right-shifting only shrinks magnitude, so the
    data stays int8 and no requantization is needed), then concatenate.
    """
    exps = [e.astype(jnp.int32) for e in exps]
    e = exps[0]
    for ei in exps[1:]:
        e = jnp.maximum(e, ei)
    aligned = [
        numerics.trunc_shift_div(d.astype(jnp.int32), e - ei).astype(jnp.int8)
        for d, ei in zip(datas, exps)
    ]
    return jnp.concatenate(aligned, axis=-1), e
