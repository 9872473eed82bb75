"""NITI integer-only softmax cross-entropy: float loss value + int8 gradient.

Reference:
- loss value (float, logging only): `NITI_CPULoss_Int8.cpp:69-131` —
  dequantize logits by 2^ascale, float softmax, mean negative log-likelihood.
- loss gradient (integer-only):     `NITI_CPULossGrad_Int8.cpp:84-200` and the
  identical DSP op `hexagon_nn/2.10.1/hexagon/ops/src/op_loss.c:124-260`:

    if ascale > -7:
        s     = trunc(x * 47274 / 2^15) * 2^ascale      # 47274/2^15 ~ log2(e)... see note
        m     = max_c(s) - 10
        soft  = 2^max(s - m, 0) - 1                     # base-2 exp approx, 10-bit range
    else:  # tiny-scale quadratic fallback
        soft  = 2^(1-2a) + x*2^(1-a) + x^2              # ~ (x + 2^-a)^2 + ...
    p     = trunc(soft * 2^11 / sum_c(soft))            # normalize to ~2^11
    g     = p - (sum_c p) * onehot(target)
    out   = psto_shift(g, 4) -> int8

Note: 47274/2^15 = 1.4427 = log2(e)... the constant converts natural-log-ish
scaling; we reproduce the exact integer arithmetic, including C truncating
division, so results are bit-identical to the CPU and DSP reference kernels.

Arithmetic width: the reference computes in int64. The linear branch
(ascale > -7) fits int32 exactly (max intermediate soft*2^11 <= 2^22;
validated bit-for-bit against an int64 golden model in
tests/test_loss_grad_int64_golden.py). The quadratic fallback
(ascale <= -7) genuinely needs 64-bit (base = 2^(1-2a) alone exceeds int32
from ascale <= -15, and the normalized counts deviate by several units if
computed with a clamped scale), so that branch runs in real int64 under
`jax.experimental.enable_x64` — the tensor is (B, C) tiny, so the emulated
s64 cost on TPU is negligible. ascale is clamped to [-25, -7] inside the
branch: at -25, soft*2^11 reaches ~2^63 — beyond that the reference's own
int64 arithmetic overflows (UB), so the clamp only diverges where the
reference is undefined.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from . import numerics


def loss_cross_entropy_float(
    logits: jax.Array, ascale: jax.Array, target_onehot: jax.Array
) -> jax.Array:
    """Float CE value for logging (NITI_CPULoss_Int8.cpp:69-131).

    logits: int8 (B, C); ascale: int32 scalar; target_onehot: (B, C) {0,1}.
    """
    x = logits.astype(jnp.float32) * jnp.exp2(ascale.astype(jnp.float32))
    logp = jax.nn.log_softmax(x, axis=-1)
    per_sample = jnp.sum(logp * target_onehot.astype(jnp.float32), axis=-1)
    return -jnp.mean(per_sample)


def loss_grad_int8(
    logits: jax.Array, ascale: jax.Array, target_onehot: jax.Array
) -> jax.Array:
    """Integer-only softmax-CE gradient -> int8 (B, C).

    Bit-exact port of NITI_CPULossGrad_Int8.cpp:84-200 (the linear branch in
    int32, the quadratic fallback in real int64 — see module docstring).
    """
    x = logits.astype(jnp.int32)
    a = jnp.clip(ascale.astype(jnp.int32), -25, 15)

    def p_linear(x, a):
        a = jnp.maximum(a, -6)  # branch valid for a > -7 only
        # s = trunc(x * 47274 / 2^15) * 2^a   (trunc division, both signs)
        t = jax.lax.div(x * 47274, jnp.int32(1 << 15))  # constant divisor: ok
        pos = t * jnp.left_shift(jnp.int32(1), jnp.maximum(a, 0))
        neg = numerics.trunc_shift_div(t, jnp.maximum(-a, 0))
        s = jnp.where(a >= 0, pos, neg)
        m = jnp.max(s, axis=-1, keepdims=True) - 10
        e = jnp.maximum(s - m, 0)
        soft = jnp.left_shift(jnp.int32(1), e) - 1
        ssum = jnp.sum(soft, axis=-1, keepdims=True)
        return jax.lax.div(soft * jnp.int32(1 << 11), ssum)

    def p_quadratic(x, a):
        # base = 2^(1-2a) exceeds int32 from a <= -15 and the normalized
        # counts are scale-sensitive, so this branch is real int64 (the
        # reference's width). enable_x64 only affects trace-time dtypes;
        # the (B, C) tensor keeps the emulated-s64 cost negligible.
        with jax.enable_x64(True):
            x64 = x.astype(jnp.int64)
            a64 = jnp.clip(a, -25, -7).astype(jnp.int64)
            base = jnp.left_shift(jnp.int64(1), 1 - 2 * a64)
            shiftbase = jnp.left_shift(jnp.int64(1), 1 - a64)
            soft = base + x64 * shiftbase + x64 * x64
            ssum = jnp.sum(soft, axis=-1, keepdims=True)
            p = jax.lax.div(soft * jnp.int64(1 << 11), ssum)
        return p.astype(jnp.int32)  # p <= 2^11

    p = jnp.where(a > -7, p_linear(x, a), p_quadratic(x, a))
    psum = jnp.sum(p, axis=-1, keepdims=True)
    g = p - psum * target_onehot.astype(jnp.int32)
    return numerics.psto_shift_int8(g, jnp.int32(4))


def loss_and_grad(
    logits: jax.Array, ascale: jax.Array, target_onehot: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """(float loss for logging, int8 gradient) in one call — the TPU analog
    of the reference's `_NITI_LOSS_SUM` forward + `NITI_LOSS_Grad_Int8`
    backward pair (grad/NITI_SoftmaxGrad.cpp:41-67)."""
    return (
        loss_cross_entropy_float(logits, ascale, target_onehot),
        loss_grad_int8(logits, ascale, target_onehot),
    )
