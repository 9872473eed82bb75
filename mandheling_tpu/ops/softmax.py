"""NITI int8 softmax forward (+ its passthrough gradient).

Reference behavior (NITI_CPUSoftmax_Int8.cpp:49-112):
  if ascale > -7:
      s    = trunc(x * 47274 / 2^15) scaled by 2^ascale (trunc division for
             negative ascale — C `>>` on the nonneg product equals trunc here)
      m    = max_c(s) - 10
      out  = 2^max(s - m, 0) - 1          # int32 "counts", 10-bit range
  else:  # tiny-scale quadratic fallback (whole tensor, no per-row max)
      out  = 2^(1-2a) + x*2^(1-a) + x^2

The output is UNNORMALIZED int32 counts (the consumer — the loss gradient —
normalizes by the row sum). Used by the reference's eval-path variants; the
training loss fuses the same math (see ops/loss.py).

Gradient (NITI_CPUSoftmaxGrad_Int8.cpp:28-45): the int32 upstream value is
copied into the int8 output by C implicit conversion — i.e. truncation to the
low 8 bits — reproduced here exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import numerics


def softmax_int8_forward(logits: jax.Array, ascale: jax.Array) -> jax.Array:
    """int8 logits (..., C) + int32 scalar exponent -> int32 counts (..., C)."""
    x = logits.astype(jnp.int32)
    a = jnp.clip(ascale.astype(jnp.int32), -9, 15)

    def branch_linear(x, a):
        t = jax.lax.div(x * 47274, jnp.int32(1 << 15))  # constant divisor: ok
        pos = t * jnp.left_shift(jnp.int32(1), jnp.maximum(a, 0))
        neg = numerics.trunc_shift_div(t, jnp.maximum(-a, 0))
        s = jnp.where(a >= 0, pos, neg)
        m = jnp.max(s, axis=-1, keepdims=True) - 10
        e = jnp.maximum(s - m, 0)
        return jnp.left_shift(jnp.int32(1), e) - 1

    def branch_quadratic(x, a):
        base = jnp.left_shift(jnp.int32(1), 1 - 2 * a)
        shiftbase = jnp.left_shift(jnp.int32(1), 1 - a)
        return base + x * shiftbase + x * x

    return jnp.where(a > -7, branch_linear(x, a), branch_quadratic(x, a))


def softmax_grad_int8(upstream: jax.Array) -> jax.Array:
    """int32 -> int8 by truncation to the low byte (C implicit conversion),
    exactly as NITI_CPUSoftmaxGrad_Int8.cpp:40-42."""
    return upstream.astype(jnp.int32).astype(jnp.int8)
