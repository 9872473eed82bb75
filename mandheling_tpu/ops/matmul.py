"""NITI int8 matmul with bw-3 gradient requantization.

Reference: `NITI_Matmul_Int8.cpp:140-245` — the FC-gradient matmul: int8 x
int8 -> int32 GEMM, then range-estimate and pseudo-stochastic shift by
(bw - 3); an all-zero accumulator produces zeros.

Kept as a first-class op for parity (the reference registers it and the DSP
MATMUL_GRADIENT strategy lowers to QuantizedMatMul_8x8to32 + Requantize,
NITI_DSPMatmulGradientConv_Int8.cpp) even though the standard conv grad
builder emits GradientCONV (bw-2) for FC-as-1x1-conv layers.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from . import numerics
from .kernels import dispatch as _dispatch


def matmul_int8_acc(a: jax.Array, b: jax.Array) -> jax.Array:
    """int8 (M, K) x int8 (K, N) -> int32 (M, N)."""
    return _dispatch.matmul_acc(a, b)


def matmul_int8_grad(a: jax.Array, b: jax.Array, axis_name: Optional[str] = None) -> jax.Array:
    """int8 GEMM + bw-3 psto requant (NITI_Matmul_Int8.cpp:219-231)."""
    from . import allreduce

    acc = matmul_int8_acc(a, b)
    return allreduce.grad_allreduce_requant(acc, axis_name, margin=3)


def matmul_int8_forward(
    a: jax.Array,
    a_exp: jax.Array,
    b: jax.Array,
    b_exp: jax.Array,
    axis_name: Optional[str] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Forward-style (bw-7 with branch rules) requant of an int8 GEMM —
    the matmul analog of conv2d_forward for FC layers expressed as matmul."""
    from .conv import _recompute_matmul_acc

    acc = matmul_int8_acc(a, b)
    m = jnp.max(jnp.abs(acc))
    if axis_name is not None:
        m = jax.lax.pmax(m, axis_name)
    bw = numerics.range_estimate_from_max(m)
    exp_in = a_exp.astype(jnp.int32) + b_exp.astype(jnp.int32)
    if _recompute_matmul_acc(acc.size, a.shape[1], b.shape[1]):
        a2, b2 = jax.lax.optimization_barrier((a, b))
        acc = matmul_int8_acc(a2, b2)
    return numerics.requant_forward_from_bw(acc, exp_in, bw)
