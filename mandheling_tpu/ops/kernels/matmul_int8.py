"""Pallas MXU kernel: int8 x int8 -> int32 tiled matmul.

TPU-native replacement for the reference's NEON int8 GEMM
(`compute/Int8FunctionsOpt.cpp:150-198`, asm
`arm/arm64/NITI_MNNGemmInt8AddBiasScale_16x4_Unit_FAST.S`) and the Hexagon
HVX supernode GEMM. The MXU consumes (sublane, lane)-tiled int8 operands;
K is the innermost grid dimension so each (i, j) output tile accumulates
across K steps in a VMEM int32 scratch without HBM round-trips.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _matmul_kernel(a_ref, b_ref, out_ref, acc_ref):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(
        a_ref[:],
        b_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        out_ref[:] = acc_ref[:]


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.partial(jax.jit, static_argnames=("interpret", "tile_m", "tile_n", "tile_k"))
def matmul_acc_pallas_padded(
    a: jax.Array,
    b: jax.Array,
    interpret: bool = False,
    tile_m: int = 256,
    tile_n: int = 256,
    tile_k: int = 256,
) -> jax.Array:
    """int8 (M, K) x (K, N) -> int32 (M, N); pads to MXU-friendly tiles."""
    m, k = a.shape
    k2, n = b.shape
    assert k == k2
    mp = _round_up(max(m, 1), tile_m)
    np_ = _round_up(max(n, 1), tile_n)
    kp = _round_up(max(k, 1), tile_k)
    a_p = jnp.pad(a, ((0, mp - m), (0, kp - k)))
    b_p = jnp.pad(b, ((0, kp - k), (0, np_ - n)))

    grid = (mp // tile_m, np_ // tile_n, kp // tile_k)
    out = pl.pallas_call(
        _matmul_kernel,
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (tile_m, tile_k),
                lambda i, j, kk: (i, kk),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (tile_k, tile_n),
                lambda i, j, kk: (kk, j),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (tile_m, tile_n),
            lambda i, j, kk: (i, j),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((tile_m, tile_n), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=mp * kp + kp * np_ + mp * np_ * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(a_p, b_p)
    return out[:m, :n]


def matmul_acc_pallas(
    a: jax.Array, b: jax.Array, interpret: bool = False
) -> Optional[jax.Array]:
    """Dispatch entry: returns None to fall back to XLA when unsupported or
    unprofitable (tile padding would inflate the dominant operand's HBM
    traffic — e.g. K=25 conv patches padded to 256 cost 10x the bytes, and
    XLA's own int8 dot handles skinny shapes without materialized padding)."""
    if a.ndim != 2 or b.ndim != 2:
        return None
    m, k = a.shape
    n = b.shape[1]
    if k < 128 or n < 64:
        return None
    tile_k = min(256, _round_up(k, 128))
    tile_n = min(256, _round_up(n, 128))
    if _round_up(k, tile_k) * m > 2 * k * m:  # padded A traffic > 2x true
        return None
    return matmul_acc_pallas_padded(
        a, b, interpret=interpret, tile_n=tile_n, tile_k=tile_k
    )
