"""Fused NITI int8 matmul: two-phase Pallas kernels with in-kernel
range-estimate / pseudo-stochastic requant — the int32 accumulator never
touches HBM.

This is the 1x1-conv / fully-connected counterpart of the banded fused conv
(ops/kernels/fused_conv_int8.py). A 1x1 stride-1 conv *is* a matmul
((B*H*W, ic) @ (ic, oc)) and dominates the MobileNet/ResNet dense hot path;
folding the NITI requant into it has no structural-zero waste, unlike the
banded form. The reference computes the same fusion on-DSP: the modified
supernode emits the requant shift from inside the conv for every conv
(`niti_op_supernode_new.c:6086-6094`), and its registered im2col+matmul
gradient strategy lowers to `QuantizedMatMul_8x8to32` + requantize
(`NITI_DSPMatmulGradientConv_Int8.cpp`).

- phase 1 (`max`): tiled (M, N, K) int8 GEMM accumulating in VMEM scratch;
  per-tile max|acc| folded into a global SMEM scalar on the last K step.
- scalar glue (host graph): bw/shift per ops/numerics.py, optionally
  cross-replica pmax'd for data parallelism.
- phase 2 (`requant`): recompute tiles, apply the bit-exact psto epilogue
  in lane chunks, write int8 only.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import numerics

_EPI_CHUNK = 128


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _acc_step(a_ref, b_ref, acc_ref):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(
        a_ref[:], b_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )


def _max_kernel(a_ref, b_ref, m_ref, acc_ref):
    # per-(i, j) tile max written to its own cell of one full-array SMEM
    # output block (Mosaic rejects sub-blocked scalar outputs: block dims
    # must be (8, 128)-divisible or equal the array dims). Each tile owns a
    # distinct cell, so there is no read-modify-write serialization; the
    # tiny (ni, nj) maxima reduce outside the kernel.
    _acc_step(a_ref, b_ref, acc_ref)
    last_k = pl.program_id(2) == pl.num_programs(2) - 1
    i, j = pl.program_id(0), pl.program_id(1)  # hoisted: program_id inside
    # the pl.when body escapes the kernel trace in interpret mode

    @pl.when(last_k)
    def _():
        m_ref[i, j] = jnp.max(jnp.abs(acc_ref[:]))


def _requant_kernel(shift_ref, a_ref, b_ref, y_ref, acc_ref, *, bn, grad):
    _acc_step(a_ref, b_ref, acc_ref)
    last_k = pl.program_id(2) == pl.num_programs(2) - 1

    @pl.when(last_k)
    def _():
        shift = shift_ref[0]
        for c0 in range(0, bn, _EPI_CHUNK):
            c1 = min(c0 + _EPI_CHUNK, bn)
            acc = acc_ref[:, c0:c1]
            if grad:
                out = numerics.psto_round(acc, shift).astype(jnp.int8)
            else:
                shifted = numerics.psto_round(acc, shift)
                plain = acc.astype(jnp.int8).astype(jnp.int32)
                out = jnp.where(shift > 0, shifted, plain).astype(jnp.int8)
            y_ref[:, c0:c1] = out


def _tiles(m: int, k: int, n: int) -> Tuple[int, int, int]:
    tm = min(512, _round_up(m, 128))
    tn = min(512, _round_up(n, 128))
    tk = min(2048, _round_up(k, 128))
    return tm, tn, tk


# ---- small-K/N path: full-K full-N blocks, grid over M only -------------
#
# Block dims equal to the array dims are always legal, so K and N need no
# HBM padding (Mosaic lane-pads inside VMEM for free), there is no output
# slice-copy, and B stays VMEM-resident across the whole grid. This is the
# shape class of MobileNet pointwise convs (K=24..576, N=24..576, M=b*h*w).


def _small_tm(m: int, k: int, n: int) -> int:
    """Large M tiles: grid-step overhead dominates these small-K/N shapes
    (measured 0.78 ms at tm=512 / 512 steps for (262144, 24, 144)), so take
    the biggest tile the VMEM budget allows."""
    kpad, npad = _round_up(k, 128), _round_up(n, 128)
    per_row = kpad + 5 * npad * 4 + npad  # a + acc/temps (int32) + y
    tm = min(max((6 * 2**20) // per_row, 8), m, 8192)
    tm -= tm % 8
    while m % tm:
        tm -= 8
    return tm


def _small_max_kernel(a_ref, b_ref, m_ref, acc_ref):
    acc_ref[:] = jax.lax.dot_general(
        a_ref[:], b_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    m_ref[pl.program_id(0), 0] = jnp.max(jnp.abs(acc_ref[:]))


def _small_requant_kernel(shift_ref, a_ref, b_ref, y_ref, acc_ref, *, n,
                          grad):
    acc_ref[:] = jax.lax.dot_general(
        a_ref[:], b_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    shift = shift_ref[0]
    for c0 in range(0, n, _EPI_CHUNK):
        c1 = min(c0 + _EPI_CHUNK, n)
        acc = acc_ref[:, c0:c1]
        if grad:
            out = numerics.psto_round(acc, shift).astype(jnp.int8)
        else:
            shifted = numerics.psto_round(acc, shift)
            plain = acc.astype(jnp.int8).astype(jnp.int32)
            out = jnp.where(shift > 0, shifted, plain).astype(jnp.int8)
        y_ref[:, c0:c1] = out


def _small_specs(m, k, n):
    tm = _small_tm(m, k, n)
    in_specs = [
        pl.BlockSpec((tm, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((k, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    scratch = [pltpu.VMEM((tm, n), jnp.int32)]
    return tm, in_specs, scratch


def _small_max(a, b, interpret):
    m, k = a.shape
    n = b.shape[1]
    tm, in_specs, scratch = _small_specs(m, k, n)
    out = pl.pallas_call(
        _small_max_kernel,
        out_shape=jax.ShapeDtypeStruct((m // tm, 1), jnp.int32),
        grid=(m // tm,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((m // tm, 1), lambda i: (0, 0),
                               memory_space=pltpu.SMEM),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(a, b)
    return jnp.max(out)


def _small_requant(a, b, shift, grad, interpret):
    m, k = a.shape
    n = b.shape[1]
    tm, in_specs, scratch = _small_specs(m, k, n)
    return pl.pallas_call(
        functools.partial(_small_requant_kernel, n=n, grad=grad),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.int8),
        grid=(m // tm,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + in_specs,
        out_specs=pl.BlockSpec((tm, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(shift.reshape(1).astype(jnp.int32), a, b)


_SMALL_KN = 512
_MIN_ACC_BYTES = 2 * 2**20


def supports(m: int, k: int, n: int) -> bool:
    """Eligibility from hoist-proof TPU v5e measurements (dep-threaded
    device loops; the earlier floors here were set from loop-invariant
    timings that XLA LICM had hoisted — see fused_decision_probe.dev_time).

    Only the UNPADDED small-K/N path wins: full-K/full-N blocks, grid over
    M only, no HBM padding of A/B and no output slice-copy. The padded
    tiled path loses everywhere it was measured ((262144, 24, 144): padded
    0.79 ms vs XLA 0.47 ms — the K 24->128 HBM pad write plus the y
    slice-copy exceed the avoided accumulator traffic; (2048, 832, 500):
    padded 0.023 ms vs XLA 0.018 ms). The win scales with the avoided
    3-pass int32 accumulator, so small outputs (< ~2 MB acc) stay on XLA
    where two extra kernel launches cost more than they save."""
    return (
        k <= _SMALL_KN
        and n <= _SMALL_KN
        and m % 8 == 0
        and m >= 1024
        and 4 * m * n >= _MIN_ACC_BYTES
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def matmul_max_pallas(
    a: jax.Array, b: jax.Array, interpret: bool = False
) -> jax.Array:
    """Phase 1: global max|a @ b| as an int32 scalar; acc stays in VMEM."""
    m, k = a.shape
    k2, n = b.shape
    assert k == k2
    if k <= _SMALL_KN and n <= _SMALL_KN and m % 8 == 0:
        return _small_max(a, b, interpret)
    tm, tn, tk = _tiles(m, k, n)
    mp, np_, kp = _round_up(m, tm), _round_up(n, tn), _round_up(k, tk)
    a_p = jnp.pad(a, ((0, mp - m), (0, kp - k)))
    b_p = jnp.pad(b, ((0, kp - k), (0, np_ - n)))
    out = pl.pallas_call(
        _max_kernel,
        out_shape=jax.ShapeDtypeStruct((mp // tm, np_ // tn), jnp.int32),
        grid=(mp // tm, np_ // tn, kp // tk),
        in_specs=[
            pl.BlockSpec((tm, tk), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tk, tn), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((mp // tm, np_ // tn), lambda i, j, kk: (0, 0),
                               memory_space=pltpu.SMEM),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            # all grid steps write into the one resident SMEM output block,
            # so the dims must be sequential ("arbitrary"); input-block DMA
            # pipelining across steps is unaffected
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=mp * kp + kp * np_ + 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(a_p, b_p)
    return jnp.max(out)


@functools.partial(jax.jit, static_argnames=("grad", "interpret"))
def matmul_requant_pallas(
    a: jax.Array,
    b: jax.Array,
    shift: jax.Array,
    grad: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """Phase 2: recompute a @ b and requantize in-kernel -> int8 (M, N)."""
    m, k = a.shape
    k2, n = b.shape
    assert k == k2
    if k <= _SMALL_KN and n <= _SMALL_KN and m % 8 == 0:
        return _small_requant(a, b, shift, grad, interpret)
    tm, tn, tk = _tiles(m, k, n)
    mp, np_, kp = _round_up(m, tm), _round_up(n, tn), _round_up(k, tk)
    a_p = jnp.pad(a, ((0, mp - m), (0, kp - k)))
    b_p = jnp.pad(b, ((0, kp - k), (0, np_ - n)))
    y = pl.pallas_call(
        functools.partial(_requant_kernel, bn=tn, grad=grad),
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.int8),
        grid=(mp // tm, np_ // tn, kp // tk),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tm, tk), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tk, tn), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=mp * kp + kp * np_ + mp * np_,
            transcendentals=0,
        ),
        interpret=interpret,
    )(shift.reshape(1).astype(jnp.int32), a_p, b_p)
    return y[:m, :n]
