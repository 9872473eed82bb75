"""Batch-on-lanes fused NITI int8 depthwise conv (two-phase, stride 1).

Third-generation depthwise kernel, designed from the r3 per-op profile:

- r2's kernel (fused_dwconv_int8.py) put channels on lanes with NHWC
  blocks: its (B, Hp, Wp, C) tiles padded Wp 34->64 sublanes and C up to
  the 128-lane multiple, its tap shifts were unaligned sublane slices, and
  it measured 4.2x slower than XLA.
- The XLA taps formulation (ops/depthwise._dw_acc_taps) wins in-context
  but materializes every tap slice (~4.3 GB/step of async slice traffic
  in the MNv2 b256 step).

This kernel uses the layout XLA itself prefers for these tensors
(the r3 trace shows s8[256,h,w,C] stored {0,3,2,1}, batch innermost):
logical (Hp, Wp, C, B) with B on lanes and C on sublanes — (32, 128)
int8 tiles with ZERO padding when C%32==0 and B%128==0, and every tap
(dy along blocked H, dx along major W) is a pure address offset: no
shuffles, no slice materialization, int32 accumulator never in HBM.

Grid: (C/32, OH/hblk). H-block overlap (kh-1 halo rows) is covered by a
second input ref mapped to the NEXT H block — static per-row selection
between the two refs replaces halo DMA. Phase 1 reduces per-grid-cell
max|acc| (global max + shift derived outside); phase 2 recomputes taps
and applies the bit-exact NITI psto epilogue in VMEM.

Numerics contract: identical to ops/numerics (requant_forward_from_bw
semantics with precomputed shift) — parity-tested in interpret mode and
against the XLA path (tests/test_pallas_kernels.py).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import numerics

CBLK = 32          # channel sublanes per grid step (int8 tile height)
_VMEM_BUDGET = 10 * 2**20


def _wchunk(ow: int) -> int:
    """Output columns per accumulator chunk: largest power of two <= 8
    dividing OW (bounds the int32 accumulator value size)."""
    for w in (8, 4, 2, 1):
        if ow % w == 0:
            return w
    return 1


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def plan_hblk(oh: int, wp: int, b: int, kh: int) -> int:
    """Largest output-row block (>= kh-1 for the two-ref halo) fitting the
    VMEM budget: 2 input refs + y block, double-buffered by Mosaic."""
    for hblk in (16, 8, 4, 2):
        per = 2 * 2 * (hblk * wp * CBLK * b)          # x refs, 2x buffered
        per += 2 * (hblk * (wp - kh + 1) * CBLK * b)  # y block
        per += 4 * 8 * CBLK * b * 4                   # acc temporaries
        if per <= _VMEM_BUDGET and oh % hblk == 0 and hblk >= kh - 1:
            return hblk
    return 0


def supports(hp: int, wp: int, c: int, b: int, kh: int, kw: int) -> bool:
    oh, ow = hp - kh + 1, wp - kw + 1
    return b % 128 == 0 and kh >= 2 and plan_hblk(oh, wp, b, kh) > 0


def _acc_rows(x0_ref, x1_ref, w_ref, body, *, kh, kw, oh_blk, ow):
    """For each output row r in the block and each WCHUNK of columns,
    compute the int32 tap-sum accumulator and hand it to `body(r, wc, acc)`.
    Rows r+dy land in x0 (this H block) or x1 (the next one) — a static
    choice per (r, dy)."""
    hblk = oh_blk
    wchunk = _wchunk(ow)
    for r in range(hblk):
        for wc in range(0, ow, wchunk):
            acc = None
            for dy in range(kh):
                src, row = (x0_ref, r + dy) if r + dy < hblk else (
                    x1_ref, r + dy - hblk)
                for dx in range(kw):
                    tap = src[row, wc + dx : wc + dx + wchunk].astype(
                        jnp.int32)
                    wv = w_ref[:, dy * kw + dx].astype(jnp.int32)[
                        None, :, None]
                    contrib = tap * wv
                    acc = contrib if acc is None else acc + contrib
            body(r, wc, acc)


def _max_kernel(x0_ref, x1_ref, w_ref, m_ref, *, kh, kw, oh_blk, ow):
    m = jnp.int32(0)
    parts = []

    def body(r, wc, acc):
        parts.append(jnp.max(jnp.abs(acc)))

    _acc_rows(x0_ref, x1_ref, w_ref, body, kh=kh, kw=kw, oh_blk=oh_blk,
              ow=ow)
    for p in parts:
        m = jnp.maximum(m, p)
    # SMEM outputs must be whole-array blocks; write this cell by grid id
    m_ref[pl.program_id(0) * pl.num_programs(1) + pl.program_id(1), 0] = m


def _requant_kernel(shift_ref, x0_ref, x1_ref, w_ref, y_ref, *, kh, kw,
                    oh_blk, ow, grad):
    shift = shift_ref[0]

    def body(r, wc, acc):
        if grad:
            out = numerics.psto_round(acc, shift).astype(jnp.int8)
        else:
            shifted = numerics.psto_round(acc, shift)
            plain = acc.astype(jnp.int8).astype(jnp.int32)
            out = jnp.where(shift > 0, shifted, plain).astype(jnp.int8)
        y_ref[r, wc : wc + out.shape[0]] = out

    _acc_rows(x0_ref, x1_ref, w_ref, body, kh=kh, kw=kw, oh_blk=oh_blk,
              ow=ow)


def _specs(hp, wp, c, b, kh, kw, hblk):
    nc = c // CBLK
    oh = hp - kh + 1
    nh = oh // hblk
    x_block = (hblk, wp, CBLK, b)
    x0 = pl.BlockSpec(x_block, lambda ci, hi: (hi, 0, ci, 0),
                      memory_space=pltpu.VMEM)
    x1 = pl.BlockSpec(x_block, lambda ci, hi: (hi + 1, 0, ci, 0),
                      memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec((CBLK, kh * kw), lambda ci, hi: (ci, 0),
                         memory_space=pltpu.VMEM)
    return (nc, nh), [x0, x1, wspec]


def _pad_cb(xt: jax.Array, w2: jax.Array):
    """Pad C to a CBLK multiple on both operands (zero taps contribute 0)."""
    c = xt.shape[2]
    cp = _round_up(c, CBLK)
    if cp != c:
        xt = jnp.pad(xt, ((0, 0), (0, 0), (0, cp - c), (0, 0)))
        w2 = jnp.pad(w2, ((0, cp - c), (0, 0)))
    return xt, w2, c


@functools.partial(jax.jit, static_argnames=("kernel", "interpret"))
def dwconv_max_blanes(
    xt: jax.Array,
    w2: jax.Array,
    kernel: Tuple[int, int],
    interpret: bool = False,
) -> jax.Array:
    """Phase 1: global max|acc| of the VALID stride-1 depthwise conv.
    xt: (Hp, Wp, C, B) pre-padded input (B on lanes); w2: (C, kh*kw)."""
    kh, kw = kernel
    xt, w2, _ = _pad_cb(xt, w2)
    hp, wp, c, b = xt.shape
    oh, ow = hp - kh + 1, wp - kw + 1
    hblk = plan_hblk(oh, wp, b, kh)
    grid, in_specs = _specs(hp, wp, c, b, kh, kw, hblk)
    m = pl.pallas_call(
        functools.partial(_max_kernel, kh=kh, kw=kw, oh_blk=hblk, ow=ow),
        out_shape=jax.ShapeDtypeStruct((grid[0] * grid[1], 1), jnp.int32),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((grid[0] * grid[1], 1), lambda ci, hi: (0, 0),
                               memory_space=pltpu.SMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(xt, xt, w2)
    return jnp.max(m)


@functools.partial(jax.jit, static_argnames=("kernel", "grad", "interpret"))
def dwconv_requant_blanes(
    xt: jax.Array,
    w2: jax.Array,
    shift: jax.Array,
    kernel: Tuple[int, int],
    grad: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """Phase 2: recompute + NITI requant -> int8 (OH, OW, C, B)."""
    kh, kw = kernel
    xt, w2, c_orig = _pad_cb(xt, w2)
    hp, wp, c, b = xt.shape
    oh, ow = hp - kh + 1, wp - kw + 1
    hblk = plan_hblk(oh, wp, b, kh)
    grid, in_specs = _specs(hp, wp, c, b, kh, kw, hblk)
    y = pl.pallas_call(
        functools.partial(_requant_kernel, kh=kh, kw=kw, oh_blk=hblk,
                          ow=ow, grad=grad),
        out_shape=jax.ShapeDtypeStruct((oh, ow, c, b), jnp.int8),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + in_specs,
        out_specs=pl.BlockSpec((hblk, ow, CBLK, b),
                               lambda ci, hi: (hi, 0, ci, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(shift.reshape(1).astype(jnp.int32), xt, xt, w2)
    return y[:, :, :c_orig, :]
