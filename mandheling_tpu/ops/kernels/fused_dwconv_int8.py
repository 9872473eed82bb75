"""Fused NITI int8 depthwise conv: two-phase Pallas VPU kernels.

Depthwise conv has no channel contraction — it is 9 (kh*kw) shifted
elementwise multiply-adds, pure VPU work — but the NITI requant needs the
global max|acc| first, so the XLA lowering materializes the int32
accumulator (4x the int8 data) and reads it twice more: measured on TPU
v5e, the 3x3 depthwise over (256, 32, 32, 144) costs 0.57 ms forward,
0.55 ms input-grad, 0.37 ms filter-grad — all pure HBM traffic on a
151 MB accumulator (tools/probes/mnv2_shape_probe.py). These kernels keep
the accumulator in VMEM: read the int8 input once per phase, do the tap
shifts as static VMEM slices, and write int8 only.

- forward/input-grad: phase 1 computes per-batch-tile max|acc| into SMEM
  cells; phase 2 recomputes and applies the bit-exact psto epilogue.
  Input gradients reuse the forward kernel on the zero-dilated output-diff
  with rot180 weights (the reference's LeftPoolGrad chain,
  grad/NITI_Conv_Int8_Grad.cpp:92-123).
- filter-grad: single pass producing per-tile (kh*kw, C) int32 partial
  sums; the tiny cross-tile reduction and the bw-2 requant run in XLA.
  int32 addition wraps associatively, so any summation order is
  bit-identical to the reference's accumulation.

The DSP analog is the modified supernode computing the requant shift
on-accelerator (niti_op_supernode_new.c:4630-6094); depthwise itself is
absent from the reference's NITI op set (its MobileNet demos are fp32), so
the numerics contract here follows the dense NITI conv rules.

MEASURED RESULT (TPU v5e, hoist-proof dep-threaded loops): these kernels
are bit-identical to the XLA path but LOSE on time — fwd/igrad 2.42 ms vs
XLA 0.57/0.53 ms at (256, 32, 32, 144); the serial 9-tap int32 VPU loop
with lane padding (144 -> 256) costs more than the 3-pass accumulator
traffic it avoids, and XLA's grouped conv + fused consumers are strong.
They remain the Pallas-backend implementation (opt-in, parity-tested);
the measured default backend is "xla".
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import numerics

_EPI_ROWS = 8           # epilogue chunk along the OH axis
# Mosaic double-buffers the x/y blocks on top of the scoped scratch, and
# the scoped-vmem stack limit is 16 MB: a 10 MB budget OOM'd at
# (256, 34, 34, 96) (16.6 MB allocated), 6 MB leaves pipelining headroom.
_VMEM_BUDGET = 6 * 2**20


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _plan_bt(b: int, hp: int, wp: int, oh: int, ow: int, c: int) -> int:
    """Largest batch tile whose padded VMEM working set fits the budget."""
    cpad = _round_up(c, 128)
    per_batch = (
        hp * wp * cpad            # x block (int8, lane-padded)
        + oh * ow * cpad * 4      # acc scratch (int32)
        + ow * cpad               # y block (int8)
    )
    per_batch += 4 * _EPI_ROWS * ow * cpad * 4  # epilogue temps
    bt = max(min(_VMEM_BUDGET // max(per_batch, 1), b), 1)
    while b % bt:
        bt -= 1
    return bt


def supports(b: int, hp: int, wp: int, oh: int, ow: int, c: int) -> bool:
    """A single batch image must fit the VMEM budget."""
    cpad = _round_up(c, 128)
    return (hp * wp + 5 * oh * ow * 4 + ow) * cpad <= _VMEM_BUDGET


def _acc_tile(x_ref, w_ref, *, kh, kw, oh, ow):
    acc = None
    for dy in range(kh):
        for dx in range(kw):
            tap = x_ref[:, dy : dy + oh, dx : dx + ow, :].astype(jnp.int32)
            contrib = tap * w_ref[dy * kw + dx, :].astype(jnp.int32)[
                None, None, None, :
            ]
            acc = contrib if acc is None else acc + contrib
    return acc


def _max_kernel(x_ref, w_ref, m_ref, acc_ref, *, kh, kw, oh, ow):
    acc_ref[:] = _acc_tile(x_ref, w_ref, kh=kh, kw=kw, oh=oh, ow=ow)
    m_ref[pl.program_id(0), 0] = jnp.max(jnp.abs(acc_ref[:]))


def _requant_kernel(shift_ref, x_ref, w_ref, y_ref, acc_ref, *, kh, kw, oh,
                    ow, grad):
    acc_ref[:] = _acc_tile(x_ref, w_ref, kh=kh, kw=kw, oh=oh, ow=ow)
    shift = shift_ref[0]
    for h0 in range(0, oh, _EPI_ROWS):
        h1 = min(h0 + _EPI_ROWS, oh)
        acc = acc_ref[:, h0:h1]
        if grad:
            out = numerics.psto_round(acc, shift).astype(jnp.int8)
        else:
            shifted = numerics.psto_round(acc, shift)
            plain = acc.astype(jnp.int8).astype(jnp.int32)
            out = jnp.where(shift > 0, shifted, plain).astype(jnp.int8)
        y_ref[:, h0:h1] = out


def _fgrad_kernel(x_ref, g_ref, p_ref, *, kh, kw, oh, ow):
    for dy in range(kh):
        for dx in range(kw):
            tap = x_ref[:, dy : dy + oh, dx : dx + ow, :].astype(jnp.int32)
            p_ref[0, dy * kw + dx, :] = jnp.sum(
                tap * g_ref[:].astype(jnp.int32), axis=(0, 1, 2)
            )


def _specs(b, hp, wp, oh, ow, c, kh, kw):
    bt = _plan_bt(b, hp, wp, oh, ow, c)
    grid = (b // bt,)
    in_specs = [
        pl.BlockSpec((bt, hp, wp, c), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((kh * kw, c), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    scratch = [pltpu.VMEM((bt, oh, ow, c), jnp.int32)]
    return bt, grid, in_specs, scratch


@functools.partial(jax.jit, static_argnames=("kernel", "interpret"))
def dwconv_max_pallas(
    xp: jax.Array,
    w: jax.Array,
    kernel: Tuple[int, int],
    interpret: bool = False,
) -> jax.Array:
    """Phase 1: global max|acc| of the VALID stride-1 depthwise conv over
    pre-padded input `xp` (B, Hp, Wp, C); w is (kh, kw, 1, C)."""
    kh, kw = kernel
    b, hp, wp, c = xp.shape
    oh, ow = hp - kh + 1, wp - kw + 1
    w2 = w.reshape(kh * kw, c)
    bt, grid, in_specs, scratch = _specs(b, hp, wp, oh, ow, c, kh, kw)
    m = pl.pallas_call(
        functools.partial(_max_kernel, kh=kh, kw=kw, oh=oh, ow=ow),
        out_shape=jax.ShapeDtypeStruct((b // bt, 1), jnp.int32),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((b // bt, 1), lambda i: (0, 0),
                               memory_space=pltpu.SMEM),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(xp, w2)
    return jnp.max(m)


@functools.partial(
    jax.jit, static_argnames=("kernel", "grad", "interpret")
)
def dwconv_requant_pallas(
    xp: jax.Array,
    w: jax.Array,
    shift: jax.Array,
    kernel: Tuple[int, int],
    grad: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """Phase 2: recompute and requantize in-kernel -> int8 (B, OH, OW, C)."""
    kh, kw = kernel
    b, hp, wp, c = xp.shape
    oh, ow = hp - kh + 1, wp - kw + 1
    w2 = w.reshape(kh * kw, c)
    bt, grid, in_specs, scratch = _specs(b, hp, wp, oh, ow, c, kh, kw)
    return pl.pallas_call(
        functools.partial(_requant_kernel, kh=kh, kw=kw, oh=oh, ow=ow,
                          grad=grad),
        out_shape=jax.ShapeDtypeStruct((b, oh, ow, c), jnp.int8),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + in_specs,
        out_specs=pl.BlockSpec((bt, oh, ow, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(shift.reshape(1).astype(jnp.int32), xp, w2)


@functools.partial(jax.jit, static_argnames=("kernel", "stride", "interpret"))
def dwconv_fgrad_acc_pallas(
    xp: jax.Array,
    gy: jax.Array,
    kernel: Tuple[int, int],
    stride: Tuple[int, int] = (1, 1),
    interpret: bool = False,
) -> Optional[jax.Array]:
    """int32 filter-grad accumulator (kh, kw, 1, C) in ONE pass over the
    pre-padded input + output-diff (stride 1 only)."""
    kh, kw = kernel
    if tuple(stride) != (1, 1):
        return None
    b, hp, wp, c = xp.shape
    oh, ow = gy.shape[1], gy.shape[2]
    if (oh, ow) != (hp - kh + 1, wp - kw + 1):
        return None
    cpad = _round_up(c, 128)
    per_batch = (hp * wp + 3 * oh * ow * 4 + ow) * cpad
    bt = max(min(_VMEM_BUDGET // max(per_batch, 1), b), 1)
    while b % bt:
        bt -= 1
    if (hp * wp + 3 * oh * ow * 4) * cpad > _VMEM_BUDGET:
        return None
    grid = (b // bt,)
    partials = pl.pallas_call(
        functools.partial(_fgrad_kernel, kh=kh, kw=kw, oh=oh, ow=ow),
        out_shape=jax.ShapeDtypeStruct((b // bt, kh * kw, c), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt, hp, wp, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, oh, ow, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, kh * kw, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(xp, gy)
    return jnp.sum(partials, axis=0).reshape(kh, kw, 1, c)
