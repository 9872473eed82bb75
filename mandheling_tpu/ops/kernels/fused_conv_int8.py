"""Fused NITI int8 conv: Pallas kernels that never materialize the int32
accumulator in HBM.

The NITI requantization needs the *global* max|acc| before any element can
be shifted (`NITI_Conv_Int8.cpp:255-307`), so a straightforward lowering
materializes the int32 accumulator and reads it twice (one pass for the
range estimate, one for the pseudo-stochastic shift) — 3 HBM passes of a
tensor 4x larger than the int8 output. Measured on TPU, that traffic
dominates the whole training step (tools/probes/fusion_probe.py: XLA does
not fuse the reduction into the conv, and recompute-via-
optimization_barrier is slower because the conv output is materialized
regardless).

These kernels do what the hardware wants instead. The conv is decomposed as
ONE K-packed *banded matmul*: each kernel row dy folds its (kw, oc) taps
into a band matrix B_dy of shape (W_in*ic, OW*oc) with
B_dy[(owi*sw + dx)*ic + c, owi*oc + o] = w[dy, dx, c, o] (zero elsewhere),
and the kh bands are concatenated along the contraction dim — so
acc[(b,oh), (owi,o)] = slabs @ B where slabs row (b,oh) concatenates the kh
dy-shifted row-slabs x_padded[:, dy : dy+(oh-1)*sh+1 : sh, :, :] flattened
to (B*OH, kh*W_in*ic). One large-K MXU dot per tile (K = kh*W_in*ic)
amortizes the 128-lane contraction padding that kh separate K = W_in*ic
dots would each pay. The slabs are materialized by XLA (kh small int8
copies) so the kernels see plain 2D blocks — no in-kernel gather/relayout,
every matmul lands on the MXU. Arbitrary forward stride (sh, sw) is carried
by the slab row-stride and the band column placement; strided *input
gradients* (lhs dilation) are handled by the caller zero-dilating the int8
output-diff first (the reference's `_NITI_LeftPoolGrad` chain,
grad/NITI_Conv_Int8_Grad.cpp:92-123) and running the stride-1 kernel.

- phase 1 (`max` pass): per-tile banded matmuls into a VMEM scratch
  accumulator, global max|acc| accumulated across grid steps in SMEM.
  Nothing int32 leaves the chip.
- scalar glue (host graph): bw = ceil(log2 max), shift/exponent per the
  NITI rules (ops/numerics.py) — optionally cross-replica pmax'd between
  the phases for data parallelism.
- phase 2 (`requant` pass): recompute the same tiles (MXU flops are free at
  these arithmetic intensities), apply the bit-exact pseudo-stochastic
  shift epilogue in-kernel (in lane chunks to bound temporaries), write
  int8 only.

Large models tile the output-column dimension: the grid is (nj, ni) with
the column-block index outermost, so each band block stays resident in VMEM
while the row slabs stream past it. The banded form wastes W_in/kw of the
MXU flops on structural zeros — irrelevant at these arithmetic intensities
for the small-W shapes it is selected for; `supports()` gates eligibility
by band VMEM footprint, and 1x1 convs go through the fused *matmul* kernels
(ops/kernels/fused_matmul_int8.py) instead, which have no structural waste.

The DSP analog is the modified Supernode that computes the requant shift
on-DSP inside the conv for every conv shape, strided included
(`niti_op_supernode_new.c:4630-6094`); this is the same fusion, TPU-style.
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
_BAND_BUDGET = 4 * 2**20
_STACK_BUDGET = 9 * 2**20


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _build_bands(w: jax.Array, wp: int, ow: int, sw: int) -> jax.Array:
    """(kh, kw, ic, oc) int8 -> (kh*wp*ic, Np) K-packed banded matrix (Np
    padded to a lane multiple). The kh per-tap bands are concatenated along
    the contraction dim so the kernel issues ONE large-K MXU dot per tile
    instead of kh skinny-K dots (K = wp*ic is far below the 128-lane MXU
    contraction for the narrow-input shapes this kernel targets; packing
    amortizes the lane padding across taps). Built once per step outside
    the kernel (tiny)."""
    kh, kw, ic, oc = w.shape
    np_ = _round_up(ow * oc, 128)
    bands = []
    owi = jnp.arange(ow)
    for dy in range(kh):
        band = jnp.zeros((wp, ic, ow, oc), jnp.int8)
        for dx in range(kw):
            band = band.at[owi * sw + dx, :, owi, :].set(w[dy, dx][None])
        band = band.reshape(wp * ic, ow * oc)
        bands.append(jnp.pad(band, ((0, 0), (0, np_ - ow * oc))))
    return jnp.concatenate(bands, axis=0)


def _build_slabs(
    xp: jax.Array, kh: int, oh: int, sh: int, rows_p: int
) -> jax.Array:
    """Padded NHWC x -> (rows_p, kh*W_in*ic) int8 K-packed row-slabs (row
    stride sh carries the forward H-stride; rows zero-padded from B*OH up
    to rows_p for (8, 128) tile legality — zero rows cannot raise the
    |acc| max and their outputs are sliced off). Column band dy holds the
    dy-shifted row-slab, matching `_build_bands`' K packing."""
    b, hp, wp, ic = xp.shape
    slabs = jnp.stack(
        [
            xp[:, dy : dy + (oh - 1) * sh + 1 : sh].reshape(b * oh, wp * ic)
            for dy in range(kh)
        ],
        axis=1,
    ).reshape(b * oh, kh * wp * ic)
    return jnp.pad(slabs, ((0, rows_p - b * oh), (0, 0)))


def _acc_into(acc_ref, s_refs, b_ref):
    acc_ref[:] = jax.lax.dot_general(
        s_refs[:], b_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )


def _max_kernel(s_refs, b_ref, m_ref, acc_ref):
    # per-(j, i) tile max into its own cell of one full-array SMEM output
    # block (Mosaic rejects sub-blocked scalar outputs: block dims must be
    # (8, 128)-divisible or equal the array dims). Each tile owns a
    # distinct cell — no read-modify-write; the tiny (nj, ni) maxima
    # reduce outside the kernel.
    _acc_into(acc_ref, s_refs, b_ref)
    m_ref[pl.program_id(0), pl.program_id(1)] = jnp.max(jnp.abs(acc_ref[:]))


def _fwd_epilogue(acc, shift):
    """Forward requant: psto shift, or plain wrap-cast when shift <= 0
    (requant_forward_from_bw semantics)."""
    shifted = numerics.psto_round(acc, shift)
    plain = acc.astype(jnp.int8).astype(jnp.int32)
    return jnp.where(shift > 0, shifted, plain).astype(jnp.int8)


def _requant_kernel(shift_ref, s_refs, b_ref, y_ref, acc_ref, *, bn, grad):
    _acc_into(acc_ref, s_refs, b_ref)
    shift = shift_ref[0]
    # chunked epilogue: bounds the live int32 temporaries of the psto bit
    # math to (rows, _EPI_CHUNK) each
    for c0 in range(0, bn, _EPI_CHUNK):
        c1 = min(c0 + _EPI_CHUNK, bn)
        acc = acc_ref[:, c0:c1]
        if grad:
            out = numerics.psto_round(acc, shift).astype(jnp.int8)
        else:
            out = _fwd_epilogue(acc, shift)
        y_ref[:, c0:c1] = out


def _plan_n(np_: int, kh: int, kp: int, budget: int = _BAND_BUDGET) -> int:
    """Largest column block (multiple of 128, dividing np_) whose band
    slice fits the band VMEM budget."""
    q = np_ // 128
    for d in range(q, 0, -1):
        if q % d == 0 and kh * kp * 128 * d <= budget:
            return 128 * d
    return 128


def _plan_rows(rows_p: int, kh: int, kp: int, bn: int,
               budget: int = _STACK_BUDGET) -> int:
    """Largest row tile whose VMEM working set (band block excluded — it is
    budgeted separately in _plan_n) fits the scoped-vmem stack budget.
    `rows_p` is a multiple of 8 and the returned tile is a multiple of 8
    dividing it (Mosaic block legality: sublane dim 8-divisible)."""
    budget = budget - kh * kp * bn  # resident band block
    per_row = (
        kh * kp              # slab blocks (int8)
        + 2 * bn * 4         # scratch acc + dot temp (int32)
        + 8 * _EPI_CHUNK * 4  # epilogue temps (int32, chunked)
        + bn                 # out block (int8)
    )
    r = min(max(budget // max(per_row, 1), 8), rows_p)
    r -= r % 8
    while rows_p % r:
        r -= 8
    return r


def supports(w_shape, padded_width: int, stride,
             band_budget: int = _BAND_BUDGET) -> bool:
    """Eligibility: the narrowest column block of the band matrices must fit
    the band VMEM budget. `padded_width` is the input width incl. the
    conv's padding. Any forward stride is supported (strided input
    *gradients* must be pre-dilated to stride-1 by the caller)."""
    kh, kw, ic, oc = w_shape
    sw = stride[1]
    ow = (padded_width - kw) // sw + 1
    if ow < 1:
        return False
    bn = min(_round_up(ow * oc, 128), 512)
    return kh * padded_width * ic * bn <= band_budget


def _prep(x, w, padding, stride):
    kh, kw, ic, oc = w.shape
    sh, sw = stride
    xp = jnp.pad(x, ((0, 0), padding[0], padding[1], (0, 0)))
    b, hp, wp, _ = xp.shape
    oh, ow = (hp - kh) // sh + 1, (wp - kw) // sw + 1
    kp = wp * ic
    np_ = _round_up(ow * oc, 128)
    bn = _plan_n(np_, kh, kp)
    bands = _build_bands(w, wp, ow, sw)
    rows = b * oh
    rows_p = _round_up(rows, 8)
    slabs = _build_slabs(xp, kh, oh, sh, rows_p)
    r = _plan_rows(rows_p, kh, kp, bn)
    return slabs, bands, (b, oh, ow, oc, kh, kp, np_, bn, rows, rows_p, r)


def _grid_specs(kh, kp, np_, bn, r):
    """(in_specs, scratch) shared by both phases: column blocks outermost
    so each K-packed band block stays VMEM-resident while slabs stream."""
    kk = kh * kp
    in_specs = [
        pl.BlockSpec((r, kk), lambda j, i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((kk, bn), lambda j, i: (0, j),
                     memory_space=pltpu.VMEM),
    ]
    scratch = [pltpu.VMEM((r, bn), jnp.int32)]
    return in_specs, scratch


@functools.partial(
    jax.jit, static_argnames=("kernel", "padding", "stride", "interpret")
)
def conv_max_pallas(
    x: jax.Array,
    w: jax.Array,
    kernel: Tuple[int, int],
    padding: Tuple[Tuple[int, int], Tuple[int, int]],
    stride: Tuple[int, int] = (1, 1),
    interpret: bool = False,
) -> jax.Array:
    """Phase 1: global max|acc| of the int8 conv, int32 scalar.
    No accumulator leaves VMEM."""
    slabs, bands, (b, oh, ow, oc, kh, kp, np_, bn, rows, rows_p, r) = _prep(
        x, w, padding, stride
    )
    in_specs, scratch = _grid_specs(kh, kp, np_, bn, r)
    m = pl.pallas_call(
        _max_kernel,
        out_shape=jax.ShapeDtypeStruct((np_ // bn, rows_p // r), jnp.int32),
        grid=(np_ // bn, rows_p // r),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((np_ // bn, rows_p // r), lambda j, i: (0, 0),
                               memory_space=pltpu.SMEM),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            # every grid step writes into the one resident SMEM output
            # block -> sequential dims; input DMA pipelining is unaffected
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(slabs, bands)
    return jnp.max(m)


@functools.partial(
    jax.jit,
    static_argnames=("kernel", "padding", "stride", "grad", "interpret"),
)
def conv_requant_pallas(
    x: jax.Array,
    w: jax.Array,
    shift: jax.Array,
    kernel: Tuple[int, int],
    padding: Tuple[Tuple[int, int], Tuple[int, int]],
    stride: Tuple[int, int] = (1, 1),
    grad: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """Phase 2: recompute the conv and requantize in-kernel -> int8 NHWC."""
    slabs, bands, (b, oh, ow, oc, kh, kp, np_, bn, rows, rows_p, r) = _prep(
        x, w, padding, stride
    )
    in_specs, scratch = _grid_specs(kh, kp, np_, bn, r)
    y = pl.pallas_call(
        functools.partial(_requant_kernel, bn=bn, grad=grad),
        out_shape=jax.ShapeDtypeStruct((rows_p, ow * oc), jnp.int8),
        grid=(np_ // bn, rows_p // r),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + in_specs,
        out_specs=pl.BlockSpec((r, bn), lambda j, i: (i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(shift.reshape(1).astype(jnp.int32), slabs, bands)
    # row-major (b*oh, ow*oc) == (b, oh, ow, oc): free bitcast reshape
    return y[:rows].reshape(b, oh, ow, oc)
