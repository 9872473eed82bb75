"""Fused NITI int8 conv: Pallas kernels that never materialize the int32
accumulator in HBM.

The NITI requantization needs the *global* max|acc| before any element can
be shifted (`NITI_Conv_Int8.cpp:255-307`), so a straightforward lowering
materializes the int32 accumulator and reads it twice (one pass for the
range estimate, one for the pseudo-stochastic shift) — 3 HBM passes of a
tensor 4x larger than the int8 output. Measured on TPU, that traffic
dominates the whole training step (tools/fusion_probe.py: XLA does not fuse
the reduction into the conv, and recompute-via-optimization_barrier is
slower because the conv output is materialized regardless).

These kernels do what the hardware wants instead. The conv is decomposed as
kh *banded matmuls*: the (kw, oc) kernel taps fold into a per-kernel-row
band matrix B_dy of shape (W_in*ic, OW*oc) with
B_dy[wi*ic + c, owi*oc + o] = w[dy, wi-owi, c, o] (zero outside the band),
so acc[(b,oh), (owi,o)] = sum_dy slab_dy @ B_dy, where slab_dy is the dense
row-slab x_padded[:, dy:dy+oh, :, :] flattened to (B*OH, W_in*ic). The
slabs are materialized by XLA (cheap: kh small int8 copies) so the kernels
see plain 2D blocks — no in-kernel gather/relayout, every matmul lands on
the MXU.

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

The banded form wastes W_in/kw of the MXU flops on structural zeros —
irrelevant at these intensities. Band VMEM footprint gates eligibility
(`supports`); strided/dilated convs fall back to the unfused path.

The DSP analog is the modified Supernode that computes the requant shift
on-DSP inside the conv (`niti_op_supernode_new.c:6086-6094`); this is the
same fusion, TPU-style.
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


def _build_bands(w: jax.Array, wp: int, ow: int) -> jax.Array:
    """(kh, kw, ic, oc) int8 -> (kh, wp*ic, Np) banded matrices (Np padded
    to a lane multiple). Built once per step outside the kernel (tiny)."""
    kh, kw, ic, oc = w.shape
    np_ = _round_up(ow * oc, 128)
    bands = []
    owi = jnp.arange(ow)
    for dy in range(kh):
        band = jnp.zeros((wp, ic, ow, oc), jnp.int8)
        for dx in range(kw):
            band = band.at[owi + dx, :, owi, :].set(w[dy, dx][None])
        band = band.reshape(wp * ic, ow * oc)
        bands.append(jnp.pad(band, ((0, 0), (0, np_ - ow * oc))))
    return jnp.stack(bands)


def _build_slabs(xp: jax.Array, kh: int, oh: int) -> jax.Array:
    """Padded NHWC x -> (kh, B*OH, W_in*ic) int8 dense row-slabs."""
    b, hp, wp, ic = xp.shape
    return jnp.stack(
        [xp[:, dy : dy + oh].reshape(b * oh, wp * ic) for dy in range(kh)]
    )


def _acc_into(acc_ref, s_refs, b_ref, kh: int):
    acc_ref[:] = jax.lax.dot_general(
        s_refs[0], b_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    for dy in range(1, kh):
        acc_ref[:] += jax.lax.dot_general(
            s_refs[dy], b_ref[dy],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )


def _max_kernel(s_refs, b_ref, m_ref, acc_ref, *, kh):
    i = pl.program_id(0)
    _acc_into(acc_ref, s_refs, b_ref, kh)
    tmax = jnp.max(jnp.abs(acc_ref[:]))

    @pl.when(i == 0)
    def _():
        m_ref[0, 0] = tmax

    @pl.when(i != 0)
    def _():
        m_ref[0, 0] = jnp.maximum(m_ref[0, 0], tmax)


def _fwd_epilogue(acc, shift):
    """Forward requant: psto shift, or plain wrap-cast when shift <= 0
    (requant_forward_from_bw semantics)."""
    shifted = numerics.psto_round(acc, shift)
    plain = acc.astype(jnp.int8).astype(jnp.int32)
    return jnp.where(shift > 0, shifted, plain).astype(jnp.int8)


def _requant_kernel(shift_ref, s_refs, b_ref, y_ref, acc_ref, *, kh, nout,
                    grad):
    _acc_into(acc_ref, s_refs, b_ref, kh)
    shift = shift_ref[0]
    # chunked epilogue: bounds the live int32 temporaries of the psto bit
    # math to (rows, _EPI_CHUNK) each
    for c0 in range(0, nout, _EPI_CHUNK):
        c1 = min(c0 + _EPI_CHUNK, nout)
        acc = acc_ref[:, c0:c1]
        if grad:
            out = numerics.psto_round(acc, shift).astype(jnp.int8)
        else:
            out = _fwd_epilogue(acc, shift)
        y_ref[:, c0:c1] = out


def _plan_rows(rows: int, kh: int, kp: int, np_: int,
               budget: int = 9 * 2**20) -> int:
    """Largest row tile whose VMEM working set fits the scoped-vmem stack
    budget (defaults leave headroom under the 16M limit)."""
    per_row = (
        kh * kp              # slab blocks (int8)
        + 2 * np_ * 4        # scratch acc + dot temp (int32)
        + 8 * _EPI_CHUNK * 4  # epilogue temps (int32, chunked)
        + np_                # out block (int8)
    )
    r = min(max(budget // max(per_row, 1), 8), rows)
    while rows % r:
        r -= 1
    return r


def supports(w_shape, padded_width: int, stride,
             band_budget: int = 4 * 2**20) -> bool:
    """Eligibility: stride-1 and band matrices that fit VMEM.
    `padded_width` is the input width incl. the conv's padding."""
    if tuple(stride) != (1, 1):
        return False
    kh, kw, ic, oc = w_shape
    ow = padded_width - kw + 1
    np_ = _round_up(ow * oc, 128)
    return ow >= 1 and kh * padded_width * ic * np_ <= band_budget


def _prep(x, w, padding):
    kh, kw, ic, oc = w.shape
    xp = jnp.pad(x, ((0, 0), padding[0], padding[1], (0, 0)))
    b, hp, wp, _ = xp.shape
    oh, ow = hp - kh + 1, wp - kw + 1
    kp = wp * ic
    np_ = _round_up(ow * oc, 128)
    bands = _build_bands(w, wp, ow)
    slabs = _build_slabs(xp, kh, oh)
    rows = b * oh
    r = _plan_rows(rows, kh, kp, np_)
    return slabs, bands, (b, oh, ow, oc, kh, kp, np_, rows, r)


@functools.partial(jax.jit, static_argnames=("kernel", "padding", "interpret"))
def conv_max_pallas(
    x: jax.Array,
    w: jax.Array,
    kernel: Tuple[int, int],
    padding: Tuple[Tuple[int, int], Tuple[int, int]],
    interpret: bool = False,
) -> jax.Array:
    """Phase 1: global max|acc| of the stride-1 int8 conv, int32 scalar.
    No accumulator leaves VMEM."""
    slabs, bands, (b, oh, ow, oc, kh, kp, np_, rows, r) = _prep(x, w, padding)
    m = pl.pallas_call(
        functools.partial(_max_kernel, kh=kh),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
        grid=(rows // r,),
        in_specs=[
            pl.BlockSpec((kh, r, kp), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kh, kp, np_), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0),
                               memory_space=pltpu.SMEM),
        scratch_shapes=[pltpu.VMEM((r, np_), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(slabs, bands)
    return m[0, 0]


@functools.partial(
    jax.jit, static_argnames=("kernel", "padding", "grad", "interpret")
)
def conv_requant_pallas(
    x: jax.Array,
    w: jax.Array,
    shift: jax.Array,
    kernel: Tuple[int, int],
    padding: Tuple[Tuple[int, int], Tuple[int, int]],
    grad: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """Phase 2: recompute the conv and requantize in-kernel -> int8 NHWC."""
    slabs, bands, (b, oh, ow, oc, kh, kp, np_, rows, r) = _prep(x, w, padding)
    y = pl.pallas_call(
        functools.partial(_requant_kernel, kh=kh, nout=ow * oc, grad=grad),
        out_shape=jax.ShapeDtypeStruct((rows, ow * oc), jnp.int8),
        grid=(rows // r,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # shift (1,) int32
            pl.BlockSpec((kh, r, kp), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kh, kp, np_), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((r, ow * oc), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((r, np_), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(shift.reshape(1).astype(jnp.int32), slabs, bands)
    # row-major (b*oh, ow*oc) == (b, oh, ow, oc): free bitcast reshape
    return y.reshape(b, oh, ow, oc)
