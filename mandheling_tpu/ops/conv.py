"""NITI int8 convolution: forward, input-gradient, and filter-gradient.

TPU-native re-design of the reference kernels:

- forward      `NITI_Conv_Int8`          (source/backend/cpu/NITI_Conv_Int8.cpp:19-324)
- input grad   `NITI_DeCONV_Int8`        (source/backend/cpu/NITI_DeConv_Int8.cpp)
- filter grad  `NITI_GradientCONV_Int8`  (source/backend/cpu/NITI_GradientConv_Int8.cpp)

The reference lowers each to im2col + NEON int8 GEMM with NC4HW4 tiling, then
a per-tensor range-estimate + pseudo-stochastic shift. On TPU the layout is
NHWC/HWIO, the int8 x int8 -> int32 contraction is a single XLA convolution
(or a Pallas MXU kernel, see ops/kernels/), and the requantization is the
shared code in ops/numerics.py. Gradient wiring (rot180 weights for the input
grad, batch<->channel transposition for the filter grad, zero-dilation of the
output-diff for stride>1 — the reference's `_NITI_LeftPoolGrad` + pad chain,
grad/NITI_Conv_Int8_Grad.cpp:92-123) is expressed through XLA's native
lhs/rhs dilation instead of materializing intermediate tensors.

All functions take/return int8 tensors plus int32 scalar exponents; shapes
are static, exponents are traced scalars.

For data parallelism, `axis_name` threads a mesh axis through the range
estimates (cross-replica `pmax` of |acc|) and the filter-grad accumulation
(cross-replica `psum` of the int32 accumulator *before* the single global
shift) so sharded training is bit-identical to single-chip training.
"""

from __future__ import annotations

import contextlib
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from . import numerics
from .kernels import dispatch as _dispatch

_DN = ("NHWC", "HWIO", "NHWC")

# Filter-gradient strategy — the TPU analog of the reference's parallel.txt
# gradient-op selection (grad/NITI_DSPConv_Int8_Grad.cpp:133-232 chooses
# between NITI_DSP_PARALLEL_GRADIENTCONV / TRANSPOSEGRADIENT_CONV /
# GRADIENT_SPLITBatchCONV / CPU GradientCONV by mode file + shape
# thresholds; NITI_DSPMatmulGradientConv_Int8.cpp:843 is the registered
# im2col+matmul alternative):
#   "conv"   — one XLA conv with batch as the contraction dim
#   "matmul" — explicit im2col + int8 matmul (the reference's
#              QuantizedIm2col_8 -> QuantizedMatMul_8x8to32 chain)
#   "corr"   — stacked-slab correlation: one (kh*Wp*ic, OW*oc) MXU GEMM +
#              banded gather-sum; keeps M*N large when ic is small (the
#              "conv" form degenerates to a batch-1 conv there)
#   "auto"   — shape-based choice like the reference's threshold logic
#              (TPU-measured: conv everywhere except ic<=8 stride-1 -> corr;
#               plain "matmul" loses at every LeNet shape because its GEMM
#               output is kh*kw*ic x oc — too skinny for the MXU)
# (Batch splitting, the reference's third strategy, is the microbatched
# pipeline in parallel/pp.py.)
_FILTER_GRAD_STRATEGY = "auto"
_FG_VALID = ("conv", "matmul", "corr", "auto")


def set_filter_grad_strategy(name: str) -> None:
    global _FILTER_GRAD_STRATEGY
    if name not in _FG_VALID:
        raise ValueError(f"strategy must be one of {_FG_VALID}, got {name!r}")
    _FILTER_GRAD_STRATEGY = name


def get_filter_grad_strategy() -> str:
    return _FILTER_GRAD_STRATEGY


@contextlib.contextmanager
def use_filter_grad_strategy(name: str):
    global _FILTER_GRAD_STRATEGY
    prev = _FILTER_GRAD_STRATEGY
    set_filter_grad_strategy(name)
    try:
        yield
    finally:
        _FILTER_GRAD_STRATEGY = prev


def resolve_padding(
    padding, kernel: Tuple[int, int], stride: Sequence[int],
    in_spatial: Tuple[int, int],
) -> Tuple[Tuple[int, int], Tuple[int, int]]:
    """Resolve 'VALID'/'SAME'/explicit padding to concrete per-edge pads.

    SAME follows the TF/XLA convention (out = ceil(in/stride), asymmetric
    low/high split) — required so strided forward/gradient geometries agree.
    """
    if isinstance(padding, str):
        if padding.upper() == "VALID":
            return ((0, 0), (0, 0))
        if padding.upper() == "SAME":
            pads = []
            for i, k, s in zip(in_spatial, kernel, stride):
                out = -(-i // s)
                total = max((out - 1) * s + k - i, 0)
                pads.append((total // 2, total - total // 2))
            return (pads[0], pads[1])
        raise ValueError(f"unknown padding {padding}")
    (pt, pb), (pl, pr) = padding
    return ((pt, pb), (pl, pr))




def _maybe_pmax(m: jax.Array, axis_name: Optional[str]) -> jax.Array:
    if axis_name is None:
        return m
    return jax.lax.pmax(m, axis_name)


# Requant accumulator policy — how pass 2 of the exact two-pass NITI
# requant obtains the int32 accumulator (the global |acc| max must exist
# before the shift, so the op is inherently two-pass; the question is the
# accumulator's residence between the passes):
#   "materialize" — pass 1 writes the int32 acc to HBM (fused with the
#                   abs-max reduce), pass 2 re-reads it: 8 B/elt of HBM
#                   round-trip.
#   "recompute"   — pass 1 emits ONLY the scalar max (the acc never
#                   reaches HBM); pass 2 recomputes the contraction with
#                   the psto-shift fused as its epilogue, writing int8
#                   directly. An optimization_barrier on the second
#                   contraction's operands defeats CSE so XLA keeps the
#                   two single-output fusions.
#   "auto"        — measured shape rule (below). Recompute LOSES on
#                   spatial convs (XLA's spatial conv itself is expensive
#                   — VMEM slab DMAs — so doubling it costs more than the
#                   acc round-trip) and WINS on big expanding matmul-shaped
#                   contractions (tools/probes/recompute_requant_probe*.py,
#                   TPU v5e: mnv2 24->144 @32x32 b256 0.46 -> 0.24 ms).
# Bit-exactness is unaffected: both passes compute the identical int32
# accumulator, so every mode yields byte-identical outputs.
_REQUANT_IMPL = "auto"
_RQ_VALID = ("auto", "materialize", "recompute")


def set_requant_impl(name: str) -> None:
    global _REQUANT_IMPL
    if name not in _RQ_VALID:
        raise ValueError(f"requant impl must be one of {_RQ_VALID}, got {name!r}")
    _REQUANT_IMPL = name


def get_requant_impl() -> str:
    return _REQUANT_IMPL


@contextlib.contextmanager
def use_requant_impl(name: str):
    global _REQUANT_IMPL
    prev = _REQUANT_IMPL
    set_requant_impl(name)
    try:
        yield
    finally:
        _REQUANT_IMPL = prev


# Measured win region for "auto" (TPU v5e, recompute_requant_probe2):
# expanding (N > K) matmul-shaped ops whose int32 accumulator is at least
# ~16M elements (64+ MB). Winners: 16->96 @32x32 b256 (25M elts, 1.16x),
# 24->144 @32x32 b256 (37.7M, 1.6-1.9x). Losers kept materialized:
# 32->192 @16x16 (12.6M, 0.88x), every contraction (N <= K), every
# spatial conv.
_RECOMPUTE_MIN_ACC_ELEMS = 1 << 24


def _recompute_matmul_acc(acc_elems: int, k: int, n: int) -> bool:
    if _REQUANT_IMPL == "materialize":
        return False
    if _REQUANT_IMPL == "recompute":
        return True
    return n > k and acc_elems >= _RECOMPUTE_MIN_ACC_ELEMS


def conv2d_int8_acc(
    x: jax.Array,
    w: jax.Array,
    stride: Sequence[int] = (1, 1),
    padding="VALID",
) -> jax.Array:
    """int8 NHWC x * int8 HWIO w -> int32 accumulator (the raw GEMM result)."""
    pad = resolve_padding(padding, w.shape[:2], stride, x.shape[1:3])
    return _dispatch.conv_acc(x, w, tuple(stride), pad)


def _fused_enabled() -> Optional[bool]:
    """None if the fused Pallas conv path is off (XLA backend), else the
    interpret flag for the selected Pallas mode."""
    backend = _dispatch.get_backend()
    if backend == "xla":
        return None
    return backend == "pallas_interpret"


# Fused-conv kernel selection under the Pallas backends. Hoist-proof
# dep-threaded measurements on TPU v5e, round 2 (earlier numbers here were
# loop-invariant timings that XLA LICM had hoisted — see
# fused_decision_probe.dev_time):
#   pw 1x1 24->144 b256 32x32: fused small-KN 0.66 ms vs XLA 0.48 ms
#   fc1 832x500 b2048:         fused padded   0.023 ms vs XLA 0.018 ms
#   conv1 5x5 1->20 b2048:     banded 0.74 ms vs XLA 0.29 ms
#   rn 3x3 64->64 b256 SAME:   banded 2.26 ms vs XLA 0.18 ms
#   dw 3x3 144 b256 32x32:     fused dw 2.42 ms vs XLA 0.57 ms
# NEGATIVE RESULT, recorded: XLA's conv/dot + fused consumer reductions
# beat every two-phase Pallas fusion tried on these model-zoo shapes — the
# recompute + structural waste (banded) or per-grid-step overhead (small
# matmul) exceeds the 3-pass int32 accumulator traffic the fusion avoids.
# The kernels stay as bit-exact, strided-capable opt-in paths (the
# supernode shift-on-accelerator analog) behind this mode switch; the
# measured default backend is "xla" everywhere (bench.py table).
_FUSED_CONV_MODE = "matmul_only"
_FC_VALID = ("off", "matmul_only", "all")


def set_fused_conv_mode(mode: str) -> None:
    global _FUSED_CONV_MODE
    if mode not in _FC_VALID:
        raise ValueError(f"mode must be one of {_FC_VALID}, got {mode!r}")
    _FUSED_CONV_MODE = mode


def get_fused_conv_mode() -> str:
    return _FUSED_CONV_MODE


@contextlib.contextmanager
def use_fused_conv_mode(mode: str):
    global _FUSED_CONV_MODE
    prev = _FUSED_CONV_MODE
    set_fused_conv_mode(mode)
    try:
        yield
    finally:
        _FUSED_CONV_MODE = prev


def _fused_conv_requant(
    x: jax.Array,
    w: jax.Array,
    stride: Tuple[int, int],
    pad: Tuple[Tuple[int, int], Tuple[int, int]],
    axis_name: Optional[str],
    interpret: bool,
) -> Optional[Tuple[jax.Array, jax.Array]]:
    """Run the conv through a fused two-phase Pallas kernel (int32
    accumulator never in HBM), forward-requant semantics.

    Routes 1x1 convs to the fused matmul (a 1x1 stride-s conv is a strided
    slice + GEMM — zero structural waste) and everything else to the banded
    conv kernels when eligible. Returns (int8 y, eff_shift) or None when no
    fused kernel supports the shape (caller falls back to the unfused
    path). The cross-replica pmax for data parallelism slots between the
    max and requant phases, exactly like the unfused path.
    """
    from .kernels import fused_conv_int8 as _fused
    from .kernels import fused_matmul_int8 as _fmm

    if _FUSED_CONV_MODE == "off":
        return None
    kh, kw, ic, oc = w.shape
    sh, sw = stride
    if kh == 1 and kw == 1:
        if pad != ((0, 0), (0, 0)):
            x = jnp.pad(x, ((0, 0), pad[0], pad[1], (0, 0)))
        if (sh, sw) != (1, 1):
            x = x[:, ::sh, ::sw, :]
        b, h, w_sp, _ = x.shape
        if not _fmm.supports(b * h * w_sp, ic, oc):
            return None
        a2 = x.reshape(b * h * w_sp, ic)
        w2 = w.reshape(ic, oc)
        m = _maybe_pmax(
            _fmm.matmul_max_pallas(a2, w2, interpret=interpret), axis_name
        )
        eff_shift = numerics.forward_shift(numerics.range_estimate_from_max(m))
        y = _fmm.matmul_requant_pallas(
            a2, w2, eff_shift, grad=False, interpret=interpret
        )
        return y.reshape(b, h, w_sp, oc), eff_shift
    if _FUSED_CONV_MODE != "all":
        return None
    wp = x.shape[2] + pad[1][0] + pad[1][1]
    if not _fused.supports(w.shape, wp, stride):
        return None
    m = _maybe_pmax(
        _fused.conv_max_pallas(x, w, (kh, kw), pad, stride,
                               interpret=interpret),
        axis_name,
    )
    eff_shift = numerics.forward_shift(numerics.range_estimate_from_max(m))
    y = _fused.conv_requant_pallas(
        x, w, eff_shift, (kh, kw), pad, stride, grad=False,
        interpret=interpret,
    )
    return y, eff_shift


def _apply_act(y: jax.Array, exp_out: jax.Array, act: Optional[str]):
    """Fused activation on the requantized output. "relu6" MUST be fused
    here rather than a separate layer on the hot path: a standalone
    elementwise clamp whose scalar cap is a traced value costs ~30% of
    the whole MNv2 step (measured 23.7k -> 16.5k samples/s; even a
    data-independent traced-scalar cap reproduces it), while the same
    clamp expressed inside the requant epilogue chain measures 22.7k."""
    if act is None:
        return y
    if y.dtype != jnp.int8:
        raise ValueError("fused activations are int8-only; int16 outputs "
                         "(out_bits=15) are the linear-projection extension")
    if act == "relu6":
        from . import relu as relu_ops

        cap = relu_ops.relu6_cap(exp_out).astype(jnp.int8)
        # min-with-scalar FIRST, constant max(., 0) LAST: downstream
        # consumers then see a constant-bound elementwise producer, which
        # keeps XLA's layout assignment on the fast path (measured: with
        # the scalar-capped op last, the stored activations' layouts flip
        # and the filter-grad convs slow 7x; this ordering measures 22.7k
        # vs 16.5k samples/s on the MNv2 step, bit-identical output)
        return jnp.maximum(jnp.minimum(y, cap), jnp.int8(0))
    raise ValueError(f"unknown act {act!r}")


def conv2d_forward(
    x: jax.Array,
    x_exp: jax.Array,
    w: jax.Array,
    w_exp: jax.Array,
    stride: Sequence[int] = (1, 1),
    padding="VALID",
    axis_name: Optional[str] = None,
    act: Optional[str] = None,
    out_bits: int = 7,
) -> Tuple[jax.Array, jax.Array]:
    """NITI int8 conv forward: (int8 y, int32 exp_out).

    exp_out = x_exp + w_exp + shift where shift comes from the range
    estimate of the int32 accumulator (NITI_Conv_Int8.cpp:255-307).
    `act="relu6"` applies the exponent-aware clamp fused into the requant
    chain (see _apply_act).

    `out_bits=15` requants the output to int16 (shift = bw - 15) instead
    of the int8 contract — this framework's linear-bottleneck extension
    (r5): MobileNetV2's projection 1x1 outputs carry signal that per-tensor
    int8 requant destroys, and the reference never trains MNv2
    integer-only at all (demo/MobilenetV2Utils.cpp is fp32/QAT-only).
    int16 inputs (the following expand conv) take the XLA conv path with
    widened operands; the int32-accumulate + range-estimate + psto chain
    is unchanged.

    Under the Pallas backends, stride-1 int8 convs run through the fused
    two-phase kernels (ops/kernels/fused_conv_int8.py): the int32
    accumulator never hits HBM; the cross-replica pmax slots between the
    max and requant phases.
    """
    exp_in = x_exp.astype(jnp.int32) + w_exp.astype(jnp.int32)
    interpret = _fused_enabled()
    if interpret is not None and out_bits == 7 and x.dtype == jnp.int8:
        pad = resolve_padding(padding, w.shape[:2], stride, x.shape[1:3])
        fused = _fused_conv_requant(
            x, w, tuple(stride), pad, axis_name, interpret
        )
        if fused is not None:
            y, eff_shift = fused
            e = exp_in + eff_shift
            return _apply_act(y, e, act), e
    acc = conv2d_int8_acc(x, w, stride, padding)
    m = _maybe_pmax(jnp.max(jnp.abs(acc)), axis_name)
    bw = numerics.range_estimate_from_max(m)
    kh, kw, ic, oc = w.shape
    if ((kh, kw) == (1, 1) and x.dtype == jnp.int8
            and _recompute_matmul_acc(acc.size, ic, oc)):
        x2, w2 = jax.lax.optimization_barrier((x, w))
        acc = conv2d_int8_acc(x2, w2, stride, padding)
    y, e = numerics.requant_forward_from_bw(acc, exp_in, bw, out_bits)
    return _apply_act(y, e, act), e


def conv2d_input_grad_acc(
    gy: jax.Array,
    w: jax.Array,
    x_spatial: Tuple[int, int],
    stride: Sequence[int] = (1, 1),
    padding="VALID",
) -> jax.Array:
    """int32 accumulator of the transposed conv (input gradient).

    Equivalent to the reference chain: zero-dilate gy by the stride
    (`_NITI_LeftPoolGrad`), pad to "full" overlap (`_NITI_Pad_Int8`), conv
    with rot180/channel-swapped weights (DSP: `_NITI_DSP_WeightRotate180`;
    CPU: DeCONV with `_NITI_Transpose_INT8(w, {1,0,2,3})`) — expressed here
    via XLA lhs_dilation.
    """
    kh, kw, ic, oc = w.shape
    (pt, _pb), (pl, _pr) = resolve_padding(padding, w.shape[:2], stride, x_spatial)
    sh, sw = stride
    # rotate 180 spatially + swap in/out channels
    w_rot = jnp.flip(w, axis=(0, 1)).transpose(0, 1, 3, 2)  # HWIO -> HW,O,I
    ih, iw = x_spatial
    oh, ow = gy.shape[1], gy.shape[2]
    # full-correlation padding, adjusted so output spatial == input spatial
    pad_top = kh - 1 - pt
    pad_left = kw - 1 - pl
    dil_h = (oh - 1) * sh + 1
    dil_w = (ow - 1) * sw + 1
    pad_bottom = ih - dil_h - pad_top + kh - 1
    pad_right = iw - dil_w - pad_left + kw - 1
    return _dispatch.conv_acc(
        gy,
        w_rot,
        (1, 1),
        ((pad_top, pad_bottom), (pad_left, pad_right)),
        lhs_dilation=(sh, sw),
    )


def conv2d_input_grad(
    gy: jax.Array,
    w: jax.Array,
    x_spatial: Tuple[int, int],
    stride: Sequence[int] = (1, 1),
    padding="VALID",
    axis_name: Optional[str] = None,
) -> jax.Array:
    """int8 input gradient with the forward-style bw-7 requant
    (NITI_DeConv_Int8.cpp:294-318; gradient exponents are not threaded —
    the reference's grad rules return scalar-0 exponents).

    Under the Pallas backends this runs through the fused two-phase kernels
    with the rotated weights; strided cases zero-dilate the int8 output-diff
    first (the materialized `_NITI_LeftPoolGrad` — cheap, it is int8) and
    then run the stride-1 fused kernel.
    """
    interpret = _fused_enabled()
    if interpret is not None:
        kh, kw = w.shape[0], w.shape[1]
        sh, sw = stride
        (pt, _pb), (pl_, _pr) = resolve_padding(
            padding, (kh, kw), stride, x_spatial
        )
        w_rot = jnp.flip(w, axis=(0, 1)).transpose(0, 1, 3, 2)
        ih, iw = x_spatial
        oh, ow = gy.shape[1], gy.shape[2]
        pad_top = kh - 1 - pt
        pad_left = kw - 1 - pl_
        dil_h = (oh - 1) * sh + 1
        dil_w = (ow - 1) * sw + 1
        pad_bottom = ih - dil_h - pad_top + kh - 1
        pad_right = iw - dil_w - pad_left + kw - 1
        pad = ((pad_top, pad_bottom), (pad_left, pad_right))
        if min(pad_top, pad_left, pad_bottom, pad_right) >= 0:
            gy_d = gy
            if (sh, sw) != (1, 1):
                gy_d = jnp.zeros(
                    (gy.shape[0], dil_h, dil_w, gy.shape[3]), gy.dtype
                ).at[:, ::sh, ::sw, :].set(gy)
            fused = _fused_conv_requant(
                gy_d, w_rot, (1, 1), pad, axis_name, interpret
            )
            if fused is not None:
                return fused[0]
    acc = conv2d_input_grad_acc(gy, w, x_spatial, stride, padding)
    m = _maybe_pmax(jnp.max(jnp.abs(acc)), axis_name)
    bw = numerics.range_estimate_from_max(m)
    kh, kw, ic, oc = w.shape
    # the input grad contracts oc -> ic; it is matmul-shaped when the
    # kernel is 1x1 and undilated (stride 1), and "expanding" when ic > oc
    # (the projection conv's input grad)
    if ((kh, kw) == (1, 1) and tuple(stride) == (1, 1)
            and _recompute_matmul_acc(acc.size, oc, ic)):
        gy2, w2 = jax.lax.optimization_barrier((gy, w))
        acc = conv2d_input_grad_acc(gy2, w2, x_spatial, stride, padding)
    out, _ = numerics.requant_forward_from_bw(acc, jnp.int32(0), bw)
    return out


def conv2d_filter_grad_acc(
    x: jax.Array,
    gy: jax.Array,
    kernel_spatial: Tuple[int, int],
    stride: Sequence[int] = (1, 1),
    padding="VALID",
) -> jax.Array:
    """int32 accumulator of the filter gradient, shape HWIO.

    dw[kh,kw,ic,oc] = sum_{b,oh,ow} x[b, oh*s+kh, ow*s+kw, ic] * gy[b,oh,ow,oc]

    The reference computes this as a conv of batch<->channel-transposed
    activations with the transposed output-diff as kernel
    (NITI_GradientConv_Int8.cpp; grad wiring NITI_Conv_Int8_Grad.cpp:134-190);
    on TPU it is one conv with batch as the contraction dim and rhs_dilation
    carrying the forward stride — or, under the "matmul" strategy, one
    explicit im2col + int8 matmul. Both produce the identical int32 sum.
    """
    # int16 activations (the MNv2 linear-projection extension) widen the
    # output-diff operand so XLA sees matched types; values are unchanged
    if x.dtype != gy.dtype:
        common = jnp.promote_types(x.dtype, gy.dtype)
        x, gy = x.astype(common), gy.astype(common)
    strategy = _FILTER_GRAD_STRATEGY
    stride1 = tuple(stride) == (1, 1)
    if strategy == "auto":
        # Shape-threshold strategy selection — the analog of the
        # reference's per-shape gradient-op choice
        # (NITI_DSPConv_Int8_Grad.cpp:133-232). r1 routed ic<=8 to the
        # correlation form because the "conv" form's PHYSICAL transposes
        # dominated; with r3's logical dimension numbers the conv form
        # wins everywhere but single-channel inputs (measured,
        # tools/probes/fgrad_stem_probe.py: 3ch stem 0.036 vs 0.815 ms,
        # 8ch 0.0055 vs 0.430 ms; 1ch LeNet stem: corr 0.487 vs 0.639 ms).
        strategy = "corr" if x.shape[-1] == 1 and stride1 else "conv"
    if strategy == "matmul":
        return _filter_grad_acc_matmul(x, gy, kernel_spatial, stride, padding)
    if strategy == "corr" and stride1:
        return _filter_grad_acc_corr(x, gy, kernel_spatial, padding)
    pad = resolve_padding(padding, kernel_spatial, stride, x.shape[1:3])
    # One conv with batch as the contraction dim, expressed through LOGICAL
    # dimension numbers ("CHWN": x's batch dim plays the feature role, its
    # channel dim the batch role) instead of materialized transposes — the
    # same trick XLA's own conv transpose rule uses. The r3 profile showed
    # the physical x.transpose(3,1,2,0)/gy.transpose(1,2,0,3) copies feeding
    # ~1 GB/step of async-copy traffic in the MNv2 step; measured
    # (tools/probes/dw_fix_probe.py): 0.049 -> 0.038 ms for the 24->144
    # 32x32 pw fgrad.
    acc = jax.lax.conv_general_dilated(
        x,
        gy,
        window_strides=(1, 1),
        padding=pad,
        rhs_dilation=tuple(stride),
        dimension_numbers=("CHWN", "IHWO", "NHWC"),
        preferred_element_type=jnp.int32,
    )  # (Cin, kh', kw', Cout) — kh' can exceed kh when stride > 1: the
    # correlation window slides over H - (oh-1)*s - k + s extra taps that do
    # not belong to the kernel (e.g. a 1x1 stride-2 conv on 32x32 yields a
    # 2x2 correlation); only the leading kh x kw block is the gradient
    kh, kw = kernel_spatial
    acc = acc[:, :kh, :kw, :]
    return acc.transpose(1, 2, 0, 3)  # HWIO


def _filter_grad_acc_corr(
    x: jax.Array,
    gy: jax.Array,
    kernel_spatial: Tuple[int, int],
    padding,
) -> jax.Array:
    """Filter-grad accumulator via stacked-slab correlation (stride 1).

    A[(b,i), (dy,wi,c)] = x_padded[b, i+dy, wi, c]   (kh row-slabs stacked)
    C[(b,i), (j,o)]     = gy[b, i, j, o]
    P = A^T @ C  — one (kh*Wp*ic, OW*oc) MXU GEMM with the huge B*OH
    contraction — then dw[dy,dx,c,o] = sum_j P[(dy, j+dx, c), (j, o)], a
    banded gather-sum over a tiny matrix. This keeps the GEMM output large
    where the batch-contraction conv degenerates (ic small -> conv batch 1).
    """
    kh, kw = kernel_spatial
    ic, oc = x.shape[-1], gy.shape[-1]
    pad = resolve_padding(padding, kernel_spatial, (1, 1), x.shape[1:3])
    xp = jnp.pad(x, ((0, 0), pad[0], pad[1], (0, 0)))
    b, hp, wp, _ = xp.shape
    oh, ow = gy.shape[1], gy.shape[2]
    assert oh == hp - kh + 1 and ow == wp - kw + 1
    # keep operands in their natural 4/5-D shapes and contract (b, oh) with
    # dot_general directly — explicit 2-D reshapes here forced XLA into a
    # layout-hostile copy that dominated the whole training step (profiled:
    # one reshape = 0.86 ms vs the 0.28 ms GEMM)
    slabs = jnp.stack(
        [xp[:, dy : dy + oh] for dy in range(kh)], axis=2
    )  # (b, oh, kh, wp, ic)
    p = jax.lax.dot_general(
        slabs, gy,
        dimension_numbers=(((0, 1), (0, 1)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (kh, wp, ic, ow, oc)
    j = jnp.arange(ow)
    dy_i = jnp.arange(kh)[:, None, None, None, None]
    dx_i = jnp.arange(kw)[None, :, None, None, None]
    c_i = jnp.arange(ic)[None, None, :, None, None]
    o_i = jnp.arange(oc)[None, None, None, :, None]
    j_i = j[None, None, None, None, :]
    return jnp.sum(p[dy_i, j_i + dx_i, c_i, j_i, o_i], axis=-1)


def _filter_grad_acc_matmul(
    x: jax.Array,
    gy: jax.Array,
    kernel_spatial: Tuple[int, int],
    stride: Sequence[int],
    padding,
) -> jax.Array:
    """Filter-grad accumulator via im2col + one int8 matmul (the reference's
    NITI_DSPMatmulGradientConv chain: QuantizedIm2col_8 -> Reshape ->
    QuantizedMatMul_8x8to32, NITI_DSPMatmulGradientConv_Int8.cpp)."""
    from .kernels.conv_int8 import im2col

    kh, kw = kernel_spatial
    ic = x.shape[-1]
    oc = gy.shape[-1]
    pad = resolve_padding(padding, kernel_spatial, stride, x.shape[1:3])
    patches, (oh, ow) = im2col(x, (kh, kw), tuple(stride), pad)
    assert (oh, ow) == (gy.shape[1], gy.shape[2])
    gmat = gy.reshape(-1, oc)
    acc = _dispatch.matmul_acc(patches.T, gmat)  # (KH*KW*IC, OC)
    return acc.reshape(kh, kw, ic, oc)


# Dense-conv filter-grad requant margin (shift = bw - margin). The
# reference contract is margin=2 (NITI_GradientConv_Int8.cpp:274-296) and
# that is the default. The margin is the only step-size control NITI
# training has — the requant keeps ~margin+1 TOP bits, so margin 2 means
# integer updates up to ~+-4 per step and margin 0 means +-1. Measured
# (r5, DIVERGENCE_r05.json): MobileNetV2's inverted bottleneck requires
# margin 0 (with per-channel dw exponents) to train integer-only — at
# margin 2 its loss RISES monotonically while LeNet/ResNet/MNv1 train
# fine; margin 1 is seed-marginal (0.98 on one seed, chance on another);
# margins 0/0 give 0.97-0.98 across seeds, above the fp32 comparator.
# The MobilenetV2Train demo sets 0/0.
_FGRAD_MARGIN = 2


def set_fgrad_margin(margin: int) -> None:
    global _FGRAD_MARGIN
    _FGRAD_MARGIN = int(margin)


def get_fgrad_margin() -> int:
    return _FGRAD_MARGIN


def conv2d_filter_grad(
    x: jax.Array,
    gy: jax.Array,
    kernel_spatial: Tuple[int, int],
    stride: Sequence[int] = (1, 1),
    padding="VALID",
    axis_name: Optional[str] = None,
) -> jax.Array:
    """int8 filter gradient with the aggressive bw-2 shift
    (NITI_GradientConv_Int8.cpp:274-296). All-zero accumulators stay zero.

    With `axis_name`, the int32 accumulator is combined across the data
    axis per the selected allreduce strategy (ops/allreduce.py): exact
    int32 pre-shift psum, or exponent-aligned int8 (4x less wire traffic).
    """
    from . import allreduce

    # named scope -> the trace/overlap report can identify filter-grad ops
    # (the reference's parallel-gradient-graph ops, PROFILE artifact)
    with jax.named_scope("filter_grad"):
        acc = conv2d_filter_grad_acc(x, gy, kernel_spatial, stride, padding)
        return allreduce.grad_allreduce_requant(acc, axis_name,
                                                margin=_FGRAD_MARGIN)
