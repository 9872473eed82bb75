"""NITI int8 depthwise convolution (MobileNet-family bottlenecks).

The reference's NITI op set is dense-conv only (its MobileNet demos run in
fp32); depthwise is required for the mixed-precision MobileNet-v2 CIFAR
config (BASELINE.md configs; SURVEY.md section 7 step 5). Numerics follow
the NITI conv contract exactly: int8 x int8 -> int32 accumulate, forward
requant shift = bw-7 (branch rules), filter grad shift = bw-2, input grad
bw-7 — the same shared requant code as dense conv.

Weights are (KH, KW, 1, C) HWIO with feature_group_count = C.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from . import numerics
from .conv import (
    _fused_enabled,
    _maybe_pmax,
    get_requant_impl,
    resolve_padding,
)


def pc_shift_cap(taps: int) -> int:
    """Largest alignment left-shift s.t. the worst-case |dw acc| of
    `taps` int8*int8 products stays int32: taps*127^2 << cap < 2^31.
    3x3 -> 12 (the r4 hardcoded value), 5x5 -> 11, 7x7 -> 10. Derived per
    kernel instead of assuming 9 taps (r4 advisor finding: a 7x7 acc
    shifted by 12 would overflow int32)."""
    import math

    return 30 - math.ceil(math.log2(taps * 127 * 127))


def _per_channel_shifts(w_exp: jax.Array, taps: int = 9):
    """(e_base scalar, shift_c vector or None) for a weight exponent that is
    either the per-tensor scalar (reference contract) or a (C,) vector
    (this framework's per-channel depthwise extension, r4).

    Vector case: every channel's accumulator is expressed at the SMALLEST
    channel exponent by a left shift of (exp_c - min exp_c) — int32-safe
    under pc_shift_cap(taps) — so the per-tensor range-estimate/psto
    contract downstream is unchanged. The init path
    (nn/init.niti_xavier_int8_dw_per_channel) floors each channel's range
    so the spread never exceeds the cap; a concrete (non-traced) exponent
    that still exceeds it raises here instead of silently mis-scaling."""
    cap = pc_shift_cap(taps)
    w_exp = w_exp.astype(jnp.int32)
    if w_exp.ndim == 0:
        return w_exp, None
    e_base = jnp.min(w_exp)
    shift = w_exp - e_base
    if not isinstance(shift, jax.core.Tracer):
        spread = int(jnp.max(shift))
        if spread > cap:
            raise ValueError(
                f"per-channel dw exponent spread {spread} exceeds the "
                f"int32-safe alignment cap {cap} for a {taps}-tap kernel; "
                "re-initialize with niti_xavier_int8_dw_per_channel (which "
                "floors the per-channel range) or narrow the exponents"
            )
    return e_base, jnp.clip(shift, 0, cap)


def _recompute_dw_acc(acc_elems: int) -> bool:
    """Requant-acc policy for depthwise (see ops/conv.py). Measured
    NEGATIVE for "auto": recomputing the taps form costs more than the acc
    round-trip saves (MNv2 b256 step 23.9k -> 22.5k samples/s with dw
    recompute at the dense threshold; isolated dw 144ch @32x32: 0.41 ->
    0.82 ms) — the 9-tap int32 multiply-add chain re-reads its input 9
    times from HBM, unlike a matmul whose recompute stays MXU-local. Auto
    therefore always materializes for depthwise; the forced "recompute"
    mode remains for probes."""
    del acc_elems
    return get_requant_impl() == "recompute"


def _fused_dw_requant(
    x: jax.Array,
    w: jax.Array,
    stride: Tuple[int, int],
    pad: Tuple[Tuple[int, int], Tuple[int, int]],
    axis_name: Optional[str],
    interpret: bool,
    grad: bool,
) -> Optional[Tuple[jax.Array, jax.Array]]:
    """Two-phase fused Pallas depthwise conv (int32 accumulator never in
    HBM) — stride-1 only; strided callers pre-dilate (input grads) or fall
    back. Returns (int8 y, eff_shift) or None if unsupported."""
    from .conv import get_fused_conv_mode
    from .kernels import fused_dwconv_int8 as _fdw

    if get_fused_conv_mode() == "off" or tuple(stride) != (1, 1):
        return None
    kh, kw, _, c = w.shape
    xp = jnp.pad(x, ((0, 0), pad[0], pad[1], (0, 0)))
    b, hp, wp, _ = xp.shape
    oh, ow = hp - kh + 1, wp - kw + 1
    if not _fdw.supports(b, hp, wp, oh, ow, c):
        return None
    m = _maybe_pmax(
        _fdw.dwconv_max_pallas(xp, w, (kh, kw), interpret=interpret),
        axis_name,
    )
    eff_shift = numerics.forward_shift(numerics.range_estimate_from_max(m))
    y = _fdw.dwconv_requant_pallas(
        xp, w, eff_shift, (kh, kw), grad=grad, interpret=interpret
    )
    return y, eff_shift


# Depthwise forward/igrad accumulator implementation:
#   "grouped" — one XLA conv with feature_group_count=C
#   "taps"    — kh*kw shifted elementwise multiply-adds (pure VPU work,
#               immune to the grouped-conv layout cliff: the r3 per-op
#               profile caught XLA lowering the stage-4 MNv2 dw convs at
#               3.09 ms each *in context* — 64x their isolated 0.048 ms —
#               when layout assignment picked C-minor for the fused
#               conv+abs-reduce; taps never lower to a convolution)
# Measured isolated (tools/probes/dw_fix_probe.py): taps ~= grouped at
# 32x32, grouped slightly ahead at tiny spatial; the in-context step
# measurement decides the default. (A third batch-on-lanes Pallas
# routing existed in r3 and measured 2x slower than either form on TPU;
# it was removed in r4 — the surviving Pallas depthwise kernel is the
# kernels/fused_dwconv_int8.py parity/SIMU layer only.)
_DW_IMPL = "taps"
_DW_VALID = ("taps", "grouped")


def set_dw_impl(name: str) -> None:
    global _DW_IMPL
    if name not in _DW_VALID:
        raise ValueError(f"dw impl must be one of {_DW_VALID}, got {name!r}")
    _DW_IMPL = name


def get_dw_impl() -> str:
    return _DW_IMPL


# Depthwise filter-grad requant margin (shift = bw - margin). The dense
# NITI contract uses margin=2 (NITI_GradientConv_Int8.cpp:274-296), but
# depthwise is THIS framework's extension — the reference has no NITI
# depthwise op and trains its MobileNets in fp32. r5 finding
# (DIVERGENCE_r05.json): full-NITI MobileNetV2 needs margin 0 (dense AND
# dw, with per-channel dw exponents) — the requant keeps ~margin+1 top
# bits, and the bottleneck's expanded fan-in makes +-4-unit updates
# (margin 2) destructive; margin 1 is seed-marginal. MNv1 trains at the
# default 2; the MobilenetV2Train demo sets 0/0.
_DW_FGRAD_MARGIN = 2


def set_dw_fgrad_margin(margin: int) -> None:
    global _DW_FGRAD_MARGIN
    _DW_FGRAD_MARGIN = int(margin)


def get_dw_fgrad_margin() -> int:
    return _DW_FGRAD_MARGIN


def _dw_acc_taps(
    x: jax.Array,
    w: jax.Array,
    stride: Tuple[int, int],
    pad: Tuple[Tuple[int, int], Tuple[int, int]],
) -> jax.Array:
    kh, kw, _, c = w.shape
    sh, sw = stride
    xp = jnp.pad(x, ((0, 0), pad[0], pad[1], (0, 0)))
    b, hp, wp, _ = xp.shape
    oh, ow = (hp - kh) // sh + 1, (wp - kw) // sw + 1
    acc = jnp.zeros((b, oh, ow, c), jnp.int32)
    for dy in range(kh):
        for dx in range(kw):
            tap = jax.lax.slice(
                xp,
                (0, dy, dx, 0),
                (b, dy + (oh - 1) * sh + 1, dx + (ow - 1) * sw + 1, c),
                (1, sh, sw, 1),
            ).astype(jnp.int32)
            acc = acc + tap * w[dy, dx, 0].astype(jnp.int32)
    return acc


def dwconv2d_int8_acc(
    x: jax.Array,
    w: jax.Array,
    stride: Sequence[int] = (1, 1),
    padding="SAME",
) -> jax.Array:
    pad = resolve_padding(padding, w.shape[:2], stride, x.shape[1:3])
    if _DW_IMPL == "taps":
        return _dw_acc_taps(x, w, tuple(stride), pad)
    c = x.shape[-1]
    return jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=tuple(stride),
        padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        preferred_element_type=jnp.int32,
    )


def dwconv2d_forward(
    x: jax.Array,
    x_exp: jax.Array,
    w: jax.Array,
    w_exp: jax.Array,
    stride: Sequence[int] = (1, 1),
    padding="SAME",
    axis_name: Optional[str] = None,
    act: Optional[str] = None,
) -> Tuple[jax.Array, jax.Array]:
    from .conv import _apply_act

    e_base, pc_shift = _per_channel_shifts(w_exp, w.shape[0] * w.shape[1])
    exp_in = x_exp.astype(jnp.int32) + e_base
    interpret = _fused_enabled()
    if interpret is not None and pc_shift is None:
        pad = resolve_padding(padding, w.shape[:2], stride, x.shape[1:3])
        fused = _fused_dw_requant(
            x, w, tuple(stride), pad, axis_name, interpret, grad=False
        )
        if fused is not None:
            y, eff_shift = fused
            e = exp_in + eff_shift
            return _apply_act(y, e, act), e
    acc = dwconv2d_int8_acc(x, w, stride, padding)
    if pc_shift is not None:
        acc = acc << pc_shift[None, None, None, :]
    m = _maybe_pmax(jnp.max(jnp.abs(acc)), axis_name)
    bw = numerics.range_estimate_from_max(m)
    if pc_shift is None and _DW_IMPL == "taps" and _recompute_dw_acc(acc.size):
        x2, w2 = jax.lax.optimization_barrier((x, w))
        acc = dwconv2d_int8_acc(x2, w2, stride, padding)
    y, e = numerics.requant_forward_from_bw(acc, exp_in, bw)
    return _apply_act(y, e, act), e


def dwconv2d_input_grad(
    gy: jax.Array,
    w: jax.Array,
    x_spatial: Tuple[int, int],
    stride: Sequence[int] = (1, 1),
    padding="SAME",
    axis_name: Optional[str] = None,
    w_exp: Optional[jax.Array] = None,
) -> jax.Array:
    """Transposed depthwise conv with rot180 weights, bw-7 requant.

    With a per-channel `w_exp` vector (the r4 depthwise extension), each
    channel's accumulator — which scales with that channel's weight
    exponent, since depthwise channels never mix — is aligned to the
    smallest channel exponent before the per-tensor requant."""
    kh, kw, _, c = w.shape
    pc_shift = None
    if w_exp is not None and w_exp.ndim > 0:
        _, pc_shift = _per_channel_shifts(w_exp, kh * kw)
    (pt, _), (pl, _) = resolve_padding(padding, w.shape[:2], stride, x_spatial)
    sh, sw = stride
    ih, iw = x_spatial
    oh, ow = gy.shape[1], gy.shape[2]
    w_rot = jnp.flip(w, axis=(0, 1))  # per-channel, no io swap (1-in-1-out)
    pad_top = kh - 1 - pt
    pad_left = kw - 1 - pl
    dil_h = (oh - 1) * sh + 1
    dil_w = (ow - 1) * sw + 1
    pad_bottom = ih - dil_h - pad_top + kh - 1
    pad_right = iw - dil_w - pad_left + kw - 1
    interpret = _fused_enabled()
    if interpret is not None and min(pad_top, pad_left, pad_bottom,
                                     pad_right) >= 0:
        gy_d = gy
        if (sh, sw) != (1, 1):
            gy_d = jnp.zeros(
                (gy.shape[0], dil_h, dil_w, gy.shape[3]), gy.dtype
            ).at[:, ::sh, ::sw, :].set(gy)
        if pc_shift is None:
            fused = _fused_dw_requant(
                gy_d, w_rot, (1, 1),
                ((pad_top, pad_bottom), (pad_left, pad_right)),
                axis_name, interpret, grad=False,
            )
            if fused is not None:
                return fused[0]
    if (_DW_IMPL == "taps"
            and min(pad_top, pad_left, pad_bottom, pad_right) >= 0):
        gy_d = gy
        if (sh, sw) != (1, 1):
            gy_d = jnp.zeros(
                (gy.shape[0], dil_h, dil_w, gy.shape[3]), gy.dtype
            ).at[:, ::sh, ::sw, :].set(gy)
        acc = _dw_acc_taps(
            gy_d, w_rot, (1, 1),
            ((pad_top, pad_bottom), (pad_left, pad_right)),
        )
        if pc_shift is not None:
            acc = acc << pc_shift[None, None, None, :]
        m = _maybe_pmax(jnp.max(jnp.abs(acc)), axis_name)
        bw = numerics.range_estimate_from_max(m)
        if pc_shift is None and _recompute_dw_acc(acc.size):
            gy2, w2 = jax.lax.optimization_barrier((gy_d, w_rot))
            acc = _dw_acc_taps(
                gy2, w2, (1, 1),
                ((pad_top, pad_bottom), (pad_left, pad_right)),
            )
        out, _ = numerics.requant_forward_from_bw(acc, jnp.int32(0), bw)
        return out
    acc = jax.lax.conv_general_dilated(
        gy,
        w_rot,
        (1, 1),
        ((pad_top, pad_bottom), (pad_left, pad_right)),
        lhs_dilation=(sh, sw),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        preferred_element_type=jnp.int32,
    )
    if pc_shift is not None:
        acc = acc << pc_shift[None, None, None, :]
    m = _maybe_pmax(jnp.max(jnp.abs(acc)), axis_name)
    bw = numerics.range_estimate_from_max(m)
    out, _ = numerics.requant_forward_from_bw(acc, jnp.int32(0), bw)
    return out


def dwconv2d_filter_grad(
    x: jax.Array,
    gy: jax.Array,
    kernel_spatial: Tuple[int, int],
    stride: Sequence[int] = (1, 1),
    padding="SAME",
    axis_name: Optional[str] = None,
    w_exp: Optional[jax.Array] = None,
) -> jax.Array:
    """dw[kh,kw,1,c] = sum_{b,oh,ow} x[b, oh*s+kh-pt, ...] * gy[b,oh,ow,c];
    bw-2 shift like the dense filter grad.

    With a per-channel `w_exp` vector, the accumulator — which is the
    gradient in VALUE units, uniform across channels — is expressed in
    each channel's own data units by a truncating right shift of
    (exp_c - min exp_c) before the per-tensor requant: channels whose data
    quantum is worth more receive proportionally smaller integer updates,
    the per-channel analog of the reference's uniform w <- w - g.

    Lowered as ONE batch-grouped conv (batch_group_count=C with logical
    dimension numbers "CHWN" — the exact form XLA autodiff uses for
    depthwise weight grads). The r2 implementation was a 9-slice VPU
    einsum; the r3 per-op profile showed its strided tap slices feeding
    ~7 GB/step of async slice traffic in the MNv2 step, and the grouped
    conv measured 1.7-4.5x faster at every model-zoo shape
    (tools/probes/dw_fix_probe.py: 0.345->0.207 ms @32x32x144,
    0.051->0.012 ms @8x8x384, 0.022->0.006 ms @4x4x960).

    NOTE: a fused Pallas filter-grad kernel also exists
    (kernels/fused_dwconv_int8.dwconv_fgrad_acc_pallas) but is NOT routed:
    measured 1.24 ms vs 0.28 ms at (256, 32, 32, 144) — negative result,
    kept for the record.
    """
    kh, kw = kernel_spatial
    c = x.shape[-1]
    pad = resolve_padding(padding, (kh, kw), stride, x.shape[1:3])
    with jax.named_scope("filter_grad"):
        acc = jax.lax.conv_general_dilated(
            x,
            gy,
            window_strides=(1, 1),
            padding=pad,
            rhs_dilation=tuple(stride),
            dimension_numbers=("CHWN", "IHWO", "NHWC"),
            batch_group_count=c,
            preferred_element_type=jnp.int32,
        )  # (1, kh', kw', C); only the leading kh x kw taps belong to the
        # kernel when stride > 1 (same slice as the dense fgrad)
        acc = acc[:, :kh, :kw, :].transpose(1, 2, 0, 3)  # (kh, kw, 1, C)
        pc_shift = None
        if w_exp is not None and w_exp.ndim > 0:
            _, pc_vec = _per_channel_shifts(w_exp, kh * kw)
            # applied after the cross-replica psum inside the allreduce
            # (truncating division does not commute with addition)
            pc_shift = pc_vec[None, None, None, :]
        from . import allreduce

        return allreduce.grad_allreduce_requant(acc, axis_name,
                                                margin=_DW_FGRAD_MARGIN,
                                                pc_shift=pc_shift)


def avgpool2d_int8(
    x: jax.Array,
    x_exp: jax.Array,
    window: Sequence[int],
    stride: Optional[Sequence[int]] = None,
) -> Tuple[jax.Array, jax.Array]:
    """int8 average pool: int32 window sum, truncating division by the
    window size, exponent passthrough. (The reference has no NITI avgpool —
    its MobileNet path is fp32 — so the integer semantics follow the same
    int32-accumulate + truncate style as the other NITI ops.)"""
    kh, kw = window
    sh, sw = stride or window
    acc = jax.lax.reduce_window(
        x.astype(jnp.int32),
        jnp.int32(0),
        jax.lax.add,
        window_dimensions=(1, kh, kw, 1),
        window_strides=(1, sh, sw, 1),
        padding="VALID",
    )
    out = jax.lax.div(acc, jnp.int32(kh * kw))
    return numerics.int8_clip(out).astype(jnp.int8), x_exp


def avgpool2d_grad(
    gy: jax.Array,
    x_spatial: Tuple[int, int],
    window: Sequence[int],
    stride: Optional[Sequence[int]] = None,
) -> jax.Array:
    """Spread gy/|window| uniformly over each window (truncating division)."""
    kh, kw = window
    sh, sw = stride or window
    ih, iw = x_spatial
    g = jax.lax.div(gy.astype(jnp.int32), jnp.int32(kh * kw))
    b, oh, ow, c = gy.shape
    gx = jnp.zeros((b, ih, iw, c), jnp.int32)
    for dy in range(kh):
        for dx in range(kw):
            scat = jnp.zeros((b, ih, iw, c), jnp.int32)
            dil = jnp.zeros((b, (oh - 1) * sh + 1, (ow - 1) * sw + 1, c), jnp.int32)
            dil = dil.at[:, ::sh, ::sw, :].set(g)
            scat = jax.lax.dynamic_update_slice(scat, dil, (0, dy, dx, 0))
            gx = gx + scat
    return numerics.int8_clip(gx).astype(jnp.int8)
