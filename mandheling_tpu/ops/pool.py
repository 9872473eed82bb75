"""NITI int8 max-pooling forward/backward and LeftPoolGrad (zero-dilation).

Reference:
- forward  `NITI_Maxpool_Int8`  (source/backend/cpu/NITI_Maxpool_Int8.cpp:40-206)
  int8 NHWC max pool; the scale exponent passes through unchanged.
- backward `NITI_PoolGrad_Int8` (source/backend/cpu/NITI_CPUPoolGrad_Int8.cpp:21-77)
  re-derives the argmax by comparing each window element against the pooled
  output and routes the gradient to the FIRST matching position (scan order),
  accumulating with plain int8 addition.
- `NITI_CPULeftPoolGrad_Int8` (zero-insertion upsample used for stride-2
  conv gradients) — on TPU this is XLA lhs_dilation inside ops/conv.py; a
  standalone version is kept here for op-level parity.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from . import numerics


def maxpool2d(
    x: jax.Array,
    x_exp: jax.Array,
    window: Sequence[int] = (2, 2),
    stride: Sequence[int] = (2, 2),
) -> Tuple[jax.Array, jax.Array]:
    """int8 NHWC max pool; exponent passthrough.

    The stride==window case lowers as a reshape + small-axis max — measured
    ~3x faster than lax.reduce_window for int8 on TPU."""
    kh, kw = window
    sh, sw = stride
    if (kh, kw) == (sh, sw):
        b, ih, iw, c = x.shape
        oh, ow = ih // kh, iw // kw
        xc = x[:, : oh * kh, : ow * kw, :].reshape(b, oh, kh, ow, kw, c)
        return jnp.max(xc, axis=(2, 4)), x_exp
    y = jax.lax.reduce_window(
        x,
        jnp.int8(-128),
        jax.lax.max,
        window_dimensions=(1, kh, kw, 1),
        window_strides=(1, sh, sw, 1),
        padding="VALID",
    )
    return y, x_exp


def maxpool2d_grad(
    x: jax.Array,
    y: jax.Array,
    gy: jax.Array,
    window: Sequence[int] = (2, 2),
    stride: Sequence[int] = (2, 2),
) -> jax.Array:
    """Route gy to the first (row-major scan order) window position whose
    forward value >= pooled max (NITI_CPUPoolGrad_Int8.cpp:60-66).

    The reference accumulates overlapping-window contributions with a raw
    int8 add (`dst[j] = dst[j] + diffValue[j]`) that can wrap when an input
    element is first-argmax of several overlapping windows (tie-heavy int8
    data makes this common); wrapping flips the gradient sign. The 3x3
    stride-2 pools of ResNet50v2/Inception are the first real users of this
    path, so we accumulate in int32 and clip to +/-127 instead — the same
    clipped-add convention OpGrad uses for multi-consumer gradients
    (grad/OpGrad.cpp:64-128).

    Implemented gather-style per input position: for each input element,
    sum the gy of all windows for which this element is the designated
    first-argmax. Window counts are static so the loop unrolls at trace
    time into vectorized selects.

    The stride==window case (every pool in the model zoo) takes a
    disjoint-window fast path: pure int8 compares/selects assembled by one
    interleaving reshape — no int32 cumsum, no per-window scatter passes
    (those dominated the backward's HBM traffic on TPU).
    """
    kh, kw = window
    sh, sw = stride
    if (kh, kw) == (sh, sw):
        return _maxpool2d_grad_disjoint(x, y, gy, kh, kw)
    b, ih, iw, c = x.shape
    oh, ow = y.shape[1], y.shape[2]

    # first-argmax flag per window position: x[pos] == max and no earlier
    # position matched. Build window-stacked views of x.
    patches = []
    for dy in range(kh):
        for dx in range(kw):
            patches.append(
                jax.lax.slice(
                    x,
                    (0, dy, dx, 0),
                    (b, dy + (oh - 1) * sh + 1, dx + (ow - 1) * sw + 1, c),
                    (1, sh, sw, 1),
                )
            )
    stacked = jnp.stack(patches)  # (kh*kw, B, oh, ow, C)
    is_max = stacked >= y[None]
    earlier = jnp.cumsum(is_max.astype(jnp.int32), axis=0) - is_max.astype(jnp.int32)
    first = jnp.logical_and(is_max, earlier == 0)  # exactly one True per window

    gx = jnp.zeros((b, ih, iw, c), jnp.int32)
    idx = 0
    for dy in range(kh):
        for dx in range(kw):
            contrib = jnp.where(first[idx], gy, jnp.int8(0))
            scattered = jnp.zeros((b, ih, iw, c), jnp.int8)
            scattered = jax.lax.dynamic_update_slice(
                scattered,
                _dilate(contrib, sh, sw),
                (0, dy, dx, 0),
            )
            gx = gx + scattered.astype(jnp.int32)
            idx += 1
    return numerics.int8_clip(gx).astype(jnp.int8)


def _maxpool2d_grad_disjoint(
    x: jax.Array, y: jax.Array, gy: jax.Array, kh: int, kw: int
) -> jax.Array:
    """stride==window backward: windows are disjoint, so each input element
    belongs to exactly one window and each window routes gy to its first
    (scan-order) max. One interleave reshape assembles gx — int8 end to end.
    """
    b, ih, iw, c = x.shape
    oh, ow = y.shape[1], y.shape[2]
    xc = x[:, : oh * kh, : ow * kw, :].reshape(b, oh, kh, ow, kw, c)
    taken = jnp.zeros((b, oh, ow, c), jnp.bool_)
    rows = []
    for dy in range(kh):
        cols = []
        for dx in range(kw):
            m = jnp.logical_and(xc[:, :, dy, :, dx, :] >= y, ~taken)
            taken = jnp.logical_or(taken, m)
            cols.append(jnp.where(m, gy, jnp.int8(0)))
        rows.append(jnp.stack(cols, axis=3))       # (b, oh, ow, kw, c)
    g = jnp.stack(rows, axis=2)                    # (b, oh, kh, ow, kw, c)
    gx = g.reshape(b, oh * kh, ow * kw, c)
    if oh * kh < ih or ow * kw < iw:
        gx = jnp.pad(gx, ((0, 0), (0, ih - oh * kh), (0, iw - ow * kw),
                          (0, 0)))
    return gx


def _dilate(g: jax.Array, sh: int, sw: int) -> jax.Array:
    """Zero-insert between elements: out[..., i*sh, j*sw, ...] = g[..., i, j, ...]."""
    if sh == 1 and sw == 1:
        return g
    b, oh, ow, c = g.shape
    out = jnp.zeros((b, (oh - 1) * sh + 1, (ow - 1) * sw + 1, c), g.dtype)
    return out.at[:, ::sh, ::sw, :].set(g)


def left_pool_grad(
    gy: jax.Array, out_spatial: Sequence[int], stride: Sequence[int] = (2, 2)
) -> jax.Array:
    """Zero-insertion upsample (`NITI_CPULeftPoolGrad_Int8.cpp:18-52`):
    out[y, x] = gy[y/s, x/s] when y%s == 0 and x%s == 0, else 0.
    """
    sh, sw = stride
    oh, ow = out_spatial
    b, ih, iw, c = gy.shape
    out = jnp.zeros((b, oh, ow, c), gy.dtype)
    # positions y in range(0, oh, sh) read gy[y//sh]; clip to available input
    ny = min(ih, (oh + sh - 1) // sh)
    nx = min(iw, (ow + sw - 1) // sw)
    return out.at[:, : ny * sh : sh, : nx * sw : sw, :].set(gy[:, :ny, :nx, :])
