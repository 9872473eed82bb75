"""Pallas-backed int8 convolution: im2col + MXU int8 matmul.

The reference computes every NITI conv (forward, deconv, gradient-conv) as
im2col + int8 GEMM — on CPU (`NITI_Conv_Int8.cpp:230-250`,
`compute/Int8FunctionsOpt.cpp`) and on the DSP (QuantizedIm2col_8 +
QuantizedMatMul_8x8to32, `NITI_DSPMatmulGradientConv_Int8.cpp`). The same
decomposition is the right shape for the MXU: patch extraction is pure data
movement (XLA fuses it into the surrounding program), and all FLOPs land in
one large int8 x int8 -> int32 Pallas matmul.

Patch ordering is (kh, kw, C) so weights reshape directly from HWIO.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .matmul_int8 import matmul_acc_pallas_padded


def _dilate_hw(x: jax.Array, dh: int, dw: int) -> jax.Array:
    """Zero-insertion (lhs dilation) along H and W of an NHWC tensor."""
    if dh == 1 and dw == 1:
        return x
    b, h, w, c = x.shape
    out = jnp.zeros((b, (h - 1) * dh + 1, (w - 1) * dw + 1, c), x.dtype)
    return out.at[:, ::dh, ::dw, :].set(x)


def im2col(
    x: jax.Array,
    kernel: Tuple[int, int],
    strides: Tuple[int, int],
    padding: Tuple[Tuple[int, int], Tuple[int, int]],
    lhs_dilation: Tuple[int, int] = (1, 1),
    rhs_dilation: Tuple[int, int] = (1, 1),
) -> Tuple[jax.Array, Tuple[int, int]]:
    """NHWC -> (B*OH*OW, KH*KW*C) patches, ordering (kh, kw, c)."""
    kh, kw = kernel
    sh, sw = strides
    rdh, rdw = rhs_dilation
    x = _dilate_hw(x, *lhs_dilation)
    x = jnp.pad(x, ((0, 0), padding[0], padding[1], (0, 0)))
    b, ih, iw, c = x.shape
    eff_kh = (kh - 1) * rdh + 1
    eff_kw = (kw - 1) * rdw + 1
    oh = (ih - eff_kh) // sh + 1
    ow = (iw - eff_kw) // sw + 1
    cols = []
    for dy in range(kh):
        y0 = dy * rdh
        for dx in range(kw):
            x0 = dx * rdw
            cols.append(
                jax.lax.slice(
                    x,
                    (0, y0, x0, 0),
                    (b, y0 + (oh - 1) * sh + 1, x0 + (ow - 1) * sw + 1, c),
                    (1, sh, sw, 1),
                )
            )
    patches = jnp.concatenate(cols, axis=-1)  # (B, OH, OW, KH*KW*C)
    return patches.reshape(b * oh * ow, kh * kw * c), (oh, ow)


def conv_acc_pallas(
    x: jax.Array,
    w: jax.Array,
    strides: Tuple[int, int],
    padding: Tuple[Tuple[int, int], Tuple[int, int]],
    lhs_dilation: Tuple[int, int] = (1, 1),
    rhs_dilation: Tuple[int, int] = (1, 1),
    interpret: bool = False,
) -> Optional[jax.Array]:
    """int8 NHWC conv via im2col + Pallas MXU matmul -> int32 NHWC.

    Returns None (caller falls back to XLA's conv) when the im2col GEMM is
    too skinny for the tiled kernel to be profitable — same economics as
    matmul_acc_pallas: tile padding on K < 128 or N < 64 inflates the
    dominant operand's HBM traffic (measured on TPU: the unguarded path
    cost ~10x on the 12-wide logit layer and the gradient convs)."""
    kh, kw, ic, oc = w.shape
    if kh * kw * ic < 128 or oc < 64:
        return None
    patches, (oh, ow) = im2col(
        x, (kh, kw), strides, padding, lhs_dilation, rhs_dilation
    )
    wmat = w.reshape(kh * kw * ic, oc)
    acc = matmul_acc_pallas_padded(patches, wmat, interpret=interpret)
    return acc.reshape(x.shape[0], oh, ow, oc)
