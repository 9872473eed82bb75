"""NITI int8 Xavier initialization.

Reference: `Initializer::niti_xavier_int8` (tools/train/source/nn/
Initializer.cpp:112-141) + `Distributions::niti_normal_int8`
(nn/Distributions.cpp:26-51):

    std   = sqrt(2 / (fan_in + fan_out))        # fan over OIHW dims
    w~N(0, std); range = max|w|
    data  = round(w / range * 127) -> int8
    wexp  = ceil(log2(range)) - 7

The reference seeds from gettimeofday; we take an explicit jax PRNG key for
reproducibility (SURVEY.md section 7 "seed control to validate").
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops.qtensor import QTensor


def niti_xavier_int8(key: jax.Array, shape_hwio: Tuple[int, int, int, int]) -> QTensor:
    """HWIO conv weight -> (int8 data, int32 exponent).

    fan_in = IC*KH*KW, fan_out = OC*KH*KW (matching the reference's
    `dims[1]*dims[2]*dims[3]` / `dims[0]*dims[2]*dims[3]` on OIHW).
    """
    kh, kw, ic, oc = shape_hwio
    fan_in = ic * kh * kw
    fan_out = oc * kh * kw
    std = jnp.sqrt(2.0 / (fan_in + fan_out))
    w = jax.random.normal(key, shape_hwio, jnp.float32) * std
    rng = jnp.max(jnp.abs(w))
    exp = (jnp.ceil(jnp.log2(rng)) - 7).astype(jnp.int32)
    data = jnp.round(w / rng * 127.0).astype(jnp.int8)
    return QTensor(data, exp)


def niti_xavier_int8_dw_per_channel(
    key: jax.Array, shape_hwio: Tuple[int, int, int, int]
) -> QTensor:
    """Depthwise weight (KH, KW, 1, C) with a PER-CHANNEL exponent vector.

    This framework's extension beyond the reference's per-tensor contract
    (the reference has no NITI depthwise op at all — its MobileNets train
    fp32, demo/MobilenetV2Utils.cpp). Motivation (r4 divergence study):
    full-NITI MobileNetV1/V2 fail to learn under per-tensor depthwise
    quantization while dense-conv NITI models train fine; per-channel
    weight scales are the standard fix for depthwise-separable
    quantization. Same Xavier draw and per-scale formula as
    niti_xavier_int8, applied per channel:

        range_c = max|w[..., c]|
        exp_c   = ceil(log2(range_c)) - 7       (int32 vector, (C,))
        data_c  = round(w[..., c] / range_c * 127)

    Each channel's range is floored at max_c(range)/2^cap with
    cap = ops.depthwise.pc_shift_cap(kh*kw), so the exponent SPREAD never
    exceeds the int32-safe accumulator-alignment cap (r4 advisor finding:
    a spread beyond the cap would be silently clipped downstream and
    mis-scale those channels). Quantizing a tiny channel against a
    slightly larger range loses nothing representable.
    """
    kh, kw, one, c = shape_hwio
    assert one == 1, "depthwise weights are (KH, KW, 1, C)"
    from ..ops.depthwise import pc_shift_cap

    fan_in = kh * kw
    fan_out = kh * kw
    std = jnp.sqrt(2.0 / (fan_in + fan_out))
    w = jax.random.normal(key, shape_hwio, jnp.float32) * std
    rng_c = jnp.max(jnp.abs(w), axis=(0, 1, 2))             # (C,)
    rng_c = jnp.maximum(rng_c, jnp.max(rng_c) / (2.0 ** pc_shift_cap(kh * kw)))
    exp_c = (jnp.ceil(jnp.log2(rng_c)) - 7).astype(jnp.int32)
    data = jnp.round(w / rng_c[None, None, None, :] * 127.0).astype(jnp.int8)
    return QTensor(data, exp_c)
