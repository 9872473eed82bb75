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
