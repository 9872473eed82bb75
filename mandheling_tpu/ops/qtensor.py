"""QTensor: the (int8 data, power-of-two exponent) pair that NITI threads
through every layer.

Reference concept: every activation/weight travels as `int8 tensor + int8
scale exponent` ("ascale"/"wscale"), real value = data * 2^exp
(`tools/train/source/nn/NN.cpp:1182-1207`, SURVEY.md section 0).

On TPU the exponent is a traced int32 scalar (0-d array) flowing through the
jitted step; storage dtype is int8-compatible but we keep int32 in flight to
avoid pointless converts.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class QTensor(NamedTuple):
    """int8 data with a per-tensor power-of-two scale exponent."""

    data: jax.Array  # int8
    exp: jax.Array   # int32 scalar; value = data * 2^exp

    @property
    def shape(self):
        return self.data.shape

    @property
    def dtype(self):
        return self.data.dtype

    def dequantize(self) -> jax.Array:
        """Real-valued view: data * 2^exp (float32)."""
        return self.data.astype(jnp.float32) * jnp.exp2(
            self.exp.astype(jnp.float32)
        )

    def astuple(self):
        return (self.data, self.exp)


def quantize_input(x: jax.Array) -> QTensor:
    """Quantize a float batch the way the reference training loop quantizes
    MNIST inputs (`demo/MnistUtils.cpp:84-96`):

        Y       = (x - mean) / std           (per-batch standardization)
        range   = max|Y|
        ascale  = ceil(log2(range)) - 7
        data    = round(Y / range * 127)

    Note: the reference computes `ceil(ln(range))` via MNN `_Log` (natural
    log); for the std-normal ranges seen here both give the same exponent.
    We use log2, which is the NITI-correct scale (value ~= data * 2^ascale).
    """
    x = x.astype(jnp.float32)
    mean = jnp.mean(x)
    std = jnp.sqrt(jnp.sum((x - mean) ** 2) / x.size)
    y = (x - mean) / std
    rng = jnp.max(jnp.abs(y))
    ascale = jnp.ceil(jnp.log2(rng)).astype(jnp.int32) - 7
    data = jnp.round(y / rng * 127.0).astype(jnp.int8)
    return QTensor(data, ascale)


def quantize_weights(w: jax.Array) -> QTensor:
    """Max-abs power-of-two quantization used by the NITI initializer
    (`nn/Distributions.cpp:26-51`): scale max|w| to +/-127,
    exponent = ceil(log2(range)) - 7.
    """
    w = w.astype(jnp.float32)
    rng = jnp.max(jnp.abs(w))
    exp = jnp.ceil(jnp.log2(rng)).astype(jnp.int32) - 7
    data = jnp.round(w / rng * 127.0).astype(jnp.int8)
    return QTensor(data, exp)
