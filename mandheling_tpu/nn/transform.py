"""Post-hoc NITI model-tree transforms.

The reference's Transformer rewrites a loaded inference graph into a
trainable one (`tools/train/source/transformer/Transformer.cpp:69`);
the analog here operates on an already-built NITI layer tree + params —
so it composes with every import leg (ONNX/TFLite/TF/Caffe/torch) and
with hand-built models alike.

`dw_to_per_channel` upgrades depthwise layers to per-channel weight
exponents — one half of the measured integer-MobileNet training recipe
(DIVERGENCE_r05.json: per-channel dw + fgrad margins 0/0; imported
per-tensor MobileNets would otherwise hit the r4 chance-accuracy
blocker when fine-tuned integer-only).
"""

from __future__ import annotations

from typing import List, Tuple

import jax.numpy as jnp

from ..ops.qtensor import QTensor
from .blocks import NITIDepthwiseConv2D, ParallelAdd, ParallelConcat, ResidualBlock
from .module import Sequential


def _requant_dw_per_channel(w: QTensor, kh: int, kw: int) -> QTensor:
    """Per-tensor (data, exp scalar) -> per-channel (data, exp vector)
    depthwise weight, VALUE-preserving: data_c = round(value / 2^exp_c),
    error <= 2^exp_c / 2 per element.

    Deliberately NOT the init convention (round(w/range*127), which may
    rescale a tensor by up to 2x — a harmless uniform gain per tensor at
    init, but a per-CHANNEL gain would change an imported model's
    function). exp_c = ceil(log2(range_c)) - 7 guarantees
    |value|/2^exp_c <= 127, so no clipping occurs; the range floor
    bounds the exponent spread at pc_shift_cap (int32-safe downstream
    alignment)."""
    from ..ops.depthwise import pc_shift_cap

    wf = w.data.astype(jnp.float32) * jnp.exp2(w.exp.astype(jnp.float32))
    rng_c = jnp.max(jnp.abs(wf), axis=(0, 1, 2))                    # (C,)
    rng_c = jnp.maximum(rng_c, jnp.max(rng_c) / (2.0 ** pc_shift_cap(kh * kw)))
    rng_c = jnp.maximum(rng_c, jnp.finfo(jnp.float32).tiny)
    exp_c = (jnp.ceil(jnp.log2(rng_c)) - 7).astype(jnp.int32)
    # |value|/2^exp_c <= 128 (exactly 128 when range_c is a power of
    # two) — clip to the symmetric int8 rail like NITI_int8_clip
    data = jnp.clip(jnp.round(
        wf / jnp.exp2(exp_c.astype(jnp.float32))[None, None, None, :]
    ), -127, 127).astype(jnp.int8)
    return QTensor(data, exp_c)


def dw_to_per_channel(model, params) -> Tuple[object, List]:
    """Flip every per-tensor NITIDepthwiseConv2D in the tree to
    per_channel=True and re-quantize its weight per channel. Mutates the
    layer objects in place (they carry no tensors); returns
    (model, new_params)."""

    def walk(m, p):
        if isinstance(m, Sequential):
            return [walk(sub, sp) for sub, sp in zip(m.layers, p)]
        if isinstance(m, ResidualBlock):
            return walk(m.branch, p)
        if isinstance(m, (ParallelAdd, ParallelConcat)):
            return [walk(br, bp) for br, bp in zip(m.branches, p)]
        if isinstance(m, NITIDepthwiseConv2D):
            w: QTensor = p["w"]
            if not m.per_channel and w.exp.ndim == 0:
                m.per_channel = True
                kh, kw = m.kernel
                return {**p, "w": _requant_dw_per_channel(w, kh, kw)}
            return p
        return p

    return model, walk(model, params)
