"""Fake-quant QAT conv — the reference's `NN::ConvInt8` path (MnistInt8Train).

Reference: `tools/train/source/nn/NN.cpp:560-780` (`ConvInt8Module`):
- weights: per-output-channel symmetric fake quant,
  scale = max(|w|, 1e-6) / clamp, w' = clamp(round(w/scale)) * scale,
  straight-through estimator (the `+ _ZeroGrad(w)` trick).
- activations (input AND output): per-tensor asymmetric fake quant with
  min/max observers updated by moving-average (momentum 0.99) or maximum
  (`updateParameter`, NN.cpp:666-680; `fakeQuantFeatureWithMinMax`:600-660).
- clamp value = 2^(bits-1) - 1 (e.g. 127 for 8 bits).

Implemented functionally: observer state (min/max) is part of the train
state and returned updated; gradients flow via jax STE
(`x + stop_gradient(q(x) - x)`), which is exactly the reference's
cast-breaks-grad + ZeroGrad construction.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def _ste(x: jax.Array, q: jax.Array) -> jax.Array:
    return x + jax.lax.stop_gradient(q - x)


def fake_quant_weight_perchannel(w: jax.Array, clamp: float = 127.0) -> jax.Array:
    """HWIO weights, per-OC symmetric fake quant with STE."""
    scale = jnp.maximum(jnp.max(jnp.abs(w), axis=(0, 1, 2), keepdims=True), 1e-6) / clamp
    q = jnp.clip(jnp.round(w / scale), -clamp, clamp) * scale
    return _ste(w, q)


def compute_scale_zeropoint(
    mn: jax.Array, mx: jax.Array, clamp: float = 127.0
) -> Tuple[jax.Array, jax.Array]:
    """Asymmetric per-tensor scale/zero-point from observed min/max
    (NN.cpp `computeScaleAndZeroPoint`: nudged so 0 is representable)."""
    mn = jnp.minimum(mn, 0.0)
    mx = jnp.maximum(mx, 0.0)
    scale = jnp.maximum(mx - mn, 1e-6) / (2.0 * clamp)
    zp = jnp.round(-clamp - mn / scale)
    zp = jnp.clip(zp, -clamp, clamp)
    return scale, zp


def fake_quant_feature(
    x: jax.Array, mn: jax.Array, mx: jax.Array, clamp: float = 127.0
) -> jax.Array:
    scale, zp = compute_scale_zeropoint(mn, mx, clamp)
    q = jnp.clip(jnp.round(x / scale + zp), -clamp, clamp)
    return _ste(x, (q - zp) * scale)


def update_observer(
    old: jax.Array, new: jax.Array, initialized: jax.Array,
    method: str = "moving_average", momentum: float = 0.99
) -> jax.Array:
    """NN.cpp:666-680: MovingAverage or Maximum observer update. The first
    observation is taken directly (`updateParameter(nullptr, v) = v`)."""
    new = jax.lax.stop_gradient(new)
    if method == "moving_average":
        blended = old * momentum + new * (1.0 - momentum)
    elif method == "maximum":
        blended = jnp.maximum(old, new)
    else:
        raise ValueError(method)
    return jnp.where(initialized > 0, blended, new)


def qat_conv_init(key, shape_hwio, bits: int = 8) -> Dict:
    kh, kw, ic, oc = shape_hwio
    fan_in = ic * kh * kw
    fan_out = oc * kh * kw
    std = jnp.sqrt(2.0 / (fan_in + fan_out))
    return {
        "w": jax.random.normal(key, shape_hwio, jnp.float32) * std,
        "b": jnp.zeros((oc,), jnp.float32),
    }


def qat_observer_init() -> Dict:
    return {
        "in_min": jnp.float32(0.0),
        "in_max": jnp.float32(0.0),
        "out_min": jnp.float32(0.0),
        "out_max": jnp.float32(0.0),
        "initialized": jnp.float32(0.0),
    }


def qat_conv_apply(
    params: Dict,
    obs: Dict,
    x: jax.Array,
    stride=(1, 1),
    padding="VALID",
    bits: int = 8,
    activation=None,
    training: bool = True,
) -> Tuple[jax.Array, Dict]:
    """Fake-quant conv forward -> (y, updated observers)."""
    clamp = float(2 ** (bits - 1) - 1)
    w = fake_quant_weight_perchannel(params["w"], clamp)

    new_obs = dict(obs)
    init = obs["initialized"]
    if training:
        new_obs["in_min"] = update_observer(obs["in_min"], jnp.min(x), init)
        new_obs["in_max"] = update_observer(obs["in_max"], jnp.max(x), init)
    x = fake_quant_feature(x, new_obs["in_min"], new_obs["in_max"], clamp)

    y = (
        jax.lax.conv_general_dilated(
            x, w, stride, padding, dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        + params["b"]
    )
    if activation is not None:
        y = activation(y)
    if training:
        new_obs["out_min"] = update_observer(obs["out_min"], jnp.min(y), init)
        new_obs["out_max"] = update_observer(obs["out_max"], jnp.max(y), init)
        new_obs["initialized"] = jnp.float32(1.0)
    y = fake_quant_feature(y, new_obs["out_min"], new_obs["out_max"], clamp)
    return y, new_obs
