"""NITI int8 ReLU forward/backward.

Reference: `NITI_CPURelu_Int8.cpp` (forward: max(x, 0), exponent passthrough)
and `NITI_CPUReluGrad_Int8.cpp:28-62` (backward: pass gy where the forward
*input* was > 0, else 0).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def relu(x: jax.Array) -> jax.Array:
    return jnp.maximum(x, jnp.int8(0))


def relu_grad(x: jax.Array, gy: jax.Array) -> jax.Array:
    return jnp.where(x > 0, gy, jnp.int8(0))


def relu6_cap(exp: jax.Array) -> jax.Array:
    """int32 data cap for an int8 tensor with exponent `exp` such that
    value = data * 2^exp <= 6.0: cap = 6 * 2^(-exp), saturated to the int8
    rail. exp <= -5 -> 127 (no clip); exp >= 3 -> 0 (6 < 2^exp kills all).
    """
    e = exp.astype(jnp.int32)
    lo = jnp.minimum(jnp.int32(6) << jnp.clip(-e, 0, 5), jnp.int32(127))
    hi = jnp.int32(6) >> jnp.clip(e, 0, 31)
    return jnp.where(e <= 0, lo, hi)


def relu6(x: jax.Array, exp: jax.Array) -> jax.Array:
    """Exponent-aware int8 ReLU6: clamp(value, 0, 6.0) in the tensor's own
    power-of-two scale, exponent passthrough.

    The reference's MobileNetV2 is built on _Relu6 (tools/train/source/
    models/MobilenetV2.cpp:67) — the bounded activation is what makes the
    architecture quantization-stable. The reference has no NITI relu6 op
    (its MNv2 demos are fp32/QAT); this is the NITI-contract extension:
    integer compare against the 6*2^(-exp) cap, measured (r4 divergence
    study, tools/probes/mnv2_divergence_probe.py) to break the forward
    exponent-inflation loop that made full-NITI MNv2 training diverge.
    """
    cap = relu6_cap(exp).astype(jnp.int32)
    xi = x.astype(jnp.int32)
    return jnp.clip(xi, 0, cap).astype(jnp.int8)


def relu6_grad(x: jax.Array, exp: jax.Array, gy: jax.Array) -> jax.Array:
    """Pass gy where the forward input was strictly inside (0, cap)."""
    cap = relu6_cap(exp).astype(jnp.int32)
    xi = x.astype(jnp.int32)
    return jnp.where((xi > 0) & (xi < cap), gy, jnp.int8(0))
