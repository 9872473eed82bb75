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

    Pure-int8 elementwise (the cap scalar is 0..127 so it narrows to int8
    losslessly): no int32 widening in the hot path.
    """
    cap = relu6_cap(exp).astype(jnp.int8)
    return jnp.clip(x, jnp.int8(0), cap)


def relu6_grad(x: jax.Array, exp: jax.Array, gy: jax.Array) -> jax.Array:
    """Pass gy where the forward input was strictly inside (0, cap).

    cap == 127 means the 6.0 bound is NOT representable at this exponent
    (6*2^-exp > 127, i.e. every int8 value is below 6.0) — the clamp was a
    no-op rail saturation, not a relu6 clip, so x == 127 still has true
    derivative 1 and must pass gradient (otherwise saturated units could
    never recover, unlike plain NITIRelu; r4 advisor finding)."""
    cap = relu6_cap(exp).astype(jnp.int8)
    upper = (x < cap) | (cap == jnp.int8(127))
    return jnp.where((x > jnp.int8(0)) & upper, gy, jnp.int8(0))


def relu6_grad_from_output(y: jax.Array, exp: jax.Array,
                           gy: jax.Array) -> jax.Array:
    """relu6 backward masked by the forward OUTPUT instead of the input:
    y == 0 iff x <= 0 and y == cap iff x >= cap, so (0 < y < cap) is
    EXACTLY the reference input-mask semantics — but the layer then keeps
    only its own output alive for the backward (which the next layer's
    residual already holds), instead of pinning the pre-clip tensor too.
    Measured: the pre-clip liveness was what pushed the MNv2 step from
    23.7k to 17.7k samples/s (layout/copy blowup around the extra live
    int8 tensors at every relu6 site).

    Same cap == 127 escape as relu6_grad: a saturated rail is not a relu6
    clip, so y == 127 passes gradient when 6.0 is unrepresentable."""
    cap = relu6_cap(exp).astype(jnp.int8)
    upper = (y < cap) | (cap == jnp.int8(127))
    return jnp.where((y > jnp.int8(0)) & upper, gy, jnp.int8(0))
