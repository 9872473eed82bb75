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
