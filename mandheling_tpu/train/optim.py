"""Optimizers: integer NITI-SGD, float SGD with momentum/weight-decay, ADAM,
and the reference's learning-rate schedules.

- NITI-SGD (`tools/train/source/optimizer/NITI_SGD.hpp:20-57`): the update is
  plain integer subtraction `w <- clip(w - g)` with NO learning rate —
  gradients arrive pre-scaled by their power-of-two shifts. The int8
  subtraction saturates to [-127, 127] via NITI_int8_clip
  (source/backend/cpu/BinaryUtils.hpp:278-299). Weight exponents are not
  updated (the reference's grad rules emit scalar-0 exponent grads).
- SGD (`optimizer/SGD.cpp:60-100`): v <- m*v + lr*(g + wd*w); w <- w - v.
- LR schedules (`optimizer/LearningRateScheduler.hpp:18-25`).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from ..ops.numerics import int8_clip
from ..ops.qtensor import QTensor


def _is_qtensor(x) -> bool:
    return isinstance(x, QTensor)


def niti_sgd_update(params: Any, grads: Any) -> Any:
    """w <- clip_int8(w - g) on every QTensor leaf; exponents unchanged."""

    def update(p, g):
        if _is_qtensor(p):
            new = int8_clip(p.data.astype(jnp.int32) - g.data.astype(jnp.int32))
            return QTensor(new.astype(jnp.int8), p.exp)
        return p

    return jax.tree.map(update, params, grads, is_leaf=_is_qtensor)


def sgd_init(params: Any) -> Any:
    return jax.tree.map(jnp.zeros_like, params)


def sgd_update(params, grads, velocity, lr, momentum=0.9, weight_decay=5e-4):
    """Reference float SGD: v <- m*v + lr*(g + wd*w); w <- w - v
    (optimizer/SGD.cpp:79-100 builds exactly this expression graph)."""

    def vel(v, g, w):
        return momentum * v + lr * (g + weight_decay * w)

    velocity = jax.tree.map(vel, velocity, grads, params)
    params = jax.tree.map(lambda w, v: w - v, params, velocity)
    return params, velocity


def adam_init(params: Any):
    return {
        "m": jax.tree.map(jnp.zeros_like, params),
        "v": jax.tree.map(jnp.zeros_like, params),
        "t": jnp.int32(0),
    }


def adam_update(params, grads, state, lr, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.0):
    """ADAM with the reference's weight-decay-into-gradient convention
    (optimizer/ADAM.cpp)."""
    t = state["t"] + 1
    g = jax.tree.map(lambda gi, w: gi + weight_decay * w, grads, params)
    m = jax.tree.map(lambda mi, gi: b1 * mi + (1 - b1) * gi, state["m"], g)
    v = jax.tree.map(lambda vi, gi: b2 * vi + (1 - b2) * gi * gi, state["v"], g)
    tf = t.astype(jnp.float32)
    mhat = jax.tree.map(lambda mi: mi / (1 - b1**tf), m)
    vhat = jax.tree.map(lambda vi: vi / (1 - b2**tf), v)
    params = jax.tree.map(
        lambda w, mh, vh: w - lr * mh / (jnp.sqrt(vh) + eps), params, mhat, vhat
    )
    return params, {"m": m, "v": v, "t": t}


# --- LR schedules (LearningRateScheduler.hpp:18-25) -----------------------


def lr_inv(base_lr: float, step, gamma: float = 1e-4, power: float = 0.75):
    """inv: lr = base * (1 + gamma*step)^(-power) — the MNIST demos' schedule
    (MnistUtils.cpp:124). NITI-SGD ignores it; logged for parity."""
    return base_lr * (1.0 + gamma * jnp.asarray(step, jnp.float32)) ** (-power)


def lr_exp(base_lr: float, step, gamma: float = 0.999):
    return base_lr * gamma ** jnp.asarray(step, jnp.float32)


def lr_multistep(base_lr: float, step, milestones, gamma: float = 0.1):
    step = jnp.asarray(step)
    k = sum((step >= m).astype(jnp.float32) for m in milestones)
    return base_lr * gamma**k
