"""Float loss functions — the reference's Loss.{hpp,cpp} set.

Reference (`tools/train/source/optimizer/Loss.cpp`):
_CrossEntropy, _KLDivergence, _MSE, _MAE, _Hinge, and
_DistillLoss(student, teacher, onehot, T, alpha) at :68-84 =
alpha * T^2 * KL(softmax(student/T) || softmax(teacher/T))
+ (1-alpha) * CE(softmax(student), onehot).

The integer NITI loss lives in ops/loss.py; these are the fp32 training
path's losses (MnistTrain, MobileNetV2 transfer, DistillTrainQuant).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cross_entropy(probs: jax.Array, onehot: jax.Array) -> jax.Array:
    """-mean(sum(onehot * log(p))) over the batch (Loss.cpp _CrossEntropy)."""
    return -jnp.mean(jnp.sum(onehot * jnp.log(jnp.maximum(probs, 1e-20)), -1))


def cross_entropy_with_logits(logits: jax.Array, onehot: jax.Array) -> jax.Array:
    return -jnp.mean(jnp.sum(onehot * jax.nn.log_softmax(logits), -1))


def kl_divergence(pred: jax.Array, target: jax.Array) -> jax.Array:
    """mean KL(target || pred) over the batch for probability inputs."""
    t = jnp.maximum(target, 1e-20)
    return jnp.mean(jnp.sum(target * (jnp.log(t) - jnp.log(jnp.maximum(pred, 1e-20))), -1))


def mse(pred: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.mean(jnp.sum((pred - target) ** 2, -1))


def mae(pred: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.mean(jnp.sum(jnp.abs(pred - target), -1))


def hinge(pred: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.mean(jnp.sum(jnp.maximum(0.0, 1.0 - pred * target), -1))


def distill_loss(
    student_logits: jax.Array,
    teacher_logits: jax.Array,
    onehot: jax.Array,
    temperature: float = 20.0,
    alpha: float = 0.9,
) -> jax.Array:
    """Knowledge-distillation loss, exactly Loss.cpp:68-84."""
    soft_targets = jax.nn.softmax(teacher_logits / temperature, -1)
    student_soft = jax.nn.softmax(student_logits / temperature, -1)
    loss1 = temperature * temperature * kl_divergence(student_soft, soft_targets)
    loss2 = cross_entropy(jax.nn.softmax(student_logits, -1), onehot)
    return alpha * loss1 + (1.0 - alpha) * loss2
