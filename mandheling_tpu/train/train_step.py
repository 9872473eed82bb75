"""The jitted NITI training step — forward + explicit backward + integer
update in ONE XLA program.

This is the TPU-native equivalent of the reference's whole per-iteration
pipeline: Express graph build + ComputeCache execute + DSP graph flush +
NITI_SGD step (`express/Executor.cpp:304-370`, `CPUBackend.cpp:341-452`,
`optimizer/NITI_SGD.hpp:20-57`). The reference pays one FastRPC round trip
per iteration on a cached prepared DSP graph; here the analog is one
dispatch of a cached jitted XLA program with donated parameter buffers.

Input quantization (standardize + max-abs int8, `demo/MnistUtils.cpp:84-96`)
runs inside the same program. With `axis_name` set, batch statistics and
every range estimate are computed with cross-replica collectives so
data-parallel training is bit-identical to single-chip (see ops/conv.py).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..nn.module import Sequential
from ..ops.loss import loss_cross_entropy_float, loss_grad_int8
from ..ops.qtensor import QTensor
from .optim import niti_sgd_update


def det_psum_f32(v: jax.Array, axis_name: str) -> jax.Array:
    """Order-deterministic float sum across an axis: all_gather the
    per-replica partials and sum the gathered vector in axis order.

    A plain float `psum`'s reduction order is backend-dependent (Gloo's
    multi-host allreduce associates differently than single-process XLA),
    which breaks the bit-identity contract through the batch-statistics ->
    input-quantization path. Gathering first costs nothing at scalar size
    and makes every replica — single- or multi-process — sum the same
    partials in the same order. Integer psums don't need this (associative
    exactly)."""
    return jnp.sum(jax.lax.all_gather(v, axis_name))


def quantize_batch(
    x: jax.Array, axis_name: Optional[str] = None
) -> Tuple[jax.Array, jax.Array]:
    """Standardize + quantize a float batch exactly like the reference
    training loop (MnistUtils.cpp:84-96). With `axis_name`, statistics are
    over the global batch (deterministic-order sums / pmax) so sharded ==
    single-chip, bit for bit, regardless of process count."""
    x = x.astype(jnp.float32)
    n = jnp.float32(x.size)
    # one fused pass for both moments (E[x^2] - E[x]^2); a dependent
    # (x - mean)^2 second pass would double the HBM traffic
    s = jnp.sum(x)
    s2 = jnp.sum(x * x)
    if axis_name is not None:
        n = jax.lax.psum(n, axis_name)
        s = det_psum_f32(s, axis_name)
        s2 = det_psum_f32(s2, axis_name)
    mean = s / n
    std = jnp.sqrt(jnp.maximum(s2 / n - mean * mean, 0.0))
    # algebraically y/rng == (x-mean)/max|x-mean| and rng == r/std: keeping
    # the normalized y out of HBM halves this stage's traffic (the scalar
    # folding changes f32 rounding by at most 1 ulp vs the two-step form)
    r = jnp.max(jnp.abs(x - mean))
    if axis_name is not None:
        r = jax.lax.pmax(r, axis_name)
    ascale = jnp.ceil(jnp.log2(r / std)).astype(jnp.int32) - 7
    data = jnp.round((x - mean) * (127.0 / r)).astype(jnp.int8)
    return data, ascale


def make_train_step(model: Sequential, axis_name: Optional[str] = None):
    """Returns train_step(params, x_float, onehot) -> (new_params, loss).

    `onehot` must already be padded to the model's logit width (e.g. 10
    classes in 12 logit channels for the NITI LeNet)."""

    def train_step(params, x, onehot):
        data, ascale = quantize_batch(x, axis_name)
        q = QTensor(data, ascale)
        logits, residuals = model.fwd(params, q, axis_name)
        loss = loss_cross_entropy_float(logits.data, logits.exp, onehot)
        if axis_name is not None:
            loss = det_psum_f32(loss, axis_name) / jax.lax.psum(
                jnp.float32(1), axis_name
            )
        g = loss_grad_int8(logits.data, logits.exp, onehot)
        _, grads = model.bwd(params, residuals, g, axis_name,
                             need_input_grad=False)
        new_params = niti_sgd_update(params, grads)
        return new_params, loss

    return train_step


def make_eval_step(model: Sequential, num_classes: int = 10,
                   axis_name: Optional[str] = None):
    """Returns eval_step(params, x_float, labels) -> correct-count (int32).

    Mirrors the reference test loop (MnistUtils.cpp:152-183): same int8
    forward, argmax over the first `num_classes` logit channels."""

    def eval_step(params, x, labels):
        data, ascale = quantize_batch(x, axis_name)
        logits, _ = model.fwd(params, QTensor(data, ascale), axis_name)
        pred = jnp.argmax(logits.data[:, :num_classes], axis=-1)
        correct = jnp.sum((pred == labels).astype(jnp.int32))
        if axis_name is not None:
            correct = jax.lax.psum(correct, axis_name)
        return correct

    return eval_step


def jit_train_step(model: Sequential):
    """Single-chip jitted step with donated params (buffer reuse — the
    analog of the reference's execute-only cached DSP graph)."""
    return jax.jit(make_train_step(model), donate_argnums=(0,))


def jit_eval_step(model: Sequential, num_classes: int = 10):
    return jax.jit(make_eval_step(model, num_classes))
