"""Data-parallel NITI training over a device mesh via shard_map.

Numerics contract: sharded training is BIT-IDENTICAL to single-chip.
- forward requant shifts come from a cross-replica `pmax` of |acc|
  (ops/conv.py `_maybe_pmax`),
- weight-gradient int32 accumulators are `psum`-allreduced BEFORE the single
  global range-estimate + pseudo-stochastic shift (the exact int32-pre-shift
  strategy, SURVEY.md section 7 "quantized gradient allreduce"),
- batch statistics for input quantization are global (train_step.py).

The integer weight update then applies the identical int8 delta on every
replica, so parameters never diverge — there is no parameter re-sync.
Gradients cross the interconnect as int32 accumulators; the cheaper
exponent-aligned int8 allreduce (EQuARX-style, PAPERS.md) is a planned
alternative for bandwidth-bound scales.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..nn.module import Sequential
from ..train.train_step import make_eval_step, make_train_step
from .mesh import DATA_AXIS


def make_dp_train_step(model: Sequential, mesh: Mesh, donate: bool = True):
    """Jitted data-parallel train step.

    Args are (params, x, onehot) with x/onehot sharded on the batch dim over
    the 'data' axis and params replicated. Returns (new_params, loss)."""
    step = make_train_step(model, axis_name=DATA_AXIS)
    sharded = shard_map(
        step,
        mesh=mesh,
        in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,) if donate else ())


def make_dp_eval_step(model: Sequential, mesh: Mesh, num_classes: int = 10):
    step = make_eval_step(model, num_classes, axis_name=DATA_AXIS)
    sharded = shard_map(
        step,
        mesh=mesh,
        in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(sharded)


def shard_batch(mesh: Mesh, *arrays):
    """Place host arrays with batch-dim sharding over the data axis."""
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    return tuple(jax.device_put(a, sharding) for a in arrays)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)
