"""Tensor parallelism: output-channel-sharded NITI conv layers.

The big FC-as-1x1-conv layers (832->500->12 in the LeNet; 1280-wide heads in
MobileNet) shard their output channels across the mesh's 'model' axis:

- forward: each shard computes its OC slice of the int32 accumulator; the
  requant shift comes from a pmax over BOTH mesh axes (the NITI range
  estimate is per-tensor global), then the int8 slices all_gather along ICI.
- backward dx: each shard's deconv contributes the partial sum over its OC
  slice; the int32 partials psum over 'model' BEFORE the single bw-7 shift.
- backward dw: each shard keeps its OC slice of the filter gradient (psum
  over 'data' only); the range estimate is a global pmax so every shard
  applies the same shift. The integer update then happens shard-locally.

All of this keeps TP+DP training bit-identical to single-chip (same
invariant as pure DP, tests/test_tp.py).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..nn.layers import NITIConv2D
from ..nn.module import Sequential
from ..ops import numerics
from ..ops.conv import conv2d_filter_grad_acc, conv2d_input_grad_acc, conv2d_int8_acc
from ..ops.qtensor import QTensor
from .mesh import DATA_AXIS, MODEL_AXIS


class TPConv2D(NITIConv2D):
    """NITIConv2D with output channels sharded over the 'model' mesh axis.

    Inside shard_map, params hold the LOCAL OC slice; out-of-mesh (model
    axis absent / size 1) it degrades to the dense layer."""

    def __init__(self, *args, model_axis: str = MODEL_AXIS, **kwargs):
        super().__init__(*args, **kwargs)
        self.model_axis = model_axis

    def fwd(self, params, q: QTensor, axis_name=None):
        w: QTensor = params["w"]
        acc = conv2d_int8_acc(q.data, w.data, self.stride, self.padding)
        m = jnp.max(jnp.abs(acc))
        axes = _axes(axis_name, self.model_axis)
        if axes:
            m = jax.lax.pmax(m, axes)
        bw = numerics.range_estimate_from_max(m)
        exp_in = q.exp.astype(jnp.int32) + w.exp.astype(jnp.int32)
        y, e = numerics.requant_forward_from_bw(acc, exp_in, bw)
        if _in_mesh(self.model_axis):
            y = jax.lax.all_gather(y, self.model_axis, axis=-1, tiled=True)
        return QTensor(y, e), q.data

    def bwd(self, params, res, gy, axis_name=None):
        x = res
        w: QTensor = params["w"]
        oc_local = w.data.shape[-1]
        if _in_mesh(self.model_axis):
            idx = jax.lax.axis_index(self.model_axis)
            gy_local = jax.lax.dynamic_slice_in_dim(
                gy, idx * oc_local, oc_local, axis=-1
            )
        else:
            gy_local = gy

        # dx: partial over the local OC slice -> psum int32 -> one shift
        acc_dx = conv2d_input_grad_acc(
            gy_local, w.data, (x.shape[1], x.shape[2]), self.stride, self.padding
        )
        if _in_mesh(self.model_axis):
            acc_dx = jax.lax.psum(acc_dx, self.model_axis)
        m = jnp.max(jnp.abs(acc_dx))
        if axis_name is not None:
            m = jax.lax.pmax(m, axis_name)
        bw = numerics.range_estimate_from_max(m)
        gx, _ = numerics.requant_forward_from_bw(acc_dx, jnp.int32(0), bw)

        # dw: local OC slice; global (data-summed) accumulation + global bw
        acc_dw = conv2d_filter_grad_acc(
            x, gy_local, self.kernel, self.stride, self.padding
        )
        if axis_name is not None:
            acc_dw = jax.lax.psum(acc_dw, axis_name)
        mw = jnp.max(jnp.abs(acc_dw))
        axes = _axes(axis_name, self.model_axis)
        if axes:
            mw = jax.lax.pmax(mw, axes)
        bww = numerics.range_estimate_from_max(mw)
        gw = numerics.requant_grad_from_bw(acc_dw, bww, margin=2)
        return gx, {"w": QTensor(gw, jnp.int32(0))}


def _in_mesh(axis: str) -> bool:
    """True when tracing inside a shard_map that binds `axis`.

    Only NameError (the axis is simply not bound in this trace) means "not
    in a TP mesh"; any other failure is a real bug and must propagate —
    swallowing it would silently degrade TP to dense replication."""
    try:
        return jax.lax.axis_size(axis) > 1
    except NameError:
        return False


def _axes(data_axis: Optional[str], model_axis: str):
    axes = []
    if data_axis is not None:
        axes.append(data_axis)
    if _in_mesh(model_axis):
        axes.append(model_axis)
    return tuple(axes) if axes else None


def tp_param_specs(model: Sequential, mesh: Mesh):
    """PartitionSpec pytree for a model containing TPConv2D layers: their
    weights shard OC over 'model'; everything else replicates."""
    specs = []
    for layer in model.layers:
        if isinstance(layer, TPConv2D):
            specs.append({"w": QTensor(P(None, None, None, MODEL_AXIS), P())})
        else:
            # replicate: match the layer's param structure with P()
            params = layer.init(jax.random.PRNGKey(0))
            specs.append(jax.tree.map(lambda _: P(), params))
    return specs


def shard_params(mesh: Mesh, model: Sequential, params):
    """Place initialized params with TP shardings on the mesh."""
    specs = tp_param_specs(model, mesh)
    return jax.tree.map(
        lambda p, s: jax.device_put(p, NamedSharding(mesh, s)), params, specs
    )


def make_tp_train_step(model: Sequential, mesh: Mesh, donate: bool = True):
    """DP x TP train step over a ('data', 'model') mesh."""
    from jax import shard_map

    from ..train.train_step import make_train_step

    step = make_train_step(model, axis_name=DATA_AXIS)
    specs = tp_param_specs(model, mesh)
    sharded = shard_map(
        step,
        mesh=mesh,
        in_specs=(specs, P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=(specs, P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,) if donate else ())


def lenet_niti_tp() -> Sequential:
    """Flagship LeNet with TP-sharded FC layers (832->500 and 500->12...
    500 shards over the model axis; the 12-logit head stays replicated so
    logits are full on every shard for the loss)."""
    from ..nn.layers import (
        Flatten,
        NITIMaxPool,
        NITIRelu,
        SqueezeLogits,
    )

    return Sequential(
        [
            NITIConv2D(1, 20, (5, 5)),
            NITIRelu(),
            NITIMaxPool((2, 2), (2, 2)),
            NITIConv2D(20, 52, (5, 5)),
            NITIRelu(),
            NITIMaxPool((2, 2), (2, 2)),
            Flatten(),
            TPConv2D(832, 500, (1, 1)),
            NITIRelu(),
            NITIConv2D(500, 12, (1, 1)),
            SqueezeLogits(),
        ]
    )
