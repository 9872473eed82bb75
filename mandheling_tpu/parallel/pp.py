"""Pipeline parallelism: GPipe-style stage pipelining over a 'pipe' mesh axis.

The reference's only inter-engine concurrency is its CPU||DSP co-scheduling:
the weight-gradient subgraph runs on the DSP on a separate thread while the
CPU computes other ops, joined per iteration (`CPUBackend.cpp:209-263,
328-346`, SURVEY.md section 2.10), plus a batch-split gradient strategy
(`NITI_DSPGradientSplitBatchConv_Int8.cpp`). The TPU-native generalization of
both is pipeline parallelism: the layer stack is sharded across devices on a
'pipe' mesh axis, microbatches stream through the stages (GPipe schedule),
and each stage's weight-gradient work overlaps other stages' forward/backward
compute — with the microbatch split playing exactly the reference's
split-batch role: per-stage int32 gradient accumulators are summed across
microbatches and requantized with ONE global per-tensor shift at the end.

Numerics:
- With n_microbatches == 1 the pipeline is BIT-IDENTICAL to single-chip
  execution of the same layer stack (every range estimate sees the full
  batch) — the property the tests assert.
- With n_microbatches > 1 the forward/input-grad range estimates are
  per-microbatch (the analog of the reference's split-batch gradients);
  filter gradients remain exact int32 sums over the whole batch before the
  single shift.
- Composes with data parallelism: a ('data', 'pipe') mesh threads pmax/psum
  over the data axis through every range estimate exactly like
  parallel/sharded_step.py.

Everything (forward schedule, loss, backward schedule, integer update) traces
into ONE jitted XLA program; stage hops are `lax.ppermute` over ICI.

The pipelined model is a homogeneous stack of NITI blocks
(conv C->C + relu), the structure the reference's NITI models repeat
(`demo/mnistTrain.cpp:132-158`): with kernel (1,1) and 1x1 spatial input the
stack is an integer MLP whose blocks are MXU matmuls.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..nn.init import niti_xavier_int8
from ..ops import conv as conv_ops
from ..ops import numerics
from ..ops import relu as relu_ops
from ..ops.loss import loss_cross_entropy_float, loss_grad_int8
from ..ops.numerics import int8_clip
from ..ops.qtensor import QTensor
from ..train.train_step import quantize_batch
from .mesh import DATA_AXIS

PIPE_AXIS = "pipe"


def pipe_mesh(n_stages: int, n_data: int = 1) -> Mesh:
    """('data', 'pipe') mesh; pipe on the inner (ICI-neighbor) axis so the
    per-tick activation hops ride nearest-neighbor links."""
    devices = jax.devices()
    need = n_stages * n_data
    assert need <= len(devices), f"need {need} devices, have {len(devices)}"
    grid = np.asarray(devices[:need]).reshape(n_data, n_stages)
    return Mesh(grid, (DATA_AXIS, PIPE_AXIS))


def init_pp_params(
    key: jax.Array, n_blocks: int, channels: int, kernel=(1, 1)
) -> QTensor:
    """Stacked params for n_blocks homogeneous conv blocks: data
    (L, kh, kw, C, C) int8, exp (L,) int32. Leading dim shards on 'pipe'."""
    kh, kw = kernel
    keys = jax.random.split(key, n_blocks)
    qs = [niti_xavier_int8(k, (kh, kw, channels, channels)) for k in keys]
    return QTensor(
        jnp.stack([q.data for q in qs]),
        jnp.stack([jnp.asarray(q.exp, jnp.int32) for q in qs]),
    )


def shard_pp_params(mesh: Mesh, params: QTensor) -> QTensor:
    spec = NamedSharding(mesh, P(PIPE_AXIS))
    return QTensor(
        jax.device_put(params.data, spec), jax.device_put(params.exp, spec)
    )


def quantize_microbatches(
    x: jax.Array, n_microbatches: int
) -> Tuple[jax.Array, jax.Array]:
    """Split a float batch into microbatches and quantize each with the
    reference's input quantization (per-microbatch statistics — with one
    microbatch this is exactly the single-chip quantize_batch)."""
    xs = x.reshape((n_microbatches, -1) + x.shape[1:])
    return jax.vmap(lambda xm: quantize_batch(xm))(xs)


def make_pp_train_step(
    mesh: Mesh,
    n_microbatches: int,
    kernel=(1, 1),
    padding="VALID",
    data_parallel: bool = False,
    donate: bool = True,
):
    """Jitted pipeline-parallel train step over `mesh` (axes ('data','pipe')).

    step(params: QTensor stacked (L,...), x_d (M, mb, h, w, C) int8,
         x_e (M,) int32, onehot (M, mb, C)) -> (new_params, mean loss).

    Requires h == w == 1 at the output (the homogeneous blocks preserve
    spatial dims, so 1x1 inputs — FC pipeline). L % n_stages == 0.
    """
    S = mesh.shape[PIPE_AXIS]
    M = n_microbatches
    kh, kw = kernel
    daxis: Optional[str] = DATA_AXIS if data_parallel else None

    fwd_perm = [(i, i + 1) for i in range(S - 1)]
    bwd_perm = [(i, i - 1) for i in range(1, S)]

    def body(wq_d, wq_e, x_d, x_e, oh):
        # local shapes: wq_d (L/S, kh, kw, C, C) int8, wq_e (L/S,) int32,
        # x_d (M, mb, h, w, C) int8 (replicated on pipe), x_e (M,), oh (M, mb, C)
        s = jax.lax.axis_index(PIPE_AXIS)
        L = wq_d.shape[0]
        act_shape = x_d.shape[1:]
        spatial = act_shape[1:3]
        is_first = s == 0
        is_last = s == S - 1

        def stage_fwd(a_d, a_e):
            xs, ys = [], []
            d, e = a_d, a_e
            for l in range(L):
                x_in = d
                y, y_exp = conv_ops.conv2d_forward(
                    x_in, e, wq_d[l], wq_e[l], (1, 1), padding, daxis
                )
                d, e = relu_ops.relu(y), y_exp
                xs.append(x_in)
                ys.append(y)
            return d, e, jnp.stack(xs), jnp.stack(ys)

        def fwd_tick(carry, t):
            a_d, a_e, res_x, res_y, out_d, out_e = carry
            recv_d = jax.lax.ppermute(a_d, PIPE_AXIS, fwd_perm)
            recv_e = jax.lax.ppermute(a_e, PIPE_AXIS, fwd_perm)
            m = t - s
            valid = (m >= 0) & (m < M)
            midx = jnp.clip(m, 0, M - 1)
            a_d = jnp.where(is_first, x_d[midx], recv_d)
            a_e = jnp.where(is_first, x_e[midx], recv_e)
            d, e, xs, ys = stage_fwd(a_d, a_e)
            slot = jnp.where(valid, midx, M)  # M = scratch slot
            res_x = jax.lax.dynamic_update_index_in_dim(res_x, xs, slot, 0)
            res_y = jax.lax.dynamic_update_index_in_dim(res_y, ys, slot, 0)
            oslot = jnp.where(valid & is_last, midx, M)
            out_d = jax.lax.dynamic_update_index_in_dim(out_d, d, oslot, 0)
            out_e = jax.lax.dynamic_update_index_in_dim(out_e, e, oslot, 0)
            return (d, e, res_x, res_y, out_d, out_e), None

        carry0 = (
            jnp.zeros(act_shape, jnp.int8),
            jnp.int32(0),
            jnp.zeros((M + 1, L) + act_shape, jnp.int8),
            jnp.zeros((M + 1, L) + act_shape, jnp.int8),
            jnp.zeros((M + 1,) + act_shape, jnp.int8),
            jnp.zeros((M + 1,), jnp.int32),
        )
        (_, _, res_x, res_y, out_d, out_e), _ = jax.lax.scan(
            fwd_tick, carry0, jnp.arange(M + S - 1)
        )

        # loss + its int8 gradient, per microbatch (real only on the last
        # stage; SPMD-uniform garbage elsewhere, masked below)
        logits = out_d[:M].reshape(M, act_shape[0], -1)
        losses = jax.vmap(loss_cross_entropy_float)(logits, out_e[:M], oh)
        gy = jax.vmap(loss_grad_int8)(logits, out_e[:M], oh)
        gy = gy.reshape((M,) + act_shape)
        loss = jax.lax.psum(
            jnp.where(is_last, jnp.mean(losses), 0.0), PIPE_AXIS
        )
        if daxis is not None:
            loss = jax.lax.pmean(loss, daxis)

        def bwd_tick(carry, u):
            g, gw_acc = carry
            recv = jax.lax.ppermute(g, PIPE_AXIS, bwd_perm)
            m = u - (S - 1 - s)
            valid = (m >= 0) & (m < M)
            midx = jnp.clip(m, 0, M - 1)
            g = jnp.where(is_last, gy[midx], recv)
            accs = []
            for l in range(L - 1, -1, -1):
                g = relu_ops.relu_grad(res_y[midx, l], g)
                acc = conv_ops.conv2d_filter_grad_acc(
                    res_x[midx, l], g, (kh, kw), (1, 1), padding
                )
                accs.insert(0, jnp.where(valid, acc, 0))
                g = conv_ops.conv2d_input_grad(
                    g, wq_d[l], spatial, (1, 1), padding, daxis
                )
            return (g, gw_acc + jnp.stack(accs)), None

        (_, gw_acc), _ = jax.lax.scan(
            bwd_tick,
            (jnp.zeros(act_shape, jnp.int8), jnp.zeros(wq_d.shape, jnp.int32)),
            jnp.arange(M + S - 1),
        )

        if daxis is not None:
            gw_acc = jax.lax.psum(gw_acc, daxis)

        def requant(acc):
            bw = numerics.range_estimate(acc)
            return numerics.requant_grad_from_bw(acc, bw, margin=2)

        gw = jax.vmap(requant)(gw_acc)
        new_wd = int8_clip(
            wq_d.astype(jnp.int32) - gw.astype(jnp.int32)
        ).astype(jnp.int8)
        return new_wd, loss

    dspec = DATA_AXIS if data_parallel else None
    sharded = shard_map(
        body,
        mesh=mesh,
        in_specs=(
            P(PIPE_AXIS),                        # stacked weight data
            P(PIPE_AXIS),                        # stacked weight exps
            P(None, dspec, None, None, None),    # x microbatches
            P(None),                             # x exps
            P(None, dspec, None),                # onehot
        ),
        out_specs=(P(PIPE_AXIS), P()),
        check_vma=False,
    )

    @partial(jax.jit, donate_argnums=(0,) if donate else ())
    def step(params: QTensor, x_d, x_e, oh):
        new_wd, loss = sharded(params.data, params.exp, x_d, x_e, oh)
        return QTensor(new_wd, params.exp), loss

    return step
