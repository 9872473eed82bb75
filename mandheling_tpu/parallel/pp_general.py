"""General pipeline parallelism: arbitrary `Sequential` slices as stages.

Generalizes parallel/pp.py (homogeneous stacked blocks) to the real model
zoo: stages are contiguous layer slices of any `Sequential` model (LeNet,
ResNet blocks, ...), with *heterogeneous* activation shapes and parameter
trees across stages. SPMD (shard_map) requires identical local shapes on
every device, so:

- activations cross stage boundaries as a padded flat int8 buffer
  (mb, FLAT_A) + an int32 exponent scalar, sized to the largest boundary;
- each stage's parameter tree is packed into padded flat buffers
  ((S, FLAT_P8) int8 weight data + (S, FLAT_P32) int32 exponents) sharded
  on the 'pipe' axis;
- every device runs `lax.switch(stage_index, branches)` where branch k
  statically unpacks its slice layout, runs its layers, and repacks.

Backward uses GPipe-style rematerialization: only each stage's *input*
activation (same flat shape for every stage) is stored per microbatch; the
stage forward is recomputed inside the backward branch to regenerate
residuals. Weight gradients accumulate as int32 in a flat buffer aligned
with the int8 param buffer — summed across microbatches (and psum'd across
the data axis) BEFORE the single per-tensor range-estimate + shift, the
reference's split-batch gradient contract
(`NITI_DSPGradientSplitBatchConv_Int8.cpp`, selection
`NITI_DSPConv_Int8_Grad.cpp:178-186`). With one microbatch the whole
pipeline is bit-identical to single-chip training (asserted in
tests/test_pp_general.py).

Composes with data parallelism on a ('data', 'pipe') mesh exactly like
parallel/sharded_step.py: forward range estimates pmax over 'data', the
gradient accumulator buffer psums over 'data' before the shift.
"""

from __future__ import annotations

import math
from functools import partial
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..nn.module import NITILayer, Sequential
from ..ops import numerics
from ..ops.loss import loss_cross_entropy_float, loss_grad_int8
from ..ops.numerics import int8_clip
from ..ops.qtensor import QTensor
from .mesh import DATA_AXIS
from .pp import PIPE_AXIS, pipe_mesh  # re-export mesh helper


def _flat_size(shape) -> int:
    return int(np.prod(shape[1:]))  # per-sample flat size


class GPipePlan:
    """Static stage plan: layer slices, activation shapes, param layouts.

    Built host-side from the model + a microbatch input shape; everything
    here is Python-static so the shard_map body compiles to fixed shapes.
    """

    def __init__(
        self,
        model: Sequential,
        params_template,
        microbatch_shape: Tuple[int, ...],
        n_stages: int,
        bounds: Optional[Sequence[int]] = None,
    ):
        self.model = model
        self.n_stages = n_stages
        L = len(model.layers)

        # trace activation shapes at every layer boundary
        shapes = [tuple(microbatch_shape)]
        q = QTensor(
            jax.ShapeDtypeStruct(tuple(microbatch_shape), jnp.int8),
            jax.ShapeDtypeStruct((), jnp.int32),
        )
        for layer, p in zip(model.layers, params_template):
            out, _ = jax.eval_shape(lambda pp, qq: layer.fwd(pp, qq), p, q)
            q = QTensor(
                jax.ShapeDtypeStruct(out.data.shape, jnp.int8),
                jax.ShapeDtypeStruct((), jnp.int32),
            )
            shapes.append(tuple(out.data.shape))
        self.act_shapes = shapes  # per layer boundary, len L+1

        if bounds is None:
            bounds = self._balance(params_template, shapes, L, n_stages)
        assert len(bounds) == n_stages + 1 and bounds[0] == 0 and bounds[-1] == L
        assert all(b1 > b0 for b0, b1 in zip(bounds, bounds[1:])), (
            f"empty stage in bounds {bounds}"
        )
        self.bounds = list(bounds)
        self.stage_in_shapes = [shapes[b] for b in self.bounds[:-1]]
        self.stage_out_shapes = [shapes[b] for b in self.bounds[1:]]
        self.out_shape = shapes[-1]
        self.mb = microbatch_shape[0]
        self.flat_a = max(_flat_size(s) for s in
                          self.stage_in_shapes + [self.out_shape])

        # param layouts: per stage, per int8/int32 leaf (offset, shape, margin)
        self.layouts = []
        p8max = p32max = 0
        for k in range(n_stages):
            sl = slice(self.bounds[k], self.bounds[k + 1])
            leaves, treedef = jax.tree.flatten(list(params_template[sl]))
            entries = []
            o8 = o32 = 0
            leaf_layers = self._leaf_layers(params_template[sl],
                                            model.layers[sl])
            for leaf, layer in zip(leaves, leaf_layers):
                n = int(np.prod(leaf.shape)) if leaf.shape else 1
                if leaf.dtype == jnp.int8:
                    entries.append(("i8", o8, tuple(leaf.shape),
                                    getattr(layer, "grad_margin", 2)))
                    o8 += n
                else:
                    entries.append(("i32", o32, tuple(leaf.shape), 0))
                    o32 += n
            self.layouts.append((treedef, entries))
            p8max, p32max = max(p8max, o8), max(p32max, o32)
        self.flat_p8 = max(p8max, 1)
        self.flat_p32 = max(p32max, 1)

    @staticmethod
    def _leaf_layers(stage_params, stage_layers):
        """Owning layer for every flattened leaf (for grad margins)."""
        out = []
        for p, layer in zip(stage_params, stage_layers):
            out.extend([layer] * len(jax.tree.leaves(p)))
        return out

    @staticmethod
    def _balance(params_template, act_shapes, n_layers: int,
                 n_stages: int) -> List[int]:
        """Split layers into contiguous stages minimizing the max stage
        COMPUTE (pipeline throughput is gated by the slowest stage, not by
        parameter storage). Per-layer cost proxy: MACs for parameterized
        layers (out_elems x param_elems / oc), activation elements for
        element-wise ones. Exact min-max via DP over contiguous splits
        (L and S are tiny)."""
        costs = []
        for i, p in enumerate(params_template):
            out_elems = int(np.prod(act_shapes[i + 1]))
            p8 = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(p)
                     if getattr(l, "dtype", None) == jnp.int8)
            if p8:
                oc = act_shapes[i + 1][-1]
                costs.append(out_elems * max(p8 // max(oc, 1), 1))
            else:
                costs.append(out_elems)
        prefix = np.concatenate([[0], np.cumsum(costs)])

        def seg(a, b):
            return prefix[b] - prefix[a]

        INF = float("inf")
        # dp[s][i]: min over splits of max-stage-cost using s stages for
        # layers [0, i)
        dp = [[INF] * (n_layers + 1) for _ in range(n_stages + 1)]
        cut = [[0] * (n_layers + 1) for _ in range(n_stages + 1)]
        dp[0][0] = 0.0
        for s in range(1, n_stages + 1):
            for i in range(s, n_layers + 1):
                for j in range(s - 1, i):
                    v = max(dp[s - 1][j], seg(j, i))
                    if v < dp[s][i]:
                        dp[s][i] = v
                        cut[s][i] = j
        bounds = [n_layers]
        i = n_layers
        for s in range(n_stages, 0, -1):
            i = cut[s][i]
            bounds.append(i)
        return list(reversed(bounds))

    # ---- packing -----------------------------------------------------------

    def pack_params(self, params) -> Tuple[jax.Array, jax.Array]:
        """Model params -> ((S, FLAT_P8) int8, (S, FLAT_P32) int32)."""
        p8s, p32s = [], []
        for k in range(self.n_stages):
            sl = slice(self.bounds[k], self.bounds[k + 1])
            leaves = jax.tree.leaves(list(params[sl]))
            b8 = jnp.zeros((self.flat_p8,), jnp.int8)
            b32 = jnp.zeros((self.flat_p32,), jnp.int32)
            _, entries = self.layouts[k]
            for leaf, (kind, off, shape, _) in zip(leaves, entries):
                n = int(np.prod(shape)) if shape else 1
                flat = jnp.ravel(leaf)
                if kind == "i8":
                    b8 = b8.at[off : off + n].set(flat.astype(jnp.int8))
                else:
                    b32 = b32.at[off : off + n].set(flat.astype(jnp.int32))
            p8s.append(b8)
            p32s.append(b32)
        return jnp.stack(p8s), jnp.stack(p32s)

    def unpack_stage(self, k: int, p8: jax.Array, p32: jax.Array):
        """Flat buffers -> stage k's params subtree (static layout)."""
        treedef, entries = self.layouts[k]
        leaves = []
        for kind, off, shape, _ in entries:
            n = int(np.prod(shape)) if shape else 1
            if kind == "i8":
                leaves.append(p8[off : off + n].reshape(shape))
            else:
                v = p32[off : off + n].reshape(shape)
                leaves.append(v if shape else v.reshape(()))
        return jax.tree.unflatten(treedef, leaves)

    def unpack_params(self, packed: Tuple[jax.Array, jax.Array]):
        """((S, FLAT_P8), (S, FLAT_P32)) -> model params list."""
        p8, p32 = packed
        out = []
        for k in range(self.n_stages):
            out.extend(self.unpack_stage(k, p8[k], p32[k]))
        return out

    # ---- flat activation helpers ------------------------------------------

    def flatten_act(self, data: jax.Array) -> jax.Array:
        mb = data.shape[0]
        flat = data.reshape(mb, -1)
        return jnp.pad(flat, ((0, 0), (0, self.flat_a - flat.shape[1])))

    def unflatten_act(self, buf: jax.Array, shape) -> jax.Array:
        """Per-sample shape comes from the plan; the batch dim comes from
        the buffer (it is the *local* microbatch under data parallelism)."""
        n = _flat_size(shape)
        return buf[:, :n].reshape((buf.shape[0],) + tuple(shape[1:]))


def make_gpipe_train_step(
    plan: GPipePlan,
    mesh: Mesh,
    n_microbatches: int,
    data_parallel: bool = False,
    donate: bool = True,
):
    """Jitted general-GPipe train step over `mesh` (('data', 'pipe')).

    step(packed_params, x_d (M, mb, ...) int8, x_e (M,) int32,
         onehot (M, mb, C)) -> (new_packed_params, mean loss)

    Inputs are pre-quantized per microbatch (parallel/pp.py
    `quantize_microbatches`); with n_microbatches == 1 the result is
    bit-identical to the single-chip train step on the same quantized batch.
    """
    S = plan.n_stages
    M = n_microbatches
    assert mesh.shape[PIPE_AXIS] == S
    daxis: Optional[str] = DATA_AXIS if data_parallel else None
    model, bounds = plan.model, plan.bounds
    logit_c = plan.out_shape[-1]

    fwd_perm = [(i, i + 1) for i in range(S - 1)]
    bwd_perm = [(i, i - 1) for i in range(1, S)]

    def stage_fwd_branch(k):
        layers = model.layers[bounds[k] : bounds[k + 1]]

        def branch(a_buf, a_exp, p8, p32):
            params = plan.unpack_stage(k, p8, p32)
            q = QTensor(plan.unflatten_act(a_buf, plan.stage_in_shapes[k]),
                        a_exp)
            for layer, p in zip(layers, params):
                q, _ = layer.fwd(p, q, daxis)
            return plan.flatten_act(q.data), q.exp

        return branch

    def stage_bwd_branch(k):
        layers = model.layers[bounds[k] : bounds[k + 1]]
        first_stage = k == 0

        def branch(g_buf, in_buf, in_exp, p8, p32):
            params = plan.unpack_stage(k, p8, p32)
            # rematerialize the stage forward to regenerate residuals
            q = QTensor(plan.unflatten_act(in_buf, plan.stage_in_shapes[k]),
                        in_exp)
            residuals = []
            for layer, p in zip(layers, params):
                q, r = layer.fwd(p, q, daxis)
                residuals.append(r)
            g = plan.unflatten_act(g_buf, plan.stage_out_shapes[k])
            # reverse sweep, collecting int32 accumulators per int8 leaf
            acc_buf = jnp.zeros((plan.flat_p8,), jnp.int32)
            treedef, entries = plan.layouts[k]
            leaf_pos = 0
            # leaf offsets per layer, in layer order
            layer_entries = []
            for p in params:
                nl = len(jax.tree.leaves(p))
                layer_entries.append(entries[leaf_pos : leaf_pos + nl])
                leaf_pos += nl
            for i in range(len(layers) - 1, -1, -1):
                layer, p, r = layers[i], params[i], residuals[i]
                need_gx = not (first_stage and i == 0)
                if hasattr(layer, "bwd_acc"):
                    gx, accs = layer.bwd_acc(p, r, g, daxis,
                                             need_input_grad=need_gx)
                    acc_leaves = jax.tree.leaves(accs)
                    # scatter accs at the int8-leaf offsets of this layer
                    i8_entries = [e for e in layer_entries[i]
                                  if e[0] == "i8"]
                    for acc, (_, off, shape, _) in zip(acc_leaves, i8_entries):
                        n = int(np.prod(shape))
                        acc_buf = acc_buf.at[off : off + n].add(acc.ravel())
                else:
                    if need_gx:
                        gx, _ = layer.bwd(p, r, g, daxis)
                    else:
                        gx = None
                    assert not jax.tree.leaves(p), (
                        f"layer {type(layer).__name__} has params but no "
                        "bwd_acc — exact microbatch accumulation impossible"
                    )
                g = gx if gx is not None else jnp.zeros_like(
                    plan.unflatten_act(in_buf, plan.stage_in_shapes[k])
                )
            return plan.flatten_act(g), acc_buf

        return branch

    def stage_requant_update_branch(k):
        def branch(p8, acc_buf):
            _, entries = plan.layouts[k]
            new_p8 = p8
            for kind, off, shape, margin in entries:
                if kind != "i8":
                    continue
                n = int(np.prod(shape))
                acc = acc_buf[off : off + n].reshape(shape)
                bw = numerics.range_estimate(acc)
                gq = numerics.requant_grad_from_bw(acc, bw, margin)
                w = p8[off : off + n].reshape(shape)
                neww = int8_clip(
                    w.astype(jnp.int32) - gq.astype(jnp.int32)
                ).astype(jnp.int8)
                new_p8 = new_p8.at[off : off + n].set(neww.ravel())
            return new_p8

        return branch

    fwd_branches = [stage_fwd_branch(k) for k in range(S)]
    bwd_branches = [stage_bwd_branch(k) for k in range(S)]
    upd_branches = [stage_requant_update_branch(k) for k in range(S)]

    def body(p8, p32, x_d, x_e, oh):
        # local blocks (shard_map preserves rank): p8 (1, FLAT_P8) int8,
        # p32 (1, FLAT_P32), x_d (M, mb_local, ...) int8 (replicated on
        # pipe, batch-sharded on data when data_parallel), x_e (M,),
        # oh (M, mb_local, C)
        p8, p32 = p8[0], p32[0]
        mbl = x_d.shape[1]  # local microbatch (mb / n_data under DP)
        s = jax.lax.axis_index(PIPE_AXIS)
        is_first = s == 0
        is_last = s == S - 1

        def fwd_tick(carry, t):
            a_buf, a_exp, store_in, store_e, out_buf, out_e = carry
            recv_buf = jax.lax.ppermute(a_buf, PIPE_AXIS, fwd_perm)
            recv_exp = jax.lax.ppermute(a_exp, PIPE_AXIS, fwd_perm)
            m = t - s
            valid = (m >= 0) & (m < M)
            midx = jnp.clip(m, 0, M - 1)
            inj = plan.flatten_act(x_d[midx])
            a_buf = jnp.where(is_first, inj, recv_buf)
            a_exp = jnp.where(is_first, x_e[midx], recv_exp)
            slot = jnp.where(valid, midx, M)
            store_in = jax.lax.dynamic_update_index_in_dim(
                store_in, a_buf, slot, 0
            )
            store_e = jax.lax.dynamic_update_index_in_dim(
                store_e, a_exp, slot, 0
            )
            o_buf, o_exp = jax.lax.switch(s, fwd_branches, a_buf, a_exp,
                                          p8, p32)
            oslot = jnp.where(valid & is_last, midx, M)
            out_buf = jax.lax.dynamic_update_index_in_dim(
                out_buf, o_buf, oslot, 0
            )
            out_e = jax.lax.dynamic_update_index_in_dim(out_e, o_exp, oslot, 0)
            return (o_buf, o_exp, store_in, store_e, out_buf, out_e), None

        carry0 = (
            jnp.zeros((mbl, plan.flat_a), jnp.int8),
            jnp.int32(0),
            jnp.zeros((M + 1, mbl, plan.flat_a), jnp.int8),
            jnp.zeros((M + 1,), jnp.int32),
            jnp.zeros((M + 1, mbl, plan.flat_a), jnp.int8),
            jnp.zeros((M + 1,), jnp.int32),
        )
        (_, _, store_in, store_e, out_buf, out_e), _ = jax.lax.scan(
            fwd_tick, carry0, jnp.arange(M + S - 1)
        )

        logits = out_buf[:M, :, : logit_c].reshape(M, mbl, logit_c)
        losses = jax.vmap(loss_cross_entropy_float)(logits, out_e[:M],
                                                    oh.astype(jnp.int32))
        gys = jax.vmap(loss_grad_int8)(logits, out_e[:M], oh.astype(jnp.int32))
        loss = jax.lax.psum(
            jnp.where(is_last, jnp.mean(losses), 0.0), PIPE_AXIS
        )
        if daxis is not None:
            from ..train.train_step import det_psum_f32

            loss = det_psum_f32(loss, daxis) / jax.lax.psum(
                jnp.float32(1), daxis
            )

        def bwd_tick(carry, u):
            g_buf, acc_buf = carry
            recv = jax.lax.ppermute(g_buf, PIPE_AXIS, bwd_perm)
            m = u - (S - 1 - s)
            valid = (m >= 0) & (m < M)
            midx = jnp.clip(m, 0, M - 1)
            inj = plan.flatten_act(
                gys[midx].reshape((mbl,) + plan.out_shape[1:])
            )
            g_buf = jnp.where(is_last, inj, recv)
            g_buf = jnp.where(valid, g_buf, 0).astype(jnp.int8)
            g_out, acc = jax.lax.switch(
                s, bwd_branches, g_buf, store_in[midx], store_e[midx], p8, p32
            )
            return (g_out, acc_buf + jnp.where(valid, acc, 0)), None

        (_, acc_buf), _ = jax.lax.scan(
            bwd_tick,
            (jnp.zeros((mbl, plan.flat_a), jnp.int8),
             jnp.zeros((plan.flat_p8,), jnp.int32)),
            jnp.arange(M + S - 1),
        )
        if daxis is not None:
            acc_buf = jax.lax.psum(acc_buf, daxis)

        new_p8 = jax.lax.switch(s, upd_branches, p8, acc_buf)
        return new_p8[None], loss

    dspec = DATA_AXIS if data_parallel else None
    sharded = shard_map(
        body,
        mesh=mesh,
        in_specs=(
            P(PIPE_AXIS),                  # packed int8 params (S, FLAT_P8)
            P(PIPE_AXIS),                  # packed int32 params
            P(None, dspec),                # x microbatches (M, mb, ...)
            P(None),                       # x exps (M,)
            P(None, dspec, None),          # onehot (M, mb, C)
        ),
        out_specs=(P(PIPE_AXIS), P()),
        check_vma=False,
    )

    @partial(jax.jit, donate_argnums=(0,) if donate else ())
    def step(packed, x_d, x_e, oh):
        p8, p32 = packed
        new_p8, loss = sharded(p8, p32, x_d, x_e, oh)
        return (new_p8, p32), loss

    return step


def shard_packed_params(mesh: Mesh, packed):
    p8, p32 = packed
    spec = NamedSharding(mesh, P(PIPE_AXIS))
    return jax.device_put(p8, spec), jax.device_put(p32, spec)
