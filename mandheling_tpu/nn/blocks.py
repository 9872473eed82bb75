"""Composite NITI layers: depthwise conv, avg pool, residual blocks.

Residual add follows the reference's int8 eltwise + NOP gradient
(`NITI_Eltwise_Int8.cpp`, `grad/NITI_DSPBinaryGrad.cpp:27-32`: the ADD
gradient passes the output diff unchanged to both branches); when two
gradient paths meet, contributions are accumulated with a clipped int8 add,
exactly how the reference's OpGrad accumulates multi-consumer gradients
(grad/OpGrad.cpp:64-128 uses `_Add` on int8).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..ops import depthwise as dw_ops
from ..ops import eltwise as elt_ops
from ..ops.numerics import int8_clip
from ..ops.qtensor import QTensor
from .init import niti_xavier_int8
from .module import NITILayer, Sequential


def _accum_grads(a: jax.Array, b: jax.Array) -> jax.Array:
    return int8_clip(a.astype(jnp.int32) + b.astype(jnp.int32)).astype(jnp.int8)


class NITIDepthwiseConv2D(NITILayer):
    """int8 depthwise conv. `per_channel=True` switches the weight to a
    per-channel exponent vector (nn/init.niti_xavier_int8_dw_per_channel +
    the aligned-accumulator forms in ops/depthwise.py) — this framework's
    extension for depthwise-separable quantization; the reference has no
    NITI depthwise op (its MobileNets train fp32)."""

    def __init__(self, channels: int, kernel=(3, 3), stride=(1, 1),
                 padding="SAME", per_channel: bool = False, act=None):
        self.channels = channels
        self.kernel = tuple(kernel)
        self.stride = tuple(stride)
        self.padding = padding
        self.per_channel = per_channel
        self.act = act

    def init(self, key):
        kh, kw = self.kernel
        if self.per_channel:
            from .init import niti_xavier_int8_dw_per_channel

            return {"w": niti_xavier_int8_dw_per_channel(
                key, (kh, kw, 1, self.channels))}
        # fan over the per-channel kernel (1-in-1-out per group)
        return {"w": niti_xavier_int8(key, (kh, kw, 1, self.channels))}

    def fwd(self, params, q: QTensor, axis_name=None):
        w: QTensor = params["w"]
        y, e = dw_ops.dwconv2d_forward(
            q.data, q.exp, w.data, w.exp, self.stride, self.padding,
            axis_name, act=self.act,
        )
        res = q.data if self.act is None else (q.data, y, e)
        return QTensor(y, e), res

    def bwd(self, params, res, gy, axis_name=None):
        if self.act is None:
            x = res
        else:
            from ..ops import relu as relu_ops

            x, y, y_exp = res
            if self.act != "relu6":
                raise ValueError(f"unknown act {self.act!r}")
            gy = relu_ops.relu6_grad_from_output(y, y_exp, gy)
        w: QTensor = params["w"]
        w_exp = w.exp if self.per_channel else None
        gx = dw_ops.dwconv2d_input_grad(
            gy, w.data, (x.shape[1], x.shape[2]), self.stride, self.padding,
            axis_name, w_exp=w_exp,
        )
        gw = dw_ops.dwconv2d_filter_grad(
            x, gy, self.kernel, self.stride, self.padding, axis_name,
            w_exp=w_exp,
        )
        return gx, {"w": QTensor(gw, jnp.int32(0))}


class NITIAvgPool(NITILayer):
    """int8 average pool. `pad` > 0 pre-pads the input with zeros on each
    spatial side before a VALID pool (SAME-with-zero-counting semantics,
    count_include_pad=True — the divisor is always |window|); used by the
    Inception pooling branches (3x3 stride-1 pad-1)."""

    def __init__(self, window=(2, 2), stride=None, pad: int = 0):
        self.window = tuple(window)
        self.stride = tuple(stride) if stride else tuple(window)
        self.pad = int(pad)

    def fwd(self, params, q: QTensor, axis_name=None):
        x = q.data
        if self.pad:
            x = elt_ops.pad_int8(x, self.pad)
        y, e = dw_ops.avgpool2d_int8(x, q.exp, self.window, self.stride)
        return QTensor(y, e), x.shape

    def bwd(self, params, res, gy, axis_name=None):
        shape = res
        gx = dw_ops.avgpool2d_grad(gy, (shape[1], shape[2]), self.window,
                                   self.stride)
        if self.pad:
            p = self.pad
            gx = gx[:, p:-p, p:-p, :]
        return gx, ()


class GlobalAvgPool(NITILayer):
    """(B, H, W, C) -> (B, 1, 1, C) integer mean."""

    def fwd(self, params, q: QTensor, axis_name=None):
        b, h, w, c = q.data.shape
        acc = jnp.sum(q.data.astype(jnp.int32), axis=(1, 2), keepdims=True)
        out = jax.lax.div(acc, jnp.int32(h * w))
        return QTensor(int8_clip(out).astype(jnp.int8), q.exp), q.data.shape

    def bwd(self, params, res, gy, axis_name=None):
        b, h, w, c = res
        g = jax.lax.div(gy.astype(jnp.int32), jnp.int32(h * w))
        gx = jnp.broadcast_to(g, (b, h, w, c))
        return int8_clip(gx).astype(jnp.int8), ()


class ParallelConcat(NITILayer):
    """Run N branches on the same input and concat their outputs on the
    channel axis (exponent-aligned, ops/eltwise.concat_int8). The building
    block for SqueezeNet Fire modules and Inception modules — the multi-
    branch models of the reference's headline benchmark table
    (`execution-engine/benchmark/result/2020-3-22.md:14-29`).

    Backward: concat's gradient is a channel split — each branch receives
    its own slice of the output diff unchanged (the NOP-grad convention,
    `grad/NITI_DSPBinaryGrad.cpp:27-32`); the branches' input gradients are
    accumulated with the clipped int8 add, exactly how the reference's
    OpGrad accumulates multi-consumer gradients (grad/OpGrad.cpp:64-128)."""

    def __init__(self, branches: Sequence):
        self.branches = list(branches)

    def init(self, key):
        keys = jax.random.split(key, len(self.branches))
        return [b.init(k) for b, k in zip(self.branches, keys)]

    def fwd(self, params, q: QTensor, axis_name=None):
        outs, ress = [], []
        for branch, p in zip(self.branches, params):
            out, r = branch.fwd(p, q, axis_name)
            outs.append(out)
            ress.append(r)
        y, e = elt_ops.concat_int8([o.data for o in outs], [o.exp for o in outs])
        sizes = tuple(o.data.shape[-1] for o in outs)
        return QTensor(y, e), (ress, sizes)

    def bwd(self, params, res, gy, axis_name=None):
        ress, sizes = res
        gx = None
        grads = []
        off = 0
        for branch, p, r, c in zip(self.branches, params, ress, sizes):
            g_in, g_p = branch.bwd(p, r, gy[..., off : off + c], axis_name)
            grads.append(g_p)
            gx = g_in if gx is None else _accum_grads(gx, g_in)
            off += c
        return gx, grads


class ParallelAdd(NITILayer):
    """Run N branches on the same input and join with the exponent-aligned
    int8 add (ops/eltwise.add_int8) — the general fan-in for imported
    graphs whose Add joins two non-trivial paths (e.g. ResNet downsample
    blocks where the skip is a strided 1x1 conv, or any rewritten topology
    from `transformer/Transformer.cpp:69`). An empty branch
    (`Sequential([])`) is the identity skip, making `ParallelAdd([main,
    Sequential([])])` semantically equal to `ResidualBlock(main)`.

    Backward mirrors ParallelConcat: the Add gradient passes the output
    diff unchanged to every branch (NOP-grad, grad/NITI_DSPBinaryGrad.cpp:
    27-32); branch input-grads accumulate with the clipped int8 add."""

    def __init__(self, branches: Sequence):
        if len(branches) < 2:
            raise ValueError("ParallelAdd needs >= 2 branches")
        self.branches = list(branches)

    def init(self, key):
        keys = jax.random.split(key, len(self.branches))
        return [b.init(k) for b, k in zip(self.branches, keys)]

    def fwd(self, params, q: QTensor, axis_name=None):
        outs, ress = [], []
        for branch, p in zip(self.branches, params):
            out, r = branch.fwd(p, q, axis_name)
            outs.append(out)
            ress.append(r)
        y, e = outs[0].data, outs[0].exp
        for o in outs[1:]:
            y, e = elt_ops.add_int8(y, e, o.data, o.exp)
        return QTensor(y, e), ress

    def bwd(self, params, res, gy, axis_name=None):
        gx = None
        grads = []
        for branch, p, r in zip(self.branches, params, res):
            g_in, g_p = branch.bwd(p, r, gy, axis_name)
            grads.append(g_p)
            gx = g_in if gx is None else _accum_grads(gx, g_in)
        return gx, grads


class ResidualBlock(NITILayer):
    """y = requant(branch(x) + x) with exponent alignment.

    Forward: ops/eltwise.add_int8 (int8 eltwise, NITI_Eltwise_Int8.cpp).
    Backward: output diff passes unchanged to both branches (NOP grad);
    the skip contribution and the branch's input grad are accumulated with
    a clipped int8 add."""

    def __init__(self, branch: Sequential):
        self.branch = branch

    def init(self, key):
        return self.branch.init(key)

    def fwd(self, params, q: QTensor, axis_name=None):
        out, res = self.branch.fwd(params, q, axis_name)
        y, e = elt_ops.add_int8(out.data, out.exp, q.data, q.exp)
        return QTensor(y, e), res

    def bwd(self, params, res, gy, axis_name=None):
        g_branch_in, grads = self.branch.bwd(params, res, gy, axis_name)
        return _accum_grads(g_branch_in, gy), grads
