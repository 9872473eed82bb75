"""Composite NITI layers: depthwise conv, avg pool, residual blocks.

Residual add follows the reference's int8 eltwise + NOP gradient
(`NITI_Eltwise_Int8.cpp`, `grad/NITI_DSPBinaryGrad.cpp:27-32`: the ADD
gradient passes the output diff unchanged to both branches); when two
gradient paths meet, contributions are accumulated with a clipped int8 add,
exactly how the reference's OpGrad accumulates multi-consumer gradients
(grad/OpGrad.cpp:64-128 uses `_Add` on int8).
"""

from __future__ import annotations

from typing import Optional, Tuple

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
    def __init__(self, channels: int, kernel=(3, 3), stride=(1, 1), padding="SAME"):
        self.channels = channels
        self.kernel = tuple(kernel)
        self.stride = tuple(stride)
        self.padding = padding

    def init(self, key):
        kh, kw = self.kernel
        # fan over the per-channel kernel (1-in-1-out per group)
        return {"w": niti_xavier_int8(key, (kh, kw, 1, self.channels))}

    def fwd(self, params, q: QTensor, axis_name=None):
        w: QTensor = params["w"]
        y, e = dw_ops.dwconv2d_forward(
            q.data, q.exp, w.data, w.exp, self.stride, self.padding, axis_name
        )
        return QTensor(y, e), q.data

    def bwd(self, params, res, gy, axis_name=None):
        x = res
        w: QTensor = params["w"]
        gx = dw_ops.dwconv2d_input_grad(
            gy, w.data, (x.shape[1], x.shape[2]), self.stride, self.padding,
            axis_name,
        )
        gw = dw_ops.dwconv2d_filter_grad(
            x, gy, self.kernel, self.stride, self.padding, axis_name
        )
        return gx, {"w": QTensor(gw, jnp.int32(0))}


class NITIAvgPool(NITILayer):
    def __init__(self, window=(2, 2), stride=None):
        self.window = tuple(window)
        self.stride = tuple(stride) if stride else tuple(window)

    def fwd(self, params, q: QTensor, axis_name=None):
        y, e = dw_ops.avgpool2d_int8(q.data, q.exp, self.window, self.stride)
        return QTensor(y, e), q.data.shape

    def bwd(self, params, res, gy, axis_name=None):
        shape = res
        return dw_ops.avgpool2d_grad(gy, (shape[1], shape[2]), self.window,
                                     self.stride), ()


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
