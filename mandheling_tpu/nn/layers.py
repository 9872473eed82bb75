"""NITI int8 layers: conv (+FC as 1x1 conv), relu, maxpool, flatten.

Layer-level equivalents of the reference NN factory modules
(`tools/train/source/nn/NN.cpp:1108-1320`: `NITI_Conv_Int8_Module`) and their
grad rules (`grad/NITI_Conv_Int8_Grad.cpp`, `grad/NITI_ReluGrad_Int8.cpp`,
`grad/NITI_Pool_Int8_Grad.cpp`). The weight exponent is initialized by the
NITI Xavier scheme and stays constant during training: the reference's
NITI_SGD updates only the int8 weight data (w <- clip(w - g)) and its grad
rules return scalar-0 exponent gradients.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops import conv as conv_ops
from ..ops import pool as pool_ops
from ..ops import relu as relu_ops
from ..ops.qtensor import QTensor
from .init import niti_xavier_int8
from .module import NITILayer


class NITIConv2D(NITILayer):
    """int8 conv with NITI power-of-two requantization; FC layers are 1x1
    convs over 1x1 spatial (reference LeNet ip1/ip2, mnistTrain.cpp:146-155).

    `act="relu6"` fuses the exponent-aware ReLU6 clamp into the requant
    chain (ops/conv._apply_act) and applies the matching output-mask in
    the backward — measured ~30% faster at MNv2 scale than a standalone
    relu6 layer (the traced-scalar cap defeats XLA fusion there).
    """

    def __init__(
        self,
        in_channels: int,
        out_channels: int,
        kernel: Tuple[int, int] = (1, 1),
        stride: Tuple[int, int] = (1, 1),
        padding="VALID",
        act=None,
        out_bits: int = 7,
    ):
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.kernel = tuple(kernel)
        self.stride = tuple(stride)
        self.padding = padding
        self.act = act
        # 7 = reference int8 contract; 15 = int16 output (the MNv2
        # linear-projection extension, ops/numerics.requant_forward)
        self.out_bits = int(out_bits)

    def init(self, key):
        kh, kw = self.kernel
        return {
            "w": niti_xavier_int8(key, (kh, kw, self.in_channels, self.out_channels))
        }

    def fwd(self, params, q: QTensor, axis_name=None):
        w: QTensor = params["w"]
        y, y_exp = conv_ops.conv2d_forward(
            q.data, q.exp, w.data, w.exp, self.stride, self.padding,
            axis_name, act=self.act, out_bits=self.out_bits,
        )
        # residual: forward input (for the filter grad); with a fused act,
        # also the output + its exponent (for the activation's output-mask)
        res = q.data if self.act is None else (q.data, y, y_exp)
        return QTensor(y, y_exp), res

    def _unpack(self, res, gy):
        """(x, act-masked gy) — applies the fused activation's backward."""
        if self.act is None:
            return res, gy
        x, y, y_exp = res
        if self.act == "relu6":
            return x, relu_ops.relu6_grad_from_output(y, y_exp, gy)
        raise ValueError(f"unknown act {self.act!r}")

    def bwd(self, params, res, gy, axis_name=None):
        x, gy = self._unpack(res, gy)
        w: QTensor = params["w"]
        gx = conv_ops.conv2d_input_grad(
            gy, w.data, (x.shape[1], x.shape[2]), self.stride, self.padding, axis_name
        )
        gw = conv_ops.conv2d_filter_grad(
            x, gy, self.kernel, self.stride, self.padding, axis_name
        )
        return gx, {"w": QTensor(gw, jnp.int32(0))}

    def bwd_params_only(self, params, res, gy, axis_name=None):
        x, gy = self._unpack(res, gy)
        gw = conv_ops.conv2d_filter_grad(
            x, gy, self.kernel, self.stride, self.padding, axis_name
        )
        return {"w": QTensor(gw, jnp.int32(0))}

    # pre-requant accumulator access for exact cross-microbatch gradient
    # accumulation (pipeline parallelism — the reference's split-batch
    # gradient contract: int32 sums over the whole batch, ONE shift at the
    # end, NITI_DSPGradientSplitBatchConv_Int8.cpp)
    @property
    def grad_margin(self):
        """Filter-grad requant margin for the deferred (pipeline) requant —
        tracks the global knob so GPipe matches the single-chip update
        when a model ships a non-default margin (the r5 MNv2 recipe)."""
        return conv_ops.get_fgrad_margin()

    def bwd_acc(self, params, res, gy, axis_name=None, need_input_grad=True):
        """(input grad or None, {"w": int32 accumulator})."""
        x, gy = self._unpack(res, gy)
        gx = None
        if need_input_grad:
            gx = conv_ops.conv2d_input_grad(
                gy, params["w"].data, (x.shape[1], x.shape[2]), self.stride,
                self.padding, axis_name,
            )
        acc = conv_ops.conv2d_filter_grad_acc(
            x, gy, self.kernel, self.stride, self.padding
        )
        return gx, {"w": acc}


class NITIRelu(NITILayer):
    def fwd(self, params, q: QTensor, axis_name=None):
        return QTensor(relu_ops.relu(q.data), q.exp), q.data

    def bwd(self, params, res, gy, axis_name=None):
        return relu_ops.relu_grad(res, gy), ()


class NITIRelu6(NITILayer):
    """Exponent-aware int8 ReLU6 (ops/relu.relu6) — the reference
    MobileNetV2's _Relu6 (models/MobilenetV2.cpp:67) under the NITI
    contract. Bounds the forward activations at value 6.0, which the r4
    divergence study measured as the fix for full-NITI MNv2's forward
    exponent-inflation runaway."""

    def fwd(self, params, q: QTensor, axis_name=None):
        y = relu_ops.relu6(q.data, q.exp)
        # residual = the OUTPUT (shared with the next layer's residual, so
        # the pre-clip tensor dies here) — see relu6_grad_from_output
        return QTensor(y, q.exp), (y, q.exp)

    def bwd(self, params, res, gy, axis_name=None):
        y, exp = res
        return relu_ops.relu6_grad_from_output(y, exp, gy), ()


class NITIMaxPool(NITILayer):
    def __init__(self, window=(2, 2), stride=(2, 2)):
        self.window = tuple(window)
        self.stride = tuple(stride)

    def fwd(self, params, q: QTensor, axis_name=None):
        y, e = pool_ops.maxpool2d(q.data, q.exp, self.window, self.stride)
        return QTensor(y, e), (q.data, y)

    def bwd(self, params, res, gy, axis_name=None):
        x, y = res
        return pool_ops.maxpool2d_grad(x, y, gy, self.window, self.stride), ()


class Flatten(NITILayer):
    """(B, H, W, C) -> (B, 1, 1, H*W*C); the reference's
    `_Reshape(x, {0,-1,1,1})` before the FC-as-conv layers. Feature order is
    NHWC-native here (the reference flattens NCHW); orderings only differ by
    a fixed permutation absorbed by training-from-scratch FC weights."""

    def fwd(self, params, q: QTensor, axis_name=None):
        b = q.data.shape[0]
        return QTensor(q.data.reshape(b, 1, 1, -1), q.exp), q.data.shape

    def bwd(self, params, res, gy, axis_name=None):
        return gy.reshape(res), ()


class SqueezeLogits(NITILayer):
    """(B, 1, 1, C) -> (B, C) for the loss; reshape-only, grad restores."""

    def fwd(self, params, q: QTensor, axis_name=None):
        b = q.data.shape[0]
        return QTensor(q.data.reshape(b, -1), q.exp), q.data.shape

    def bwd(self, params, res, gy, axis_name=None):
        return gy.reshape(res), ()
