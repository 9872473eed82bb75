"""Build a trainable NITI model directly from an ONNX graph — the general
`Transformer::turnModelToTrainable` (reference
`tools/train/source/transformer/Transformer.cpp:69`: load an inference
graph, rewrite its conv weights into trainable variables). Here the
rewrite target is a `Sequential` of NITI layers with NITI-quantized
(int8 data, power-of-two exponent) weights, ready for the integer train
step — no architecture-matched adapter required.

Coverage: sequential-chain graphs of
Conv (dense or depthwise) / Relu / Clip(min=0) / MaxPool / AveragePool /
GlobalAveragePool / Flatten / Reshape / Gemm / MatMul / Softmax(dropped —
the NITI loss consumes logits) / Dropout / Identity. BatchNormalization is
folded into the preceding conv (inference-style folding, then
quantization). Graphs with branching topology (residual Adds) are
rejected with a clear error — import those through the
architecture-matched adapters (utils/convert.py).

Shape tracking is NCHW (the ONNX convention); a Gemm following a Flatten
gets the channel-major -> channel-minor feature permutation so imported
weights compute the same function in our NHWC layout
(utils/convert.chw_to_hwc_perm).
"""

from __future__ import annotations

from typing import List, Tuple

import jax.numpy as jnp
import numpy as np

from ..nn.blocks import GlobalAvgPool, NITIAvgPool, NITIDepthwiseConv2D
from ..nn.layers import Flatten, NITIConv2D, NITIMaxPool, NITIRelu, SqueezeLogits
from ..nn.module import Sequential
from ..ops.qtensor import QTensor, quantize_weights
from .convert import chw_to_hwc_perm
from .onnx_io import _attrs, load_onnx, tensor_to_np


def _quant(w: np.ndarray) -> QTensor:
    return quantize_weights(jnp.asarray(w, jnp.float32))


def _fold_bn(w_hwio: np.ndarray, bn: dict) -> np.ndarray:
    """Fold inference-mode batchnorm into the preceding conv's weights
    (bias-less: NITI convs carry no bias, so the BN shift is dropped with
    the same effect as the reference's train-mode BN removal — document)."""
    scale = bn["scale"] / np.sqrt(bn["var"] + 1e-5)
    return w_hwio * scale[None, None, None, :]


def niti_model_from_onnx(path_or_model, input_shape=None):
    """ONNX graph -> (Sequential NITI model, quantized params).

    `input_shape` (N, C, H, W) overrides the graph's declared input shape
    (needed when the graph uses dynamic batch)."""
    model = (
        load_onnx(path_or_model) if isinstance(path_or_model, str)
        else path_or_model
    )
    g = model.graph
    init = {t.name: t for t in g.initializer}

    if input_shape is None:
        dims = g.input[0].type.tensor_type.shape.dim
        input_shape = tuple(d.dim_value for d in dims)
    _, c, h, w = input_shape

    layers: List = []
    params: List = []
    flattened = False
    pending_perm = None

    def consumed_by_two(name):
        return sum(name in n.input for n in g.node) > 1

    i = 0
    nodes = list(g.node)
    while i < len(nodes):
        node = nodes[i]
        op = node.op_type
        if node.input and consumed_by_two(node.input[0]):
            raise ValueError(
                "branching topology (tensor consumed twice) — use the "
                "architecture-matched adapters for residual models"
            )
        if op == "Conv":
            wt = tensor_to_np(init[node.input[1]])  # OIHW
            if len(node.input) > 2:
                raise ValueError(
                    "NITI convs carry no bias — re-export without bias "
                    f"(node {node.name!r})"
                )
            a = _attrs(node)
            stride = tuple(a.get("strides", [1, 1]))
            pt, pl_, pb, pr = (list(a.get("pads", [0, 0, 0, 0])) + [0] * 4)[:4]
            group = int(a.get("group", 1) or 1)
            w_hwio = wt.transpose(2, 3, 1, 0)
            # fold a directly-following BatchNormalization
            if i + 1 < len(nodes) and nodes[i + 1].op_type == "BatchNormalization":
                bnode = nodes[i + 1]
                bn = {
                    "scale": tensor_to_np(init[bnode.input[1]]),
                    "bias": tensor_to_np(init[bnode.input[2]]),
                    "mean": tensor_to_np(init[bnode.input[3]]),
                    "var": tensor_to_np(init[bnode.input[4]]),
                }
                w_hwio = _fold_bn(w_hwio, bn)
                i += 1
            kh, kw = w_hwio.shape[:2]
            pad = ((pt, pb), (pl_, pr))
            if group == 1:
                layers.append(NITIConv2D(w_hwio.shape[2], w_hwio.shape[3],
                                         (kh, kw), stride, pad))
                params.append({"w": _quant(w_hwio)})
                c = w_hwio.shape[3]
            elif group == c and wt.shape[1] == 1:
                layers.append(NITIDepthwiseConv2D(c, (kh, kw), stride, pad))
                params.append({"w": _quant(w_hwio)})
            else:
                raise ValueError(f"grouped conv (group={group}) unsupported")
            h = (h + pt + pb - kh) // stride[0] + 1
            w = (w + pl_ + pr - kw) // stride[1] + 1
        elif op in ("Relu",) or (op == "Clip" and
                                 float(_attrs(node).get("min", 1)) == 0.0):
            layers.append(NITIRelu())
            params.append(())
        elif op == "MaxPool":
            a = _attrs(node)
            k = tuple(a.get("kernel_shape", [2, 2]))
            s = tuple(a.get("strides", k))
            layers.append(NITIMaxPool(k, s))
            params.append(())
            h, w = (h - k[0]) // s[0] + 1, (w - k[1]) // s[1] + 1
        elif op == "AveragePool":
            a = _attrs(node)
            k = tuple(a.get("kernel_shape", [2, 2]))
            s = tuple(a.get("strides", k))
            layers.append(NITIAvgPool(k, s))
            params.append(())
            h, w = (h - k[0]) // s[0] + 1, (w - k[1]) // s[1] + 1
        elif op == "GlobalAveragePool":
            layers.append(GlobalAvgPool())
            params.append(())
            h = w = 1
        elif op in ("Flatten", "Reshape"):
            layers.append(Flatten())
            params.append(())
            pending_perm = chw_to_hwc_perm(c, h, w) if (h * w) > 1 else None
            flattened = True
            c, h, w = c * h * w, 1, 1
        elif op in ("Gemm", "MatMul"):
            a = _attrs(node)
            wt = tensor_to_np(init[node.input[1]])
            if op == "Gemm" and not int(a.get("transB", 0) or 0):
                wt = wt.T
            elif op == "MatMul":
                wt = wt.T  # (in, out) -> (out, in)
            if op == "Gemm" and len(node.input) > 2:
                raise ValueError(
                    "NITI FC layers carry no bias — re-export without bias"
                )
            w_in = wt.T  # (in, out)
            if pending_perm is not None:
                w_in = w_in[pending_perm]
                pending_perm = None
            if not flattened:
                layers.append(Flatten())
                params.append(())
                flattened = True
            layers.append(NITIConv2D(w_in.shape[0], w_in.shape[1], (1, 1)))
            params.append({"w": _quant(w_in.reshape(1, 1, *w_in.shape))})
            c, h, w = w_in.shape[1], 1, 1
        elif op in ("Softmax", "Dropout", "Identity"):
            pass  # NITI loss consumes logits; dropout is train-time only
        else:
            raise ValueError(f"unsupported ONNX op {op!r} for NITI import")
        i += 1

    layers.append(SqueezeLogits())
    params.append(())
    return Sequential(layers), params
