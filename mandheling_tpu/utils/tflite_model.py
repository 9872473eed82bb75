"""TFLite model import/export — the TFLite leg of the reference's
converter (`tools/converter/source/tflite`, SURVEY.md section 2.9).

Import: `niti_model_from_tflite` builds a runnable, trainable NITI
`Sequential` straight from a `.tflite` graph (the TFLite analog of
`niti_model_from_onnx` / the reference's `turnModelToTrainable`).
Float32 and quantized (int8/uint8 per-tensor or per-axis) weight tensors
are both accepted — quantized weights are dequantized, then NITI
power-of-two requantized. `modules_from_tflite` yields the same
(kind, arrays) stream as `convert.modules_from_state_dict` for the
architecture-matched fp32 adapters.

Export: `tflite_from_sequential` serializes a trained NITI model as a
float32 `.tflite` graph (weights dequantized by their power-of-two
exponents) for deployment to TFLite-consuming runtimes — the reverse
direction the reference covers by converting into its own `.mnn` format.

Layout notes (TFLite -> here): CONV_2D filters are OHWI -> transpose
(1,2,3,0) to HWIO; DEPTHWISE_CONV_2D filters are (1,kh,kw,C) -> reshape
to our (kh,kw,1,C); FULLY_CONNECTED filters are (out,in) row-major over
an NHWC-flattened feature vector, so no CHW permutation is needed
(unlike torch/ONNX imports, which flatten channel-major).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..nn.blocks import GlobalAvgPool, NITIAvgPool, NITIDepthwiseConv2D
from ..nn.layers import Flatten, NITIConv2D, NITIMaxPool, NITIRelu, SqueezeLogits
from ..nn.module import Sequential
from ..ops.qtensor import QTensor, quantize_weights
from . import tflite_io as T


def _quant(w: np.ndarray) -> QTensor:
    return quantize_weights(jnp.asarray(w, jnp.float32))


def _padding_str(code: int) -> str:
    return "SAME" if code == T.PAD_SAME else "VALID"


def _check_bias(model: T.TFLModel, op: T.TFLOp) -> None:
    """NITI convs/FCs carry no bias; an all-zero bias tensor is dropped."""
    if len(op.inputs) < 3 or op.inputs[2] < 0:
        return
    bias = model.tensors[op.inputs[2]].dequantized()
    if bias is not None and np.any(bias != 0):
        raise ValueError(
            f"{op.name} carries a non-zero bias — NITI layers have no bias "
            "term; re-export without bias or fold it away"
        )


def _weights(model: T.TFLModel, idx: int) -> np.ndarray:
    w = model.tensors[idx].dequantized()
    if w is None:
        raise ValueError("weight tensor has no constant buffer")
    return w


def niti_model_from_tflite(path_or_bytes, input_shape=None):
    """TFLite graph -> (Sequential NITI model, quantized params).

    `input_shape` (N, H, W, C) overrides the graph's declared input shape
    (TFLite is NHWC natively — no layout transposition happens on
    activations, only on weight tensors)."""
    m = T.load_tflite(path_or_bytes)

    produced_by: Dict[int, int] = {}
    for i, op in enumerate(m.ops):
        for out in op.outputs:
            produced_by[out] = i
    consumers: Dict[int, int] = {}
    for op in m.ops:
        for t in op.inputs:
            consumers[t] = consumers.get(t, 0) + 1

    layers: List = []
    params: List = []

    def emit(layer, p=()):
        layers.append(layer)
        params.append(p)

    def fused_act(code: int, op_name: str):
        if code == T.ACT_NONE:
            return
        if code in (T.ACT_RELU, T.ACT_RELU6):
            # NITI relu; relu6's clamp is subsumed by int8 saturation at
            # the layer's power-of-two scale (documented deviation, same
            # as the reference's float->NITI conversion of relu6 nets)
            emit(NITIRelu())
            return
        raise ValueError(f"unsupported fused activation {code} on {op_name}")

    for op in m.ops:
        if op.inputs and consumers.get(op.inputs[0], 0) > 1:
            raise ValueError(
                "branching topology (tensor consumed twice) — import "
                "residual models through the architecture-matched adapters"
            )
        o = op.options
        if op.opcode == T.CONV_2D:
            if o.get("dilation", (1, 1)) != (1, 1):
                raise ValueError("dilated conv unsupported for NITI import")
            _check_bias(m, op)
            w = _weights(m, op.inputs[1]).transpose(1, 2, 3, 0)  # OHWI->HWIO
            emit(
                NITIConv2D(w.shape[2], w.shape[3], w.shape[:2],
                           o["stride"], _padding_str(o["padding"])),
                {"w": _quant(w)},
            )
            fused_act(o.get("fused_activation", 0), op.name)
        elif op.opcode == T.DEPTHWISE_CONV_2D:
            if o.get("depth_multiplier", 1) != 1:
                raise ValueError("depth_multiplier != 1 unsupported")
            _check_bias(m, op)
            w4 = _weights(m, op.inputs[1])  # (1, kh, kw, C)
            kh, kw, c = w4.shape[1], w4.shape[2], w4.shape[3]
            emit(
                NITIDepthwiseConv2D(c, (kh, kw), o["stride"],
                                    _padding_str(o["padding"])),
                {"w": _quant(w4.reshape(kh, kw, 1, c))},
            )
            fused_act(o.get("fused_activation", 0), op.name)
        elif op.opcode == T.FULLY_CONNECTED:
            _check_bias(m, op)
            w = _weights(m, op.inputs[1])  # (out, in)
            w_in = w.T  # (in, out); TFLite flattens NHWC -> no permutation
            if not any(isinstance(l, Flatten) for l in layers):
                emit(Flatten())
            emit(
                NITIConv2D(w_in.shape[0], w_in.shape[1], (1, 1)),
                {"w": _quant(w_in.reshape(1, 1, *w_in.shape))},
            )
            fused_act(o.get("fused_activation", 0), op.name)
        elif op.opcode == T.MAX_POOL_2D:
            emit(NITIMaxPool(o["window"], o["stride"]))
        elif op.opcode == T.AVERAGE_POOL_2D:
            emit(NITIAvgPool(o["window"], o["stride"]))
        elif op.opcode == T.MEAN:
            axes = m.tensors[op.inputs[1]].dequantized()
            if axes is None or sorted(int(a) for a in axes.ravel()) != [1, 2]:
                raise ValueError("MEAN supported only over spatial axes (1,2)")
            emit(GlobalAvgPool())
        elif op.opcode == T.RESHAPE:
            emit(Flatten())
        elif op.opcode == T.RELU:
            emit(NITIRelu())
        elif op.opcode in (T.SOFTMAX,):
            pass  # the NITI loss consumes logits
        elif op.opcode == T.RELU6:
            emit(NITIRelu())  # see fused_act note
        else:
            raise ValueError(f"unsupported TFLite op {op.name} for NITI import")

    emit(SqueezeLogits())
    return Sequential(layers), params


def modules_from_tflite(path_or_bytes) -> List[Tuple[str, Dict[str, np.ndarray]]]:
    """TFLite graph -> ordered (kind, arrays) module stream, the same
    format `convert.modules_from_state_dict` produces, for the
    architecture-matched fp32 adapters (conv weights HWIO; linear weights
    (out, in))."""
    m = T.load_tflite(path_or_bytes)
    out: List[Tuple[str, Dict[str, np.ndarray]]] = []
    for op in m.ops:
        if op.opcode == T.CONV_2D:
            entry = {"w": _weights(m, op.inputs[1]).transpose(1, 2, 3, 0)}
            if len(op.inputs) > 2 and op.inputs[2] >= 0:
                b = m.tensors[op.inputs[2]].dequantized()
                if b is not None:
                    entry["b"] = b
            out.append(("conv", entry))
        elif op.opcode == T.DEPTHWISE_CONV_2D:
            w4 = _weights(m, op.inputs[1])
            kh, kw, c = w4.shape[1], w4.shape[2], w4.shape[3]
            entry = {"w": w4.reshape(kh, kw, 1, c)}
            if len(op.inputs) > 2 and op.inputs[2] >= 0:
                b = m.tensors[op.inputs[2]].dequantized()
                if b is not None:
                    entry["b"] = b
            out.append(("conv", entry))
        elif op.opcode == T.FULLY_CONNECTED:
            entry = {"w": _weights(m, op.inputs[1])}
            if len(op.inputs) > 2 and op.inputs[2] >= 0:
                b = m.tensors[op.inputs[2]].dequantized()
                if b is not None:
                    entry["b"] = b
            out.append(("linear", entry))
    return out


# ---- export ---------------------------------------------------------------


def _same_pad(padding, kernel, stride, spatial) -> Optional[int]:
    """Map a layer's padding spec to a TFLite padding enum, or None when
    it is neither VALID nor SAME."""
    from ..ops.conv import resolve_padding

    if isinstance(padding, str):
        return T.PAD_VALID if padding.upper() == "VALID" else T.PAD_SAME
    resolved = resolve_padding(padding, kernel, stride, spatial)
    if resolved == ((0, 0), (0, 0)):
        return T.PAD_VALID
    if resolved == resolve_padding("SAME", kernel, stride, spatial):
        return T.PAD_SAME
    return None


def tflite_from_sequential(model: Sequential, params, input_shape) -> bytes:
    """Serialize a NITI Sequential as a float32 TFLite flatbuffer.

    `input_shape` = (N, H, W, C). Weights are dequantized
    (`data * 2^exp`). Unsupported layers raise with the layer type."""
    w = T.TFLiteWriter()
    n, h, wd, c = map(int, input_shape)
    cur = w.tensor((n, h, wd, c), name="input")
    spatial = (h, wd)

    def act_out(shape, name):
        return w.tensor(shape, name=name)

    for i, (layer, p) in enumerate(zip(model.layers, params)):
        lname = f"l{i}"
        if isinstance(layer, NITIConv2D) and layer.kernel == (1, 1) and spatial == (1, 1):
            # 1x1 conv on flattened features == FULLY_CONNECTED
            q = p["w"]
            wf = (np.asarray(q.data, np.float32)
                  * float(2.0) ** int(q.exp)).reshape(q.data.shape[2],
                                                      q.data.shape[3])
            wt = w.const(wf.T.astype(np.float32), name=f"{lname}/w")
            cur_flat = cur
            out = act_out((n, wf.shape[1]), f"{lname}/out")
            w.op(T.FULLY_CONNECTED, [cur_flat, wt, -1], [out],
                 T.OPT_FULLY_CONNECTED, {})
            cur = out
            c = wf.shape[1]
        elif isinstance(layer, NITIDepthwiseConv2D):
            q = p["w"]
            kh, kw = layer.kernel
            pad = _same_pad(layer.padding, layer.kernel, layer.stride, spatial)
            if pad is None:
                raise ValueError("explicit asymmetric padding needs a PAD op "
                                 "— unsupported in this exporter")
            wf = (np.asarray(q.data, np.float32) * 2.0 ** int(q.exp))
            wt = w.const(wf.reshape(1, kh, kw, c), name=f"{lname}/w")
            sh, sw = layer.stride
            oh = _out_dim(spatial[0], kh, sh, pad)
            ow = _out_dim(spatial[1], kw, sw, pad)
            out = act_out((n, oh, ow, c), f"{lname}/out")
            w.op(T.DEPTHWISE_CONV_2D, [cur, wt, -1], [out], T.OPT_DEPTHWISE,
                 {"padding": pad, "stride": (sh, sw), "depth_multiplier": 1})
            cur, spatial = out, (oh, ow)
        elif isinstance(layer, NITIConv2D):
            q = p["w"]
            kh, kw = layer.kernel
            pad = _same_pad(layer.padding, layer.kernel, layer.stride, spatial)
            if pad is None:
                raise ValueError("explicit asymmetric padding needs a PAD op "
                                 "— unsupported in this exporter")
            wf = np.asarray(q.data, np.float32) * 2.0 ** int(q.exp)  # HWIO
            wt = w.const(wf.transpose(3, 0, 1, 2), name=f"{lname}/w")  # OHWI
            sh, sw = layer.stride
            oh = _out_dim(spatial[0], kh, sh, pad)
            ow = _out_dim(spatial[1], kw, sw, pad)
            oc = wf.shape[3]
            out = act_out((n, oh, ow, oc), f"{lname}/out")
            w.op(T.CONV_2D, [cur, wt, -1], [out], T.OPT_CONV2D,
                 {"padding": pad, "stride": (sh, sw)})
            cur, spatial, c = out, (oh, ow), oc
        elif isinstance(layer, NITIRelu):
            out = act_out(_shape(n, spatial, c), f"{lname}/out")
            w.op(T.RELU, [cur], [out])
            cur = out
        elif isinstance(layer, NITIMaxPool):
            wh, ww = layer.window
            sh, sw = layer.stride
            oh, ow = (spatial[0] - wh) // sh + 1, (spatial[1] - ww) // sw + 1
            out = act_out((n, oh, ow, c), f"{lname}/out")
            w.op(T.MAX_POOL_2D, [cur], [out], T.OPT_POOL2D,
                 {"padding": T.PAD_VALID, "stride": (sh, sw),
                  "window": (wh, ww)})
            cur, spatial = out, (oh, ow)
        elif isinstance(layer, NITIAvgPool):
            if getattr(layer, "pad", 0):
                raise ValueError(
                    "TFLite export of NITIAvgPool with pad > 0 is not "
                    "supported (would silently drop the padding); use "
                    "pad=0 or an explicit PAD layer"
                )
            wh, ww = layer.window
            sh, sw = layer.stride if layer.stride else layer.window
            oh, ow = (spatial[0] - wh) // sh + 1, (spatial[1] - ww) // sw + 1
            out = act_out((n, oh, ow, c), f"{lname}/out")
            w.op(T.AVERAGE_POOL_2D, [cur], [out], T.OPT_POOL2D,
                 {"padding": T.PAD_VALID, "stride": (sh, sw),
                  "window": (wh, ww)})
            cur, spatial = out, (oh, ow)
        elif isinstance(layer, GlobalAvgPool):
            axes = w.const(np.asarray([1, 2], np.int32), name=f"{lname}/axes")
            out = act_out((n, 1, 1, c), f"{lname}/out")
            w.op(T.MEAN, [cur, axes], [out], T.OPT_REDUCER,
                 {"keep_dims": True})
            cur, spatial = out, (1, 1)
        elif isinstance(layer, Flatten):
            feat = spatial[0] * spatial[1] * c
            shape_t = w.const(np.asarray([n, feat], np.int32),
                              name=f"{lname}/shape")
            out = act_out((n, feat), f"{lname}/out")
            w.op(T.RESHAPE, [cur, shape_t], [out], T.OPT_RESHAPE,
                 {"new_shape": [n, feat]})
            cur, spatial, c = out, (1, 1), feat
        elif isinstance(layer, SqueezeLogits):
            pass  # logits already (N, C) after the FC path
        else:
            raise ValueError(
                f"layer {type(layer).__name__} unsupported by TFLite export"
            )
    return w.finish([0], [cur])


def _out_dim(size: int, k: int, s: int, pad_code: int) -> int:
    if pad_code == T.PAD_SAME:
        return -(-size // s)
    return (size - k) // s + 1


def _shape(n, spatial, c):
    if spatial == (1, 1):
        return (n, c)
    return (n, spatial[0], spatial[1], c)
