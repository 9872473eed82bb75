"""Float MobileNet (V1/V2) — the reference's fp32 express-built models.

Reference: `tools/train/source/models/MobilenetV2.cpp` (_ConvBnRelu at :16,
_BottleNeck at :31 — conv + BatchNorm + relu6, residual when stride==1 and
in==out) and `MobilenetV1.cpp`. These are the fp32 counterparts of the NITI
models in models/mobilenet.py, used by the fp32/QAT training configs and as
pretrained feature extractors for transfer learning.

Functional-style like LeNetFP32: `init(key) -> params`,
`apply(params, x, training) -> logits` with train/eval BatchNorm handled by
returning updated running stats from `apply_train`.
"""

from __future__ import annotations

from typing import Any, List, Tuple

import jax
import jax.numpy as jnp

from .mobilenet import CIFAR_PLAN, V1_CIFAR_PLAN


def _conv_init(key, shape):
    fan_in = shape[0] * shape[1] * shape[2]
    return jax.random.normal(key, shape, jnp.float32) * jnp.sqrt(2.0 / fan_in)


def _bn_init(c):
    return {
        "scale": jnp.ones((c,), jnp.float32),
        "bias": jnp.zeros((c,), jnp.float32),
        "mean": jnp.zeros((c,), jnp.float32),
        "var": jnp.ones((c,), jnp.float32),
    }


def _bn_apply(p, x, training: bool, momentum=0.99):
    if training:
        mean = jnp.mean(x, axis=(0, 1, 2))
        var = jnp.var(x, axis=(0, 1, 2))
        new_stats = {
            "mean": momentum * p["mean"] + (1 - momentum) * mean,
            "var": momentum * p["var"] + (1 - momentum) * var,
        }
    else:
        mean, var = p["mean"], p["var"]
        new_stats = {"mean": p["mean"], "var": p["var"]}
    y = (x - mean) * jax.lax.rsqrt(var + 1e-5) * p["scale"] + p["bias"]
    return y, new_stats


def _conv(x, w, stride=1, groups=1):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )


class MobileNetV2FP32:
    """CIFAR-scaled float MobileNetV2 (32x32 inputs, CIFAR_PLAN strides)."""

    def __init__(self, num_classes: int = 10, width_mult: float = 1.0):
        self.num_classes = num_classes
        self.wm = width_mult

    def _c(self, ch):
        return max(8, int(ch * self.wm) // 8 * 8)

    def _spec(self) -> List[Tuple[str, Any]]:
        """(kind, cfg) list: kind in {conv_bn, dw_bn, pw_bn_linear,
        bottleneck, head}. A bottleneck cfg is (sub_spec, residual)."""
        c = self._c
        spec: List[Tuple[str, Any]] = [("conv_bn", (3, c(32), 3, 1))]
        in_c = c(32)
        for expansion, out_c, n, stride in CIFAR_PLAN:
            out_c = c(out_c)
            for i in range(n):
                s = stride if i == 0 else 1
                mid = in_c * expansion
                sub: List[Tuple[str, Any]] = []
                if expansion != 1:
                    sub.append(("conv_bn", (in_c, mid, 1, 1)))
                sub.append(("dw_bn", (mid, 3, s)))
                sub.append(("pw_bn_linear", (mid, out_c, False)))
                spec.append(("bottleneck", (sub, in_c == out_c and s == 1)))
                in_c = out_c
        spec.append(("conv_bn", (in_c, c(1280), 1, 1)))
        spec.append(("head", (c(1280), self.num_classes)))
        return spec

    def _init_entry(self, key, kind, cfg):
        if kind == "conv_bn":
            ic, oc, k, _ = cfg
            return {"w": _conv_init(key, (k, k, ic, oc)), "bn": _bn_init(oc)}
        if kind == "dw_bn":
            ch, k, _ = cfg
            return {"w": _conv_init(key, (k, k, 1, ch)), "bn": _bn_init(ch)}
        if kind == "pw_bn_linear":
            ic, oc, _ = cfg
            return {"w": _conv_init(key, (1, 1, ic, oc)), "bn": _bn_init(oc)}
        if kind == "bottleneck":
            sub, _ = cfg
            keys = jax.random.split(key, len(sub))
            return [self._init_entry(k, kd, c) for k, (kd, c) in zip(keys, sub)]
        ic, nc = cfg  # head
        return {
            "w": _conv_init(key, (1, 1, ic, nc)),
            "b": jnp.zeros((nc,), jnp.float32),
        }

    def init(self, key: jax.Array):
        spec = self._spec()
        keys = jax.random.split(key, len(spec))
        return [self._init_entry(k, kind, cfg) for k, (kind, cfg) in zip(keys, spec)]

    def _apply_entry(self, p, kind, cfg, x, training):
        if kind == "conv_bn":
            _, _, _, stride = cfg
            y = _conv(x, p["w"], stride)
            y, stats = _bn_apply(p["bn"], y, training)
            return jnp.clip(y, 0.0, 6.0), {"w": p["w"], "bn": {**p["bn"], **stats}}
        if kind == "dw_bn":
            ch, _, stride = cfg
            y = _conv(x, p["w"], stride, groups=ch)
            y, stats = _bn_apply(p["bn"], y, training)
            return jnp.clip(y, 0.0, 6.0), {"w": p["w"], "bn": {**p["bn"], **stats}}
        if kind == "pw_bn_linear":
            y = _conv(x, p["w"], 1)
            y, stats = _bn_apply(p["bn"], y, training)  # linear bottleneck
            return y, {"w": p["w"], "bn": {**p["bn"], **stats}}
        if kind == "bottleneck":
            sub, residual = cfg
            y, new_sub = x, []
            for sp, (kd, c) in zip(p, sub):
                y, np_ = self._apply_entry(sp, kd, c, y, training)
                new_sub.append(np_)
            return (x + y if residual else y), new_sub
        # head: global avg pool -> 1x1 conv -> logits (relu6, MobilenetV2.cpp:24)
        x = jnp.mean(x, axis=(1, 2), keepdims=True)
        x = _conv(x, p["w"], 1) + p["b"]
        return x[:, 0, 0, :], p

    def apply(self, params, x: jax.Array, training: bool = False):
        """-> (logits, new_params_with_updated_bn_stats)."""
        new_params = []
        for p, (kind, cfg) in zip(params, self._spec()):
            x, np_ = self._apply_entry(p, kind, cfg, x, training)
            new_params.append(np_)
        return x, new_params


class MobileNetV1FP32(MobileNetV2FP32):
    """CIFAR-scaled float MobileNetV1: depthwise-separable stacks."""

    def _spec(self):
        c = self._c
        spec: List[Tuple[str, Any]] = [("conv_bn", (3, c(32), 3, 1))]
        in_c = c(32)
        for out_c, stride in V1_CIFAR_PLAN:
            out_c = c(out_c)
            spec.append(("dw_bn", (in_c, 3, stride)))
            spec.append(("conv_bn", (in_c, out_c, 1, 1)))
            in_c = out_c
        spec.append(("head", (in_c, self.num_classes)))
        return spec
