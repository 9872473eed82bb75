"""Float32 ResNet-18 (CIFAR geometry) — the fp32 comparison axis for the
NITI int8 ResNet-18 (`models/resnet.resnet18_niti`), mirroring the
reference's own MnistTrain-vs-NITIInt8Train comparison protocol
(`demo/MnistUtils.cpp:35,338`). Same stem/stage plan as the NITI model
(3x3 stem, stages [(64,1),(128,2),(256,2),(512,2)] x2 blocks) with
conv+BN+relu blocks and identity/projection skips.
"""

from __future__ import annotations

from typing import Any, List

import jax
import jax.numpy as jnp

from .mobilenet_fp32 import _bn_apply, _bn_init, _conv, _conv_init

PLAN = [(64, 1), (128, 2), (256, 2), (512, 2)]


class ResNet18FP32:
    def __init__(self, num_classes: int = 10):
        self.num_classes = num_classes

    def _blocks(self):
        blocks = []
        in_c = 64
        for out_c, stride in PLAN:
            for i in range(2):
                s = stride if i == 0 else 1
                blocks.append((in_c, out_c, s))
                in_c = out_c
        return blocks

    def init(self, key: jax.Array) -> Any:
        blocks = self._blocks()
        keys = jax.random.split(key, 2 * len(blocks) + 3)
        params: List[Any] = []
        params.append({"w": _conv_init(keys[0], (3, 3, 3, 64)),
                       "bn": _bn_init(64)})
        ki = 1
        for in_c, out_c, s in blocks:
            p = {
                "w1": _conv_init(keys[ki], (3, 3, in_c, out_c)),
                "bn1": _bn_init(out_c),
                "w2": _conv_init(keys[ki + 1], (3, 3, out_c, out_c)),
                "bn2": _bn_init(out_c),
            }
            if s != 1 or in_c != out_c:
                p["wp"] = _conv_init(keys[ki + 1], (1, 1, in_c, out_c))
                p["bnp"] = _bn_init(out_c)
            params.append(p)
            ki += 2
        params.append({
            "w": _conv_init(keys[-1], (1, 1, 512, self.num_classes)),
            "b": jnp.zeros((self.num_classes,), jnp.float32),
        })
        return params

    def apply(self, params, x: jax.Array, training: bool = False):
        """-> (logits, new_params_with_updated_bn_stats) — the same
        convention as MobileNetV2FP32.apply."""

        def bn(p, key, y):
            out, stats = _bn_apply(p[key], y, training)
            return out, {**p[key], **stats}

        new_params: List[Any] = []
        stem = params[0]
        y, bns = bn(stem, "bn", _conv(x, stem["w"]))
        new_params.append({"w": stem["w"], "bn": bns})
        x = jax.nn.relu(y)
        for p, (in_c, out_c, s) in zip(params[1:-1], self._blocks()):
            np_ = dict(p)
            y, np_["bn1"] = bn(p, "bn1", _conv(x, p["w1"], s))
            y = jax.nn.relu(y)
            y, np_["bn2"] = bn(p, "bn2", _conv(y, p["w2"]))
            skip = x
            if "wp" in p:
                skip, np_["bnp"] = bn(p, "bnp", _conv(x, p["wp"], s))
            x = jax.nn.relu(y + skip)
            new_params.append(np_)
        x = jnp.mean(x, axis=(1, 2), keepdims=True)
        head = params[-1]
        new_params.append(head)
        x = _conv(x, head["w"]) + head["b"]
        return x.reshape(x.shape[0], -1), new_params
