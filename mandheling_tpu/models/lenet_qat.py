"""MnistInt8: the fake-quant QAT LeNet (reference `MnistInt8`,
demo/mnistTrain.cpp:78-130 — conv(1->20), conv(20->50), fc(800->500) relu6 +
dropout(0.5), fc(500->10); trained with float SGD over fake-quantized
weights/activations).

Documented deviation: the reference sets `convOption.depthwise = true` on
conv2 while giving it channel = {20, 50} (demo/mnistTrain.cpp:86-92) —
a depthwise conv with ic != oc, which MNN resolves through its grouped-conv
path. We use a dense 20->50 conv instead: the mixed depthwise/group oddity
looks like a config slip in the reference (every other depthwise use in the
tree has ic == oc), and a dense conv is the straightforward reading of the
layer's 20->50 shape. Depthwise QAT itself is covered by the MobileNet
models (models/mobilenet.py)."""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..nn import qat


class LeNetQAT:
    def __init__(self, bits: int = 8):
        self.bits = bits

    def init(self, key) -> Tuple[Dict, Dict]:
        k1, k2, k3, k4 = jax.random.split(key, 4)
        params = {
            "conv1": qat.qat_conv_init(k1, (5, 5, 1, 20), self.bits),
            "conv2": qat.qat_conv_init(k2, (5, 5, 20, 50), self.bits),
            "ip1": qat.qat_conv_init(k3, (1, 1, 800, 500), self.bits),
            "ip2": qat.qat_conv_init(k4, (1, 1, 500, 10), self.bits),
        }
        observers = {k: qat.qat_observer_init() for k in params}
        return params, observers

    def apply(
        self,
        params: Dict,
        observers: Dict,
        x: jax.Array,
        dropout_key=None,
        training: bool = True,
    ) -> Tuple[jax.Array, Dict]:
        def pool(x):
            return jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            )

        new_obs = {}
        x, new_obs["conv1"] = qat.qat_conv_apply(
            params["conv1"], observers["conv1"], x, bits=self.bits, training=training
        )
        x = pool(x)
        x, new_obs["conv2"] = qat.qat_conv_apply(
            params["conv2"], observers["conv2"], x, bits=self.bits, training=training
        )
        x = pool(x)
        x = x.reshape(x.shape[0], 1, 1, -1)
        x, new_obs["ip1"] = qat.qat_conv_apply(
            params["ip1"], observers["ip1"], x, bits=self.bits,
            activation=lambda v: jnp.clip(v, 0.0, 6.0), training=training,
        )
        if training and dropout_key is not None:
            keep = jax.random.bernoulli(dropout_key, 0.5, x.shape)
            x = jnp.where(keep, x / 0.5, 0.0)
        x, new_obs["ip2"] = qat.qat_conv_apply(
            params["ip2"], observers["ip2"], x, bits=self.bits, training=training
        )
        return x.reshape(x.shape[0], -1), new_obs
