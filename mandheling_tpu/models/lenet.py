"""LeNet-family MNIST models.

- :func:`lenet_niti` — the NITI int8 flagship, channels 1->20->52, FC
  832->500->12 exactly as the reference `NITIInt8` module
  (demo/mnistTrain.cpp:132-188; channels padded to x4 for the reference's
  NC4HW4 tiling — kept for parity, the MXU is happy either way).
- :class:`LeNetFP32` — the fp32 `MnistV2` baseline (mnistTrain.cpp:28-77;
  channels 1->20->50, FC 800->500->10, relu6 on ip1).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..nn.layers import Flatten, NITIConv2D, NITIMaxPool, NITIRelu, SqueezeLogits
from ..nn.module import Sequential


def lenet_niti() -> Sequential:
    """NITI int8 LeNet: conv5x5(1->20) relu pool / conv5x5(20->52) relu pool /
    fc(832->500) relu / fc(500->12). Logits have 12 channels; targets one-hot
    over the first 10 (the loss handles the padding channels identically to
    the reference, NITI_CPULossGrad_Int8.cpp:169-178)."""
    return Sequential(
        [
            NITIConv2D(1, 20, (5, 5)),
            NITIRelu(),
            NITIMaxPool((2, 2), (2, 2)),
            NITIConv2D(20, 52, (5, 5)),
            NITIRelu(),
            NITIMaxPool((2, 2), (2, 2)),
            Flatten(),
            NITIConv2D(832, 500, (1, 1)),
            NITIRelu(),
            NITIConv2D(500, 12, (1, 1)),
            SqueezeLogits(),
        ]
    )


NUM_CLASSES = 10
NITI_LOGIT_CHANNELS = 12


class LeNetFP32:
    """fp32 MnistV2 baseline (trained with standard jax.grad + SGD)."""

    def init(self, key: jax.Array):
        k1, k2, k3, k4 = jax.random.split(key, 4)

        def glorot(key, shape):
            fan_in = shape[0] * shape[1] * shape[2]
            fan_out = shape[0] * shape[1] * shape[3]
            std = jnp.sqrt(2.0 / (fan_in + fan_out))
            return jax.random.normal(key, shape, jnp.float32) * std

        return {
            "conv1": {"w": glorot(k1, (5, 5, 1, 20)), "b": jnp.zeros((20,))},
            "conv2": {"w": glorot(k2, (5, 5, 20, 50)), "b": jnp.zeros((50,))},
            "ip1": {"w": glorot(k3, (1, 1, 800, 500)), "b": jnp.zeros((500,))},
            "ip2": {"w": glorot(k4, (1, 1, 500, 10)), "b": jnp.zeros((10,))},
        }

    def apply(self, params, x: jax.Array) -> jax.Array:
        """x: (B, 28, 28, 1) float32 -> logits (B, 10)."""

        def conv(p, x, window_strides=(1, 1)):
            return (
                jax.lax.conv_general_dilated(
                    x, p["w"], window_strides, "VALID",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
                + p["b"]
            )

        def pool(x):
            return jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            )

        x = pool(conv(params["conv1"], x))
        x = pool(conv(params["conv2"], x))
        x = x.reshape(x.shape[0], 1, 1, -1)
        x = jnp.clip(conv(params["ip1"], x), 0.0, 6.0)  # relu6, mnistTrain.cpp:46
        x = conv(params["ip2"], x)
        return x.reshape(x.shape[0], -1)
