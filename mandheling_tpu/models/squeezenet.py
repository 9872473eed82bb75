"""SqueezeNet v1.0 — NITI int8 version.

SqueezeNetV1.0 is one of the five models of the reference's headline
benchmark table (`execution-engine/benchmark/result/2020-3-22.md:22-25`:
avg 11.59 ms forward on Kirin 990 CPU fp16) and ships as a converted
benchmark model (`execution-engine/benchmark/models/SqueezeNetV1.0.mnn`).
Here it is a first-class trainable NITI model: every conv is the int8
NITI conv with power-of-two requantization, the Fire module's two expand
branches join through the exponent-aligned int8 channel concat
(`ops/eltwise.concat_int8` via `nn/blocks.ParallelConcat`), and the
classifier is the reference-style conv10 1x1 + global average pool
(SqueezeNet has no FC layers at all — the final conv maps to class
channels, matching the original architecture).

Geometry notes vs the fp32 original (trained-from-scratch NITI model, so
these change no contract): maxpool windows are 3x3 stride 2 VALID (the
original uses ceil_mode; VALID differs by at most one border row/col), and
there is no dropout (NITI's integer pipeline has no fractional scaling op;
the reference's NITI training models likewise contain none).
"""

from __future__ import annotations

from typing import List

from ..nn.blocks import GlobalAvgPool, ParallelConcat
from ..nn.layers import NITIConv2D, NITIMaxPool, NITIRelu, SqueezeLogits
from ..nn.module import NITILayer, Sequential


def fire(in_c: int, squeeze_c: int, expand1_c: int, expand3_c: int) -> Sequential:
    """Fire module: squeeze 1x1 -> relu -> concat[expand 1x1 + relu,
    expand 3x3 (SAME) + relu]."""
    return Sequential(
        [
            NITIConv2D(in_c, squeeze_c, (1, 1)),
            NITIRelu(),
            ParallelConcat(
                [
                    Sequential([NITIConv2D(squeeze_c, expand1_c, (1, 1)), NITIRelu()]),
                    Sequential(
                        [
                            NITIConv2D(squeeze_c, expand3_c, (3, 3), (1, 1), "SAME"),
                            NITIRelu(),
                        ]
                    ),
                ]
            ),
        ]
    )


# v1.0 plan: (squeeze, expand1x1, expand3x3) per fire module, with maxpools
# after conv1, fire4 and fire8 (the original v1.0 placement).
_FIRE_PLAN = [
    (16, 64, 64),  # fire2
    (16, 64, 64),  # fire3
    (32, 128, 128),  # fire4
    "pool",
    (32, 128, 128),  # fire5
    (48, 192, 192),  # fire6
    (48, 192, 192),  # fire7
    (64, 256, 256),  # fire8
    "pool",
    (64, 256, 256),  # fire9
]


def squeezenet_niti(num_classes: int = 1000) -> Sequential:
    """SqueezeNet v1.0 for 224x224x3 inputs (also runs at CIFAR scale —
    the model is fully convolutional down to the global average pool)."""
    layers: List[NITILayer] = [
        NITIConv2D(3, 96, (7, 7), (2, 2), "SAME"),
        NITIRelu(),
        NITIMaxPool((3, 3), (2, 2)),
    ]
    in_c = 96
    for entry in _FIRE_PLAN:
        if entry == "pool":
            layers.append(NITIMaxPool((3, 3), (2, 2)))
            continue
        s, e1, e3 = entry
        layers.append(fire(in_c, s, e1, e3))
        in_c = e1 + e3
    logit_width = (num_classes + 3) // 4 * 4
    layers += [
        NITIConv2D(in_c, logit_width, (1, 1)),  # conv10
        NITIRelu(),
        GlobalAvgPool(),
        SqueezeLogits(),
    ]
    return Sequential(layers)
