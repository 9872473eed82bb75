"""MobileNet-V2 (CIFAR-10 variant) — NITI int8 and fp32 versions.

Reference: `tools/train/source/models/MobilenetV2.cpp` (fp32, express-built;
its bottleneck = expand 1x1 -> depthwise 3x3 -> project 1x1 with residual
when stride==1 and in==out) and the MobilenetV2 training/transfer demos
(`demo/MobilenetV2Utils.cpp:34`, `demo/mobilenetV2Train.cpp:29-53`).

The NITI variant is this rebuild's mixed-precision CIFAR config
(BASELINE.md configs; SURVEY.md section 7 step 5): every conv is an int8
NITI layer, residual adds are exponent-aligned int8 eltwise. Widths are
CIFAR-scaled (32x32 inputs, stride plan 1-1-2-2-2 instead of ImageNet's).
"""

from __future__ import annotations

from typing import List

from ..nn.blocks import (
    GlobalAvgPool,
    NITIAvgPool,
    NITIDepthwiseConv2D,
    ResidualBlock,
)
from ..nn.layers import Flatten, NITIConv2D, NITIMaxPool, SqueezeLogits
from ..nn.module import NITILayer, Sequential

# CIFAR MobileNetV2 plan: (expansion, out_channels, num_blocks, stride)
CIFAR_PLAN = [
    (1, 16, 1, 1),
    (6, 24, 2, 1),  # stride 1 for 32x32 inputs
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
]


# ImageNet-224 MobileNetV2 plan (the geometry of the reference's headline
# benchmark model MobileNetV2_224, `benchmark/result/2020-3-22.md:14-17`):
# stem stride 2, standard stage strides.
IMAGENET_PLAN = [
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
]


def _bottleneck(in_c: int, out_c: int, expansion: int, stride: int,
                dw_per_channel: bool = False, proj_bits: int = 7) -> NITILayer:
    mid = in_c * expansion
    layers: List[NITILayer] = []
    if expansion != 1:
        layers += [NITIConv2D(in_c, mid, (1, 1), act="relu6")]
    layers += [
        NITIDepthwiseConv2D(mid, (3, 3), (stride, stride), "SAME",
                            per_channel=dw_per_channel, act="relu6"),
        NITIConv2D(mid, out_c, (1, 1), out_bits=proj_bits),
    ]
    seq = Sequential(layers)
    if stride == 1 and in_c == out_c:
        return ResidualBlock(seq)
    return seq


class _SeqFlatten(Sequential):
    pass


def mobilenet_v2_niti(
    num_classes: int = 10, width_mult: float = 1.0, variant: str = "cifar",
    dw_per_channel: bool = False, proj_bits: int = 7,
) -> Sequential:
    """NITI int8 MobileNetV2. Logit channels padded to a multiple of
    4 like the reference pads NITI channels (mnistTrain.cpp:137-152).
    variant="cifar" (32x32, stride plan 1-1-2-2-2) or "imagenet" (224x224,
    stem stride 2 + standard strides — the reference benchmark geometry).

    proj_bits=15 requants the linear-projection 1x1 outputs (and the
    residual joins they feed) to int16 instead of int8 — this framework's
    bottleneck-precision extension (r5 MNv2 study: per-tensor int8 at the
    projections is the isolated full-NITI training blocker,
    DIVERGENCE_r04.json mnv2_structure_isolation; the reference only
    trains MNv2 fp32/QAT, demo/MobilenetV2Utils.cpp:34)."""

    if variant not in ("cifar", "imagenet"):
        raise ValueError(f"variant must be 'cifar' or 'imagenet', got {variant!r}")

    def c(ch):
        return max(4, int(ch * width_mult) // 4 * 4)

    stem_stride = 2 if variant == "imagenet" else 1
    plan = IMAGENET_PLAN if variant == "imagenet" else CIFAR_PLAN
    layers: List[NITILayer] = [
        NITIConv2D(3, c(32), (3, 3), (stem_stride, stem_stride), "SAME",
                   act="relu6"),
    ]
    in_c = c(32)
    for expansion, out_c, n, stride in plan:
        out_c = c(out_c)
        for i in range(n):
            s = stride if i == 0 else 1
            block = _bottleneck(in_c, out_c, expansion, s,
                                dw_per_channel=dw_per_channel,
                                proj_bits=proj_bits)
            if isinstance(block, ResidualBlock):
                layers.append(block)
            else:
                layers.extend(block.layers)
            in_c = out_c
    head = c(1280)
    logit_width = (num_classes + 3) // 4 * 4
    layers += [
        NITIConv2D(in_c, head, (1, 1), act="relu6"),
        GlobalAvgPool(),
        NITIConv2D(head, logit_width, (1, 1)),
        SqueezeLogits(),
    ]
    return Sequential(layers)


MOBILENET_V2_NITI_LOGITS = 12  # 10 classes padded to x4

# MobileNet-V1 plan (tools/train/source/models/MobilenetV1.cpp: 3x3 stem then
# 13 depthwise-separable blocks; CIFAR-scaled strides like the V2 plan above):
# (out_channels, stride)
V1_CIFAR_PLAN = [
    (64, 1),
    (128, 1),  # stride 1 for 32x32 inputs (ImageNet uses 2)
    (128, 1),
    (256, 2),
    (256, 1),
    (512, 2),
    (512, 1), (512, 1), (512, 1), (512, 1), (512, 1),
    (1024, 2),
    (1024, 1),
]


# ImageNet-224 MobileNetV1 plan (mobilenet-v1-1.0 in the reference benchmark
# table, `benchmark/result/2020-3-22.md:18-21`): stem stride 2, standard
# depthwise strides.
V1_IMAGENET_PLAN = [
    (64, 1),
    (128, 2),
    (128, 1),
    (256, 2),
    (256, 1),
    (512, 2),
    (512, 1), (512, 1), (512, 1), (512, 1), (512, 1),
    (1024, 2),
    (1024, 1),
]


def mobilenet_v1_niti(
    num_classes: int = 10, width_mult: float = 1.0, variant: str = "cifar",
    dw_per_channel: bool = False,
) -> Sequential:
    """NITI int8 MobileNetV1: depthwise 3x3 + pointwise 1x1 pairs.
    variant="cifar" or "imagenet" (see mobilenet_v2_niti)."""

    if variant not in ("cifar", "imagenet"):
        raise ValueError(f"variant must be 'cifar' or 'imagenet', got {variant!r}")

    def c(ch):
        return max(4, int(ch * width_mult) // 4 * 4)

    stem_stride = 2 if variant == "imagenet" else 1
    plan = V1_IMAGENET_PLAN if variant == "imagenet" else V1_CIFAR_PLAN
    layers: List[NITILayer] = [
        NITIConv2D(3, c(32), (3, 3), (stem_stride, stem_stride), "SAME",
                   act="relu6"),
    ]
    in_c = c(32)
    for out_c, stride in plan:
        out_c = c(out_c)
        layers += [
            NITIDepthwiseConv2D(in_c, (3, 3), (stride, stride), "SAME",
                                per_channel=dw_per_channel, act="relu6"),
            NITIConv2D(in_c, out_c, (1, 1), act="relu6"),
        ]
        in_c = out_c
    logit_width = (num_classes + 3) // 4 * 4
    layers += [
        GlobalAvgPool(),
        NITIConv2D(in_c, logit_width, (1, 1)),
        SqueezeLogits(),
    ]
    return Sequential(layers)
