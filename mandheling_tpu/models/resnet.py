"""ResNet-18 (CIFAR-10 variant) — NITI int8 version.

The second mixed-precision CIFAR config (BASELINE.md configs). CIFAR-style
ResNet-18: 3x3 stem (no maxpool), stages [2,2,2,2] of basic blocks with
channel plan 64-128-256-512, strides 1-2-2-2, global average pool, FC.
Basic block = conv3x3 -> relu -> conv3x3 (+ projection 1x1 on the skip when
shape changes), residual via exponent-aligned int8 eltwise add with NOP
gradient passthrough (see nn/blocks.ResidualBlock).

NITI networks train without batch norm (integer-only; the NITI algorithm's
per-tensor power-of-two rescaling plays the normalization role), matching
the reference's NITI models which contain none.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp

from ..nn.blocks import GlobalAvgPool, _accum_grads
from ..nn.layers import NITIConv2D, NITIRelu, SqueezeLogits
from ..nn.module import NITILayer, Sequential
from ..ops import eltwise as elt_ops
from ..ops.qtensor import QTensor


class ProjectedResidualBlock(NITILayer):
    """y = requant(branch(x) + proj(x)) with a 1x1 strided projection on the
    skip path (standard ResNet downsample)."""

    def __init__(self, branch: Sequential, proj: NITIConv2D):
        self.branch = branch
        self.proj = proj

    def init(self, key):
        kb, kp = jax.random.split(key)
        return {"branch": self.branch.init(kb), "proj": self.proj.init(kp)}

    def fwd(self, params, q: QTensor, axis_name=None):
        out, res_b = self.branch.fwd(params["branch"], q, axis_name)
        skip, res_p = self.proj.fwd(params["proj"], q, axis_name)
        y, e = elt_ops.add_int8(out.data, out.exp, skip.data, skip.exp)
        return QTensor(y, e), (res_b, res_p)

    def bwd(self, params, res, gy, axis_name=None):
        res_b, res_p = res
        g_in_b, g_branch = self.branch.bwd(params["branch"], res_b, gy, axis_name)
        g_in_p, g_proj = self.proj.bwd(params["proj"], res_p, gy, axis_name)
        return _accum_grads(g_in_b, g_in_p), {"branch": g_branch, "proj": g_proj}


def _basic_block(in_c: int, out_c: int, stride: int) -> NITILayer:
    branch = Sequential(
        [
            NITIConv2D(in_c, out_c, (3, 3), (stride, stride), "SAME"),
            NITIRelu(),
            NITIConv2D(out_c, out_c, (3, 3), (1, 1), "SAME"),
        ]
    )
    if stride == 1 and in_c == out_c:
        from ..nn.blocks import ResidualBlock

        return ResidualBlock(branch)
    return ProjectedResidualBlock(
        branch, NITIConv2D(in_c, out_c, (1, 1), (stride, stride))
    )


def resnet18_niti(num_classes: int = 10) -> Sequential:
    layers: List[NITILayer] = [
        NITIConv2D(3, 64, (3, 3), (1, 1), "SAME"),
        NITIRelu(),
    ]
    in_c = 64
    for out_c, stride in [(64, 1), (128, 2), (256, 2), (512, 2)]:
        for i in range(2):
            s = stride if i == 0 else 1
            layers.append(_basic_block(in_c, out_c, s))
            layers.append(NITIRelu())
            in_c = out_c
    logit_width = (num_classes + 3) // 4 * 4
    layers += [
        GlobalAvgPool(),
        NITIConv2D(in_c, logit_width, (1, 1)),
        SqueezeLogits(),
    ]
    return Sequential(layers)


RESNET18_NITI_LOGITS = 12


def _bottleneck_v2(in_c: int, mid_c: int, stride: int) -> List[NITILayer]:
    """Pre-activation bottleneck (ResNet v2, He et al. 2016) in NITI form.

    resnet-v2-50 is the reference's headline benchmark model
    (`execution-engine/benchmark/result/2020-3-22.md:1-13`: avg 40.19 ms
    forward on Kirin 990 CPU fp16). NITI has no batch norm (integer-only;
    the per-tensor power-of-two rescaling plays the normalization role), so
    v2's BN-ReLU pre-activation reduces to a ReLU pre-activation:

    - shape-changing blocks: a shared pre-activation ReLU feeds BOTH the
      residual branch and the 1x1 strided projection (v2 projects from the
      pre-activated tensor) — expressed as `[NITIRelu(),
      ProjectedResidualBlock(branch, proj)]`;
    - identity blocks: the skip carries the UN-activated input (v2's
      identity shortcut bypasses pre-activation) — expressed as
      `ResidualBlock(Sequential([relu, ...]))`.
    """
    out_c = 4 * mid_c
    core = [
        NITIConv2D(in_c, mid_c, (1, 1)),
        NITIRelu(),
        NITIConv2D(mid_c, mid_c, (3, 3), (stride, stride), "SAME"),
        NITIRelu(),
        NITIConv2D(mid_c, out_c, (1, 1)),
    ]
    if stride == 1 and in_c == out_c:
        from ..nn.blocks import ResidualBlock

        return [ResidualBlock(Sequential([NITIRelu()] + core))]
    return [
        NITIRelu(),
        ProjectedResidualBlock(
            Sequential(core), NITIConv2D(in_c, out_c, (1, 1), (stride, stride))
        ),
    ]


def resnet50v2_niti(num_classes: int = 1000) -> Sequential:
    """ResNet-v2-50 for 224x224x3 ImageNet-scale inputs: 7x7/2 stem +
    3x3/2 maxpool, stages [3,4,6,3] of pre-activation bottlenecks
    (64-128-256-512 mid-channels, expansion 4), final ReLU, global average
    pool, 1x1 classifier. Fully convolutional down to the pool, so it also
    runs at CIFAR scale."""
    from ..nn.layers import NITIMaxPool

    layers: List[NITILayer] = [
        NITIConv2D(3, 64, (7, 7), (2, 2), "SAME"),
        NITIMaxPool((3, 3), (2, 2)),
    ]
    in_c = 64
    for mid_c, blocks, stride in [(64, 3, 1), (128, 4, 2), (256, 6, 2), (512, 3, 2)]:
        for i in range(blocks):
            s = stride if i == 0 else 1
            layers += _bottleneck_v2(in_c, mid_c, s)
            in_c = 4 * mid_c
    logit_width = (num_classes + 3) // 4 * 4
    layers += [
        NITIRelu(),
        GlobalAvgPool(),
        NITIConv2D(in_c, logit_width, (1, 1)),
        SqueezeLogits(),
    ]
    return Sequential(layers)
