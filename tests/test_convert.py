"""Torch-import converter tests: forward parity between the source torch
model and the converted mandheling_tpu fp32 model.

The torch mirrors are built with XLA-SAME (asymmetric) padding so that a
correct weight conversion yields numerically identical forwards.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

from mandheling_tpu.models.lenet import LeNetFP32  # noqa: E402
from mandheling_tpu.models.mobilenet_fp32 import (  # noqa: E402
    MobileNetV1FP32,
    MobileNetV2FP32,
)
from mandheling_tpu.utils.convert import (  # noqa: E402
    lenet_fp32_from_torch,
    mobilenet_fp32_from_torch,
)


class TorchLeNet(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(1, 20, 5)
        self.conv2 = nn.Conv2d(20, 50, 5)
        self.fc1 = nn.Linear(800, 500)
        self.fc2 = nn.Linear(500, 10)
        self.pool = nn.MaxPool2d(2)

    def forward(self, x):
        x = self.pool(self.conv1(x))
        x = self.pool(self.conv2(x))
        x = x.flatten(1)
        x = torch.clamp(self.fc1(x), 0.0, 6.0)
        return self.fc2(x)


def test_lenet_torch_parity():
    tm = TorchLeNet().eval()
    params = lenet_fp32_from_torch(tm.state_dict())
    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (4, 28, 28, 1)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    out = np.asarray(LeNetFP32().apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def _xla_same_pad(i, k, s):
    out = -(-i // s)
    total = max((out - 1) * s + k - i, 0)
    lo = total // 2
    return lo, total - lo, out


class _SameConv(nn.Module):
    """Conv with XLA-SAME asymmetric padding (matches lax SAME)."""

    def __init__(self, ic, oc, k, s, spatial, groups=1):
        super().__init__()
        lo, hi, out = _xla_same_pad(spatial, k, s)
        self.pad = nn.ZeroPad2d((lo, hi, lo, hi))
        self.conv = nn.Conv2d(ic, oc, k, stride=s, groups=groups, bias=False)
        self.out_spatial = out

    def forward(self, x):
        return self.conv(self.pad(x))


class _Bottleneck(nn.Module):
    def __init__(self, block, residual):
        super().__init__()
        self.block = block
        self.residual = residual

    def forward(self, x):
        y = self.block(x)
        return x + y if self.residual else y


def _torch_from_spec(model, spatial=32):
    """Build a torch mirror of MobileNetV{1,2}FP32._spec() with module
    registration in spec order (so state_dict order matches)."""

    def entry_modules(kind, cfg, spatial):
        if kind == "conv_bn":
            ic, oc, k, s = cfg
            conv = _SameConv(ic, oc, k, s, spatial)
            return (
                nn.Sequential(conv, nn.BatchNorm2d(oc), nn.ReLU6()),
                conv.out_spatial,
            )
        if kind == "dw_bn":
            ch, k, s = cfg
            conv = _SameConv(ch, ch, k, s, spatial, groups=ch)
            return (
                nn.Sequential(conv, nn.BatchNorm2d(ch), nn.ReLU6()),
                conv.out_spatial,
            )
        if kind == "pw_bn_linear":
            ic, oc, _ = cfg
            conv = _SameConv(ic, oc, 1, 1, spatial)
            return nn.Sequential(conv, nn.BatchNorm2d(oc)), spatial
        if kind == "bottleneck":
            sub, residual = cfg
            mods = []
            for kd, c in sub:
                m, spatial = entry_modules(kd, c, spatial)
                mods.append(m)
            return _Bottleneck(nn.Sequential(*mods), residual), spatial
        ic, nc = cfg  # head
        return (
            nn.Sequential(
                nn.AdaptiveAvgPool2d(1), nn.Flatten(), nn.Linear(ic, nc)
            ),
            1,
        )

    mods = []
    for kind, cfg in model._spec():
        m, spatial = entry_modules(kind, cfg, spatial)
        mods.append(m)
    return nn.Sequential(*mods)


@pytest.mark.parametrize("cls", [MobileNetV1FP32, MobileNetV2FP32])
def test_mobilenet_torch_parity(cls):
    model = cls(num_classes=10)
    tm = _torch_from_spec(model)
    # make BN running stats non-trivial so a scale/var mix-up would show
    tm.train()
    with torch.no_grad():
        tm(torch.randn(8, 3, 32, 32))
    tm.eval()

    params = mobilenet_fp32_from_torch(tm.state_dict(), model)
    rng = np.random.default_rng(1)
    x = rng.normal(0, 1, (2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    out, _ = model.apply(params, jnp.asarray(x), training=False)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-3, atol=1e-3)


def test_arch_mismatch_raises():
    tm = TorchLeNet()
    with pytest.raises(ValueError):
        mobilenet_fp32_from_torch(tm.state_dict(), MobileNetV2FP32())
