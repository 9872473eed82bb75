"""Depthwise conv numerics + MobileNetV2/ResNet18 NITI training smoke tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mandheling_tpu.data.cifar import synthetic_cifar
from mandheling_tpu.data.loader import onehot_padded
from mandheling_tpu.models.mobilenet import mobilenet_v2_niti
from mandheling_tpu.models.resnet import resnet18_niti
from mandheling_tpu.ops import depthwise as dw_ops
from mandheling_tpu.ops import numerics
from mandheling_tpu.train import make_train_step


def rand_int8(rng, shape, lo=-25, hi=25):
    return rng.integers(lo, hi, shape).astype(np.int8)


def naive_dw_acc(x, w, stride=(1, 1), pad=((1, 1), (1, 1))):
    x = np.asarray(x, np.int32)
    w = np.asarray(w, np.int32)
    x = np.pad(x, ((0, 0), pad[0], pad[1], (0, 0)))
    b, ih, iw, c = x.shape
    kh, kw, _, _ = w.shape
    sh, sw = stride
    oh = (ih - kh) // sh + 1
    ow = (iw - kw) // sw + 1
    out = np.zeros((b, oh, ow, c), np.int32)
    for bi in range(b):
        for y in range(oh):
            for xx in range(ow):
                patch = x[bi, y * sh : y * sh + kh, xx * sw : xx * sw + kw, :]
                out[bi, y, xx, :] = np.sum(patch * w[:, :, 0, :], axis=(0, 1))
    return out


@pytest.mark.parametrize("stride", [(1, 1), (2, 2)])
def test_dwconv_acc_matches_naive(stride):
    from mandheling_tpu.ops.conv import resolve_padding

    rng = np.random.default_rng(0)
    x = rand_int8(rng, (2, 8, 8, 6))
    w = rand_int8(rng, (3, 3, 1, 6))
    got = np.asarray(
        dw_ops.dwconv2d_int8_acc(jnp.asarray(x), jnp.asarray(w), stride, "SAME")
    )
    pad = resolve_padding("SAME", (3, 3), stride, (8, 8))
    expected = naive_dw_acc(x, w, stride, pad)
    np.testing.assert_array_equal(got, expected)


def test_dwconv_grads_shapes_and_requant():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rand_int8(rng, (2, 8, 8, 6)))
    w = jnp.asarray(rand_int8(rng, (3, 3, 1, 6)))
    y, e = dw_ops.dwconv2d_forward(x, jnp.int32(-5), w, jnp.int32(-6))
    gy = jnp.asarray(rand_int8(rng, y.shape))
    gx = dw_ops.dwconv2d_input_grad(gy, w, (8, 8))
    gw = dw_ops.dwconv2d_filter_grad(x, gy, (3, 3))
    assert gx.shape == x.shape and gx.dtype == jnp.int8
    assert gw.shape == w.shape and gw.dtype == jnp.int8
    # dw filter grad accumulator check vs naive
    acc = np.zeros((3, 3, 1, 6), np.int32)
    xp = np.pad(np.asarray(x, np.int32), ((0, 0), (1, 1), (1, 1), (0, 0)))
    gyn = np.asarray(gy, np.int32)
    for dy in range(3):
        for dx in range(3):
            acc[dy, dx, 0] = np.sum(
                xp[:, dy : dy + 8, dx : dx + 8, :] * gyn, axis=(0, 1, 2)
            )
    expected = np.asarray(numerics.requant_grad(jnp.asarray(acc), margin=2))
    np.testing.assert_array_equal(np.asarray(gw), expected)


def test_avgpool_int8():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rand_int8(rng, (1, 4, 4, 3), -100, 100))
    y, e = dw_ops.avgpool2d_int8(x, jnp.int32(-3), (2, 2))
    expected = np.asarray(x, np.int32).reshape(1, 2, 2, 2, 2, 3)
    expected = expected.transpose(0, 1, 3, 5, 2, 4).reshape(1, 2, 2, 3, 4)
    # truncating division of the window sum
    sums = expected.sum(-1)
    trunc = np.sign(sums) * (np.abs(sums) // 4)
    np.testing.assert_array_equal(np.asarray(y, np.int32), trunc)
    assert int(e) == -3


def _smoke_train(model_fn, logits_width, steps=3, batch=16):
    model = model_fn()
    params = model.init(jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(model))
    x, y = synthetic_cifar(batch * steps, seed=0)
    losses = []
    p = params
    for i in range(steps):
        bx = jnp.asarray(x[i * batch : (i + 1) * batch].astype(np.float32))
        oh = jnp.asarray(onehot_padded(y[i * batch : (i + 1) * batch], 10, logits_width))
        p, loss = step(p, bx, oh)
        losses.append(float(loss))
    assert np.isfinite(losses).all(), losses
    # at least one weight tensor must have changed
    changed = any(
        not np.array_equal(np.asarray(a.data), np.asarray(b.data))
        for a, b in zip(jax.tree.leaves(params, is_leaf=lambda l: hasattr(l, "data")),
                        jax.tree.leaves(p, is_leaf=lambda l: hasattr(l, "data")))
        if hasattr(a, "data")
    )
    assert changed
    return losses


@pytest.mark.slow
def test_mobilenet_v2_niti_smoke():
    _smoke_train(lambda: mobilenet_v2_niti(width_mult=0.25), 12)


@pytest.mark.slow
def test_resnet18_niti_smoke():
    _smoke_train(resnet18_niti, 12, steps=2, batch=8)


@pytest.mark.slow
def test_mobilenet_v1_niti_smoke():
    from mandheling_tpu.models.mobilenet import mobilenet_v1_niti

    _smoke_train(lambda: mobilenet_v1_niti(width_mult=0.25), 12, steps=2, batch=8)


@pytest.mark.slow
def test_mobilenet_fp32_train_smoke():
    import jax
    import jax.numpy as jnp

    from mandheling_tpu.models import MobileNetV1FP32, MobileNetV2FP32

    for cls in (MobileNetV1FP32, MobileNetV2FP32):
        model = cls(num_classes=10, width_mult=0.25)
        params = model.init(jax.random.PRNGKey(0))
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))

        def loss_fn(p):
            logits, newp = model.apply(p, x, training=True)
            return jnp.mean(jax.nn.logsumexp(logits, -1) - logits[:, 0]), newp

        (loss, newp), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        assert jnp.isfinite(loss)
        # gradient reaches the stem conv and the head
        assert float(jnp.max(jnp.abs(grads[0]["w"]))) > 0
        assert float(jnp.max(jnp.abs(grads[-1]["w"]))) > 0
        # eval path uses running stats and is deterministic
        l1, _ = model.apply(newp, x, training=False)
        l2, _ = model.apply(newp, x, training=False)
        assert jnp.allclose(l1, l2)


def test_dw_per_channel_uniform_vector_matches_scalar():
    """A uniform per-channel exponent vector must reproduce the per-tensor
    path bit-for-bit (zero alignment shifts) — forward, input grad, and
    filter grad."""
    import jax

    from mandheling_tpu.ops import depthwise as dw_ops

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.integers(-90, 90, (2, 9, 9, 8)).astype(np.int8))
    w = jnp.asarray(rng.integers(-90, 90, (3, 3, 1, 8)).astype(np.int8))
    gy = jnp.asarray(rng.integers(-90, 90, (2, 9, 9, 8)).astype(np.int8))
    vec = jnp.full((8,), -7, jnp.int32)

    ys, es = jax.jit(dw_ops.dwconv2d_forward)(x, jnp.int32(-6), w, jnp.int32(-7))
    yv, ev = jax.jit(dw_ops.dwconv2d_forward)(x, jnp.int32(-6), w, vec)
    np.testing.assert_array_equal(np.asarray(ys), np.asarray(yv))
    assert int(es) == int(ev)

    gs = jax.jit(lambda g, wt: dw_ops.dwconv2d_input_grad(g, wt, (9, 9)))(gy, w)
    gv = jax.jit(lambda g, wt: dw_ops.dwconv2d_input_grad(
        g, wt, (9, 9), w_exp=vec))(gy, w)
    np.testing.assert_array_equal(np.asarray(gs), np.asarray(gv))

    fs = jax.jit(lambda a, g: dw_ops.dwconv2d_filter_grad(a, g, (3, 3)))(x, gy)
    fv = jax.jit(lambda a, g: dw_ops.dwconv2d_filter_grad(
        a, g, (3, 3), w_exp=vec))(x, gy)
    np.testing.assert_array_equal(np.asarray(fs), np.asarray(fv))


def test_dw_per_channel_value_equivalence():
    """Two weight representations of the SAME real values — per-tensor
    (data, -7) vs per-channel (data>>k scaled, -7+k with k trailing-zero
    data) — must produce the identical int8 forward output: the aligned
    accumulator reconstructs the exact products."""
    import jax

    from mandheling_tpu.ops import depthwise as dw_ops

    rng = np.random.default_rng(12)
    x = jnp.asarray(rng.integers(-90, 90, (2, 9, 9, 4)).astype(np.int8))
    base = rng.integers(-15, 16, (3, 3, 1, 4)).astype(np.int32)
    ks = np.array([0, 1, 2, 3], np.int32)
    # per-tensor rep: data_pt = base << k at exp -7 (value = base*2^(k-7))
    w_pt = (base << ks[None, None, None, :]).astype(np.int8)
    # per-channel rep: data_pc = base at exp -7+k — same values
    w_pc = base.astype(np.int8)
    exps = jnp.asarray(-7 + ks)

    y_pt, e_pt = jax.jit(dw_ops.dwconv2d_forward)(
        x, jnp.int32(-6), jnp.asarray(w_pt), jnp.int32(-7))
    y_pc, e_pc = jax.jit(dw_ops.dwconv2d_forward)(
        x, jnp.int32(-6), jnp.asarray(w_pc), exps)
    np.testing.assert_array_equal(np.asarray(y_pt), np.asarray(y_pc))
    assert int(e_pt) == int(e_pc)


def test_mobilenet_v2_per_channel_train_step():
    """dw_per_channel=True model: init yields vector dw exponents, one
    jitted train step runs, and the update preserves them."""
    import jax

    from mandheling_tpu.data import onehot_padded
    from mandheling_tpu.models.mobilenet import mobilenet_v2_niti
    from mandheling_tpu.train import jit_train_step

    model = mobilenet_v2_niti(width_mult=0.25, dw_per_channel=True)
    params = model.init(jax.random.PRNGKey(0))
    vec_exps = [l for l in jax.tree_util.tree_leaves(params)
                if hasattr(l, "dtype") and l.dtype == jnp.int32 and l.ndim == 1]
    assert len(vec_exps) == 17  # one per dw layer in the CIFAR plan
    step = jit_train_step(model)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (8, 32, 32, 3)), jnp.float32)
    oh = jnp.asarray(onehot_padded(rng.integers(0, 10, 8), 10, 12))
    new_params, loss = step(params, x, oh)
    assert np.isfinite(float(loss))
    new_vecs = [l for l in jax.tree_util.tree_leaves(new_params)
                if hasattr(l, "dtype") and l.dtype == jnp.int32 and l.ndim == 1]
    assert len(new_vecs) == len(vec_exps)


def test_fused_relu6_matches_separate_layers():
    """Conv/dw with act="relu6" must be bit-identical (fwd AND bwd) to the
    [conv, NITIRelu6] two-layer composition — the fusion is a performance
    form only (measured ~30% at MNv2 scale, ops/conv._apply_act)."""
    import jax

    from mandheling_tpu.nn.blocks import NITIDepthwiseConv2D
    from mandheling_tpu.nn.layers import NITIConv2D, NITIRelu6
    from mandheling_tpu.nn.module import Sequential
    from mandheling_tpu.ops.qtensor import QTensor

    rng = np.random.default_rng(5)
    q = QTensor(
        jnp.asarray(rng.integers(-90, 90, (2, 8, 8, 6)).astype(np.int8)),
        jnp.int32(-3),
    )
    gy = jnp.asarray(rng.integers(-50, 50, (2, 8, 8, 10)).astype(np.int8))
    key = jax.random.PRNGKey(0)

    fused = NITIConv2D(6, 10, (3, 3), (1, 1), "SAME", act="relu6")
    sep = Sequential([NITIConv2D(6, 10, (3, 3), (1, 1), "SAME"),
                      NITIRelu6()])
    pf = fused.init(key)
    ps = sep.init(jax.random.PRNGKey(0))
    ps[0] = pf  # identical weights
    yf, rf = fused.fwd(pf, q)
    ys, rs = sep.fwd(ps, q)
    np.testing.assert_array_equal(np.asarray(yf.data), np.asarray(ys.data))
    assert int(yf.exp) == int(ys.exp)
    gxf, gwf = fused.bwd(pf, rf, gy)
    gxs, gws = sep.bwd(ps, rs, gy)
    np.testing.assert_array_equal(np.asarray(gxf), np.asarray(gxs))
    np.testing.assert_array_equal(
        np.asarray(gwf["w"].data), np.asarray(gws[0]["w"].data))

    gyd = jnp.asarray(rng.integers(-50, 50, (2, 8, 8, 6)).astype(np.int8))
    dwf = NITIDepthwiseConv2D(6, (3, 3), (1, 1), "SAME", act="relu6")
    dws = Sequential([NITIDepthwiseConv2D(6, (3, 3), (1, 1), "SAME"),
                      NITIRelu6()])
    pdf = dwf.init(key)
    pds = dws.init(jax.random.PRNGKey(0))
    pds[0] = pdf
    yf2, rf2 = dwf.fwd(pdf, q)
    ys2, rs2 = dws.fwd(pds, q)
    np.testing.assert_array_equal(np.asarray(yf2.data), np.asarray(ys2.data))
    gxf2, _ = dwf.bwd(pdf, rf2, gyd)
    gxs2, _ = dws.bwd(pds, rs2, gyd)
    np.testing.assert_array_equal(np.asarray(gxf2), np.asarray(gxs2))


def test_pc_shift_cap_derivation_and_spread_check():
    """pc_shift_cap derives the int32-safe alignment cap from the tap
    count (r4 advisor finding: the hardcoded 12 assumed 3x3); a concrete
    exponent vector whose spread exceeds the cap raises instead of being
    silently clipped, and the per-channel init floors the range so its
    spread always fits."""
    from mandheling_tpu.nn.init import niti_xavier_int8_dw_per_channel
    from mandheling_tpu.ops.depthwise import (
        _per_channel_shifts,
        pc_shift_cap,
    )

    # taps*127^2 << cap must stay below 2^31
    for taps in (9, 25, 49):
        cap = pc_shift_cap(taps)
        assert (taps * 127 * 127) << cap < 2 ** 31
        # the ceil(log2) form is conservative by at most one bit
        assert (taps * 127 * 127) << (cap + 2) >= 2 ** 31
    assert pc_shift_cap(9) == 12  # the r4 constant, recovered

    e_base, shift = _per_channel_shifts(jnp.asarray([-7, -9, -5], jnp.int32),
                                        taps=9)
    assert int(e_base) == -9
    np.testing.assert_array_equal(np.asarray(shift), [2, 0, 4])

    with pytest.raises(ValueError, match="spread"):
        _per_channel_shifts(jnp.asarray([-20, -2], jnp.int32), taps=49)

    # init floor: even a 7x7 kernel's exponent spread fits its cap
    w = niti_xavier_int8_dw_per_channel(jax.random.PRNGKey(0), (7, 7, 1, 64))
    spread = int(jnp.max(w.exp) - jnp.min(w.exp))
    assert spread <= pc_shift_cap(49)


def test_fgrad_margin_scales_update_magnitude():
    """The filter-grad requant keeps ~margin+1 top bits — the r5 MNv2
    recipe depends on this being the effective step-size knob: margin 0
    yields +-1 updates; larger margins grow the magnitude."""
    from mandheling_tpu.ops import conv as conv_ops

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-90, 90, (8, 8, 8, 16)).astype(np.int8))
    gy = jnp.asarray(rng.integers(-90, 90, (8, 8, 8, 24)).astype(np.int8))
    maxes = {}
    for m in (0, 2, 4):
        conv_ops.set_fgrad_margin(m)
        try:
            g = conv_ops.conv2d_filter_grad(x, gy, (3, 3), (1, 1), "SAME")
        finally:
            conv_ops.set_fgrad_margin(2)
        maxes[m] = int(jnp.max(jnp.abs(g.astype(jnp.int32))))
    assert maxes[0] <= 1
    assert maxes[0] <= maxes[2] <= maxes[4]
    assert maxes[4] > 1


def test_mnv2_train_demo_recipe_restores_margins():
    """MobilenetV2Train sets the r5 margins (0/0 — margin 1 measured
    seed-marginal) for its run and restores the reference defaults
    afterwards."""
    import os as _os
    import sys as _sys

    _sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))
    from types import SimpleNamespace

    from tools.run_train_demo import DEMOS

    from mandheling_tpu.ops import conv as conv_ops
    from mandheling_tpu.ops import depthwise as dw_ops
    from mandheling_tpu.train import trainer

    seen = {}
    orig = trainer.train_niti

    def fake_train(*a, **k):
        seen["dense"] = conv_ops.get_fgrad_margin()
        seen["dw"] = dw_ops.get_dw_fgrad_margin()
        seen["pc"] = any(
            getattr(l, "per_channel", False) for l in k["model"].layers)
        return None, 0.0

    trainer.train_niti = fake_train
    try:
        DEMOS["MobilenetV2Train"](SimpleNamespace(root="/nonexistent",
                                                  epochs=1))
    finally:
        trainer.train_niti = orig
    assert seen == {"dense": 0, "dw": 0, "pc": True}
    assert conv_ops.get_fgrad_margin() == 2
    assert dw_ops.get_dw_fgrad_margin() == 2
