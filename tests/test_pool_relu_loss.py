"""Tests for maxpool fwd/bwd, relu, and the integer loss gradient against
pure-Python mirrors of the reference C kernels."""

import numpy as np
import jax.numpy as jnp
import pytest

from mandheling_tpu.ops import loss as loss_ops
from mandheling_tpu.ops import pool as pool_ops
from mandheling_tpu.ops import relu as relu_ops


def c_trunc_div(a, b):
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def py_psto_shift(x, shift):
    round_temp = c_trunc_div(x, 1 << shift)
    prob = abs(x - round_temp * (1 << shift))
    qprob = prob // (1 << (shift // 2))
    prand = prob - qprob * (1 << (shift // 2))
    if shift % 2 == 1:
        prand *= 2
    r = 1 if qprob > prand else 0
    s = 1 if x > 0 else (-1 if x < 0 else 0)
    return max(-127, min(127, round_temp + r * s))


def test_maxpool_forward():
    rng = np.random.default_rng(0)
    x = rng.integers(-100, 100, (2, 8, 8, 4)).astype(np.int8)
    y, e = pool_ops.maxpool2d(jnp.asarray(x), jnp.int32(-4))
    assert int(e) == -4
    expected = x.reshape(2, 4, 2, 4, 2, 4).max(axis=(2, 4))
    np.testing.assert_array_equal(np.asarray(y), expected)


def py_maxpool_grad(x, y, gy, kh, kw, sh, sw):
    """Mirror of NITI_CPUPoolGrad_Int8.cpp:21-77: first scan-order argmax
    (>= pooled output) receives the int8-added gradient."""
    b, ih, iw, c = x.shape
    _, oh, ow, _ = y.shape
    gx = np.zeros((b, ih, iw, c), np.int8)
    for bi in range(b):
        for ci in range(c):
            for yy in range(oh):
                for xx in range(ow):
                    done = False
                    for ky in range(kh):
                        for kx in range(kw):
                            sy, sx = yy * sh + ky, xx * sw + kx
                            if sy >= ih or sx >= iw or done:
                                continue
                            if x[bi, sy, sx, ci] >= y[bi, yy, xx, ci]:
                                done = True
                                gx[bi, sy, sx, ci] = np.int8(
                                    int(gx[bi, sy, sx, ci]) + int(gy[bi, yy, xx, ci])
                                )
    return gx


@pytest.mark.parametrize("shape", [(2, 8, 8, 4), (1, 6, 6, 3)])
def test_maxpool_grad_first_argmax(shape):
    rng = np.random.default_rng(1)
    x = rng.integers(-50, 50, shape).astype(np.int8)
    xq = jnp.asarray(x)
    y, _ = pool_ops.maxpool2d(xq, jnp.int32(0))
    gy = rng.integers(-50, 50, np.asarray(y).shape).astype(np.int8)
    got = np.asarray(pool_ops.maxpool2d_grad(xq, y, jnp.asarray(gy)))
    expected = py_maxpool_grad(x, np.asarray(y), gy, 2, 2, 2, 2)
    np.testing.assert_array_equal(got, expected)


def test_left_pool_grad():
    rng = np.random.default_rng(2)
    gy = rng.integers(-50, 50, (1, 3, 3, 4)).astype(np.int8)
    out = np.asarray(pool_ops.left_pool_grad(jnp.asarray(gy), (6, 6), (2, 2)))
    expected = np.zeros((1, 6, 6, 4), np.int8)
    expected[:, ::2, ::2, :] = gy
    np.testing.assert_array_equal(out, expected)


def test_relu_and_grad():
    x = np.array([-5, 0, 3, 127, -128], np.int8)
    gy = np.array([10, 20, 30, 40, 50], np.int8)
    np.testing.assert_array_equal(
        np.asarray(relu_ops.relu(jnp.asarray(x))), np.maximum(x, 0)
    )
    np.testing.assert_array_equal(
        np.asarray(relu_ops.relu_grad(jnp.asarray(x), jnp.asarray(gy))),
        np.where(x > 0, gy, 0).astype(np.int8),
    )


def py_loss_grad(logits, ascale, onehot):
    """Mirror of NITI_CPULossGrad_Int8.cpp:84-200."""
    b, c = logits.shape
    if ascale > -7:
        s = np.zeros((b, c), np.int64)
        for i in range(b):
            for j in range(c):
                t = c_trunc_div(int(logits[i, j]) * 47274, 1 << 15)
                if ascale >= 0:
                    s[i, j] = t * (1 << ascale)
                else:
                    s[i, j] = c_trunc_div(t, 1 << (-ascale))
        soft = np.zeros((b, c), np.int64)
        for i in range(b):
            m = s[i].max() - 10
            for j in range(c):
                t = max(int(s[i, j]) - m, 0)
                soft[i, j] = (1 << t) - 1
    else:
        soft = np.zeros((b, c), np.int64)
        base = 1 << (1 - 2 * ascale)
        shiftbase = 1 << (1 - ascale)
        for i in range(b):
            for j in range(c):
                t = int(logits[i, j])
                soft[i, j] = base + t * shiftbase + t * t

    out = np.zeros((b, c), np.int8)
    for i in range(b):
        ssum = int(soft[i].sum())
        p = [c_trunc_div(int(soft[i, j]) * (1 << 11), ssum) for j in range(c)]
        psum = sum(p)
        tgt = int(np.argmax(onehot[i]))
        g = list(p)
        g[tgt] = p[tgt] - psum
        for j in range(c):
            out[i, j] = py_psto_shift(g[j], 4)
    return out


@pytest.mark.parametrize("ascale", [-9, -7, -5, -3, 0, 2])
def test_loss_grad_bit_exact(ascale):
    rng = np.random.default_rng(10 + ascale)
    b, c = 8, 12
    logits = rng.integers(-127, 128, (b, c)).astype(np.int8)
    targets = rng.integers(0, 10, b)
    onehot = np.zeros((b, c), np.int32)
    onehot[np.arange(b), targets] = 1
    got = np.asarray(
        loss_ops.loss_grad_int8(
            jnp.asarray(logits), jnp.int32(ascale), jnp.asarray(onehot)
        )
    )
    expected = py_loss_grad(logits, ascale, onehot)
    np.testing.assert_array_equal(got, expected)


def test_loss_float_value():
    rng = np.random.default_rng(0)
    b, c = 4, 12
    logits = rng.integers(-100, 100, (b, c)).astype(np.int8)
    onehot = np.zeros((b, c), np.int32)
    onehot[np.arange(b), rng.integers(0, 10, b)] = 1
    ascale = -5
    x = logits.astype(np.float64) * 2.0**ascale
    p = np.exp(x) / np.exp(x).sum(-1, keepdims=True)
    expected = -np.mean(np.log(p[onehot.astype(bool)]))
    got = float(
        loss_ops.loss_cross_entropy_float(
            jnp.asarray(logits), jnp.int32(ascale), jnp.asarray(onehot)
        )
    )
    assert abs(got - expected) < 1e-4


def test_loss_grad_extreme_ascale_keeps_signal():
    """For very negative ascale (deep nets early in training) the integer
    softmax is ~uniform; the gradient must stay finite and non-zero with a
    strong negative at the target (int32-safe clamp, see ops/loss.py)."""
    rng = np.random.default_rng(0)
    b, c = 8, 12
    logits = rng.integers(-127, 128, (b, c)).astype(np.int8)
    onehot = np.zeros((b, c), np.int32)
    targets = rng.integers(0, 10, b)
    onehot[np.arange(b), targets] = 1
    g = np.asarray(
        loss_ops.loss_grad_int8(
            jnp.asarray(logits), jnp.int32(-21), jnp.asarray(onehot)
        )
    )
    # target entries strongly negative, others mildly positive
    assert (g[np.arange(b), targets] < -50).all(), g
    off = g.copy()
    off[np.arange(b), targets] = 0
    assert (off >= 0).all() and off.max() <= 30


def py_softmax_int8(x_row, ascale):
    """Mirror of NITI_CPUSoftmax_Int8.cpp:66-110."""
    if ascale > -7:
        s = []
        for v in x_row:
            t = (int(v) * 47274) >> 15 if int(v) >= 0 else c_trunc_div(int(v) * 47274, 1 << 15)
            if ascale >= 0:
                s.append(t << ascale)
            else:
                s.append(t >> (-ascale) if t >= 0 else c_trunc_div(t, 1 << (-ascale)))
        m = max(s) - 10
        return [(1 << max(si - m, 0)) - 1 for si in s]
    base = 1 << (1 - 2 * ascale)
    shiftbase = 1 << (1 - ascale)
    return [base + int(v) * shiftbase + int(v) * int(v) for v in x_row]


@pytest.mark.parametrize("ascale", [-9, -8, -7, -6, -3, 0, 2])
def test_softmax_int8_forward(ascale):
    from mandheling_tpu.ops import softmax as sm

    rng = np.random.default_rng(ascale + 100)
    x = rng.integers(-127, 128, (5, 10)).astype(np.int8)
    out = np.asarray(sm.softmax_int8_forward(jnp.asarray(x), jnp.int32(ascale)))
    expected = np.array([py_softmax_int8(row, ascale) for row in x], np.int32)
    np.testing.assert_array_equal(out, expected)


def test_softmax_grad_truncates_low_byte():
    from mandheling_tpu.ops import softmax as sm

    up = jnp.asarray([0, 1, 255, 256, -1, 1000, -1000], jnp.int32)
    out = np.asarray(sm.softmax_grad_int8(up))
    vals = np.array([0, 1, 255, 256, -1, 1000, -1000], np.int64)
    expected = (vals & 0xFF).astype(np.uint8).view(np.int8)
    np.testing.assert_array_equal(out, expected)


def test_relu6_cap_and_clip():
    """relu6 clamps value = data * 2^exp at 6.0 in integer domain
    (reference MobilenetV2.cpp:67 _Relu6 under the NITI contract)."""
    from mandheling_tpu.ops import relu as relu_ops

    # exp = -5: cap 6*32 = 192 -> rail 127 (no clip beyond relu)
    assert int(relu_ops.relu6_cap(jnp.int32(-5))) == 127
    # exp = -4: cap 96
    assert int(relu_ops.relu6_cap(jnp.int32(-4))) == 96
    # exp = 0: cap 6; exp = 2: cap 1; exp = 3: cap 0
    assert int(relu_ops.relu6_cap(jnp.int32(0))) == 6
    assert int(relu_ops.relu6_cap(jnp.int32(2))) == 1
    assert int(relu_ops.relu6_cap(jnp.int32(3))) == 0

    x = jnp.asarray(np.array([-7, 0, 3, 96, 97, 127], np.int8))
    y = relu_ops.relu6(x, jnp.int32(-4))
    np.testing.assert_array_equal(np.asarray(y), [0, 0, 3, 96, 96, 96])

    gy = jnp.asarray(np.array([10, 10, 10, 10, 10, 10], np.int8))
    g = relu_ops.relu6_grad(x, jnp.int32(-4), gy)
    # inside (0, cap) only: x=3 passes; x<=0 and x>=96 are masked
    np.testing.assert_array_equal(np.asarray(g), [0, 0, 10, 0, 0, 0])


def test_relu6_saturated_rail_passes_gradient():
    """exp <= -5 makes the 6.0 bound unrepresentable (cap saturates to the
    int8 rail 127): the clamp is NOT a relu6 clip there, so x == 127 (true
    value 127*2^-5 < 6, derivative 1) must pass gradient — otherwise
    saturated units could never recover (r4 advisor finding)."""
    from mandheling_tpu.ops import relu as relu_ops

    x = jnp.asarray(np.array([0, 1, 126, 127], np.int8))
    gy = jnp.asarray(np.array([10, 10, 10, 10], np.int8))
    g = relu_ops.relu6_grad(x, jnp.int32(-5), gy)
    np.testing.assert_array_equal(np.asarray(g), [0, 10, 10, 10])
    # output-masked form: y == x at exp -5 (identity clamp)
    y = relu_ops.relu6(x, jnp.int32(-5))
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))
    g2 = relu_ops.relu6_grad_from_output(y, jnp.int32(-5), gy)
    np.testing.assert_array_equal(np.asarray(g2), [0, 10, 10, 10])
    # a REAL clip (exp -4, cap 96) still masks the rail
    g3 = relu_ops.relu6_grad(x, jnp.int32(-4), gy)
    np.testing.assert_array_equal(np.asarray(g3), [0, 10, 0, 0])


def test_relu6_layer_roundtrip():
    from mandheling_tpu.nn.layers import NITIRelu6
    from mandheling_tpu.ops.qtensor import QTensor

    layer = NITIRelu6()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-127, 128, (4, 8, 8, 3)).astype(np.int8))
    q, res = layer.fwd((), QTensor(x, jnp.int32(-3)))
    assert int(jnp.max(q.data)) <= 48  # 6 * 2^3
    assert int(jnp.min(q.data)) == 0
    gy = jnp.asarray(rng.integers(-20, 20, x.shape).astype(np.int8))
    gx, grads = layer.bwd((), res, gy)
    assert grads == ()
    mask = (np.asarray(x) > 0) & (np.asarray(x) < 48)
    np.testing.assert_array_equal(np.asarray(gx), np.where(mask, np.asarray(gy), 0))
