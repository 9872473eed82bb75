"""Calibration (post-training quantization) tests."""

import numpy as np

from mandheling_tpu.utils.calibration import (
    calibrate_activations,
    collect_histogram,
    kl_threshold,
    mse_scale,
    quantize_weight_admm,
    quantize_weight_maxabs,
)


def test_kl_threshold_clips_outliers():
    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, 50000).astype(np.float32)
    x[:5] = 100.0  # outliers that plain max-abs would waste range on
    hist, mx = collect_histogram([x])
    t = kl_threshold(hist, mx)
    assert 1.0 < t < 50.0  # clipped well below the outlier max


def test_mse_scale_reasonable():
    rng = np.random.default_rng(1)
    x = rng.normal(0, 1, 20000).astype(np.float32)
    t = mse_scale([x])
    assert 1.0 < t < 6.0


def test_weight_maxabs_roundtrip():
    rng = np.random.default_rng(2)
    w = rng.normal(0, 0.1, (3, 3, 8, 16)).astype(np.float32)
    q, s = quantize_weight_maxabs(w)
    assert q.dtype == np.int8 and s.shape == (16,)
    err = np.abs(q * s - w).max()
    assert err <= s.max()  # within one quantization step


def test_weight_admm_beats_maxabs():
    rng = np.random.default_rng(3)
    w = rng.normal(0, 0.1, (3, 3, 4, 8)).astype(np.float32)
    w[0, 0, 0, :] = 2.0  # heavy outlier per channel
    q0, s0 = quantize_weight_maxabs(w)
    q1, s1 = quantize_weight_admm(w)
    mse0 = np.mean((q0.reshape(-1, 8) * s0 - w.reshape(-1, 8)) ** 2)
    mse1 = np.mean((q1.reshape(-1, 8) * s1 - w.reshape(-1, 8)) ** 2)
    assert mse1 <= mse0 + 1e-12


def test_calibrate_activations_api():
    rng = np.random.default_rng(4)
    acts = {"conv1": [rng.normal(0, 1, 1000) for _ in range(3)],
            "conv2": [rng.normal(0, 2, 1000) for _ in range(3)]}
    kl = calibrate_activations(acts, "KL")
    mse = calibrate_activations(acts, "MSE")
    assert set(kl) == {"conv1", "conv2"}
    assert kl["conv2"] > kl["conv1"]
    assert mse["conv2"] > mse["conv1"]
