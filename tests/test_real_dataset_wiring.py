"""Exercise the REAL-dataset code path end to end without egress.

The demos / accuracy bench auto-detect fetched MNIST idx files and
CIFAR-10 bins (reference: `datasets/MnistDataset.cpp:17-27` parses the
same idx wire format). This box has no network egress, so the real-file
branch would otherwise never run; these tests write byte-exact idx / bin
files (the real wire formats, synthetic pixels) and assert the entire
resolution chain — loader, auto-detect flag, accuracy-bench labeling,
and the training demo — takes the REAL branch and round-trips the data.
"""

import os
import struct
import subprocess
import sys

import numpy as np
import pytest

from mandheling_tpu.data.mnist import (
    TEST_IMAGES,
    TEST_LABELS,
    TRAIN_IMAGES,
    TRAIN_LABELS,
    load_mnist,
    load_or_synthesize,
    synthetic_mnist,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def write_idx_images(path: str, imgs: np.ndarray) -> None:
    """Write a 0x803 ubyte idx3 file (big-endian header) — the official
    MNIST wire format, emitted here independently of read_idx."""
    n, h, w = imgs.shape[0], imgs.shape[1], imgs.shape[2]
    with open(path, "wb") as f:
        f.write(struct.pack(">IIII", 0x803, n, h, w))
        f.write(np.ascontiguousarray(imgs[..., 0], np.uint8).tobytes())


def write_idx_labels(path: str, labels: np.ndarray) -> None:
    with open(path, "wb") as f:
        f.write(struct.pack(">II", 0x801, len(labels)))
        f.write(np.ascontiguousarray(labels, np.uint8).tobytes())


def _mnist_root(tmp_path, n_train=96, n_test=32):
    x, y = synthetic_mnist(n_train + n_test, seed=7)
    root = str(tmp_path / "mnist")
    os.makedirs(root)
    write_idx_images(os.path.join(root, TRAIN_IMAGES), x[:n_train])
    write_idx_labels(os.path.join(root, TRAIN_LABELS), y[:n_train])
    write_idx_images(os.path.join(root, TEST_IMAGES), x[n_train:])
    write_idx_labels(os.path.join(root, TEST_LABELS), y[n_train:])
    return root, (x, y), n_train


def _cifar_root(tmp_path, per_file=8):
    from mandheling_tpu.data.cifar import TEST_FILES, TRAIN_FILES

    rng = np.random.default_rng(3)
    root = str(tmp_path / "cifar10")
    os.makedirs(root)
    all_x, all_y = [], []
    for f in TRAIN_FILES + TEST_FILES:
        y = rng.integers(0, 10, per_file).astype(np.uint8)
        x = rng.integers(0, 256, (per_file, 3, 32, 32)).astype(np.uint8)
        rec = np.concatenate([y[:, None], x.reshape(per_file, -1)], axis=1)
        rec.tofile(os.path.join(root, f))
        if f in TRAIN_FILES:
            all_x.append(x.transpose(0, 2, 3, 1))
            all_y.append(y)
    return root, np.concatenate(all_x), np.concatenate(all_y)


def test_mnist_idx_roundtrip_and_autodetect(tmp_path):
    root, (x, y), n_train = _mnist_root(tmp_path)
    xr, yr = load_mnist(root, train=True)
    np.testing.assert_array_equal(xr, x[:n_train])
    np.testing.assert_array_equal(yr, y[:n_train].astype(np.int32))

    xa, ya, is_real = load_or_synthesize(root, train=True)
    assert is_real
    np.testing.assert_array_equal(xa, x[:n_train])
    # missing root falls back, labeled as such
    _, _, is_real = load_or_synthesize(str(tmp_path / "nope"), train=True)
    assert not is_real


def test_cifar_bin_roundtrip_and_autodetect(tmp_path):
    from mandheling_tpu.data.cifar import load_cifar10, load_or_synthesize_cifar

    root, x, y = _cifar_root(tmp_path)
    xr, yr = load_cifar10(root, train=True)
    np.testing.assert_array_equal(xr, x)
    np.testing.assert_array_equal(yr, y.astype(np.int32))
    _, _, is_real = load_or_synthesize_cifar(root, train=True)
    assert is_real


def test_accuracy_bench_labels_real_datasets(tmp_path):
    """tools/accuracy_bench.load_dataset must pick up the idx/bin files
    and label the artifact rows with the real dataset name."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    try:
        import accuracy_bench
    finally:
        sys.path.pop(0)

    root, (x, y), n_train = _mnist_root(tmp_path)
    name, (xtr, ytr), (xte, yte) = accuracy_bench.load_dataset(root)
    assert name == "mnist"
    assert len(xtr) == n_train

    croot, cx, cy = _cifar_root(tmp_path)
    cname, (cxtr, cytr), _ = accuracy_bench.load_cifar_or_fallback(croot)
    assert cname == "cifar10"
    np.testing.assert_array_equal(cxtr, cx)

    # fallbacks stay labeled as fallbacks
    fname, _, _ = accuracy_bench.load_dataset(str(tmp_path / "missing"))
    assert fname == "sklearn_digits_upsampled_28x28"
    fcname, _, _ = accuracy_bench.load_cifar_or_fallback(
        str(tmp_path / "missing"))
    assert fcname == "digits_at_cifar_geometry_32x32x3"


@pytest.mark.slow
def test_demo_trains_on_real_idx_files(tmp_path):
    """run_train_demo NITIInt8Train with an idx root takes the real-data
    branch (no fallback banner) and completes an epoch."""
    root, _, _ = _mnist_root(tmp_path)
    env = dict(os.environ, PYTHONPATH="", JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "run_train_demo.py"),
         "NITIInt8Train", root, "--epochs", "1"],
        capture_output=True, text=True, timeout=600, env=env, cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "using synthetic dataset" not in out.stdout
    assert "final test accuracy" in out.stdout
