"""Native C++ data pipeline tests: build, batch equivalence vs the Python
loader, idx parsing parity."""

import os
import struct

import numpy as np
import pytest

from mandheling_tpu.data import synthetic_mnist
from mandheling_tpu.data.native import (
    NativeLoader,
    build_native,
    load_native,
    read_idx_native,
)


@pytest.fixture(scope="module")
def lib():
    lib = load_native(auto_build=True)
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def test_native_builds(lib):
    assert lib is not None


def test_native_loader_covers_dataset_once(lib):
    x, y = synthetic_mnist(512, seed=0)
    dl = NativeLoader(x, y, batch=64, shuffle=True, seed=3, workers=3)
    seen_labels = []
    nb = 0
    for bx, by in dl.epoch():
        assert bx.shape == (64, 28, 28, 1) and bx.dtype == np.float32
        assert by.shape == (64,) and by.dtype == np.int32
        seen_labels.append(by)
        nb += 1
    assert nb == 8
    # shuffled epoch covers every sample exactly once: label histogram matches
    seen = np.concatenate(seen_labels)
    np.testing.assert_array_equal(np.bincount(seen, minlength=10),
                                  np.bincount(y, minlength=10))


def test_native_loader_batches_match_source(lib):
    """Unshuffled epoch must reproduce the dataset in order."""
    x, y = synthetic_mnist(256, seed=1)
    dl = NativeLoader(x, y, batch=32, shuffle=False, workers=2)
    i = 0
    for bx, by in dl.epoch():
        np.testing.assert_array_equal(
            bx, x[i : i + 32].astype(np.float32)
        )
        np.testing.assert_array_equal(by, y[i : i + 32])
        i += 32
    assert i == 256


def test_native_idx_parse_matches_python(lib, tmp_path):
    from mandheling_tpu.data.mnist import read_idx

    # write a tiny idx3 file
    data = np.arange(2 * 4 * 5, dtype=np.uint8).reshape(2, 4, 5)
    path = os.path.join(tmp_path, "test-idx3-ubyte")
    with open(path, "wb") as f:
        f.write(struct.pack(">I", 0x00000803))
        f.write(struct.pack(">3I", 2, 4, 5))
        f.write(data.tobytes())
    got_native = read_idx_native(path)
    got_py = read_idx(path)
    np.testing.assert_array_equal(got_native, got_py)
    np.testing.assert_array_equal(got_native, data)


def test_build_idempotent():
    assert build_native() in (True, False)


def test_native_augment_determinism_and_shape():
    import numpy as np
    from mandheling_tpu.data.native import NativeLoader, load_native

    if load_native() is None:
        import pytest
        pytest.skip("native lib unavailable")

    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, (64, 8, 8, 3)).astype(np.uint8)
    labels = rng.integers(0, 10, 64).astype(np.int32)

    def collect(seed):
        dl = NativeLoader(imgs, labels, 16, seed=seed, workers=2,
                          augment_pad=2, augment_flip=True)
        return [x.copy() for x, _ in dl.epoch()]

    a, b = collect(7), collect(7)
    for xa, xb in zip(a, b):
        np.testing.assert_array_equal(xa, xb)  # same seed -> same batches
    c = collect(8)
    assert any((xa != xc).any() for xa, xc in zip(a, c))
    # augmented pixels are still valid uint8 values or zero padding
    assert all(x.min() >= 0 and x.max() <= 255 for x in a)
    # with pad-crop, some zero borders should appear somewhere
    assert any((x == 0).any() for x in a)


def test_native_image_decode_bit_exact_and_dataset_path(tmp_path):
    """native/imagedec.cpp: JPEG decode must be bit-identical to PIL (both
    libjpeg); the ImageDataset native path must produce a normalized float
    image of the configured size."""
    PIL = pytest.importorskip("PIL.Image")
    import numpy as np

    from mandheling_tpu.data.image import ImageConfig, ImageDataset
    from mandheling_tpu.data.native import native_load_image

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (40, 60, 3)).astype(np.uint8)
    p = tmp_path / "a.jpg"
    PIL.fromarray(img).save(str(p), quality=95)

    out = native_load_image(str(p), 40, 60)
    if out is None:
        pytest.skip("native lib unavailable")
    ref = np.asarray(PIL.open(str(p)).convert("RGB"))
    np.testing.assert_array_equal(out, ref)

    (tmp_path / "labels.txt").write_text("a.jpg 3\n")
    ds = ImageDataset(
        str(tmp_path), str(tmp_path / "labels.txt"),
        ImageConfig(resize_height=24, resize_width=32),
    )
    x, y = ds[0]
    assert x.shape == (24, 32, 3) and x.dtype == np.float32 and y == 3
