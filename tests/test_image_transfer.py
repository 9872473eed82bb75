"""ImageDataset, ImageNoLabelDataset, transfer-learning, float losses."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

PIL = pytest.importorskip("PIL")


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("imgs")
    (root / "sub").mkdir()
    rng = np.random.default_rng(0)
    lines = []
    for i in range(8):
        arr = rng.integers(0, 255, (40, 48, 3)).astype("uint8")
        Image.fromarray(arr).save(root / "sub" / f"im{i}.png")
        lines.append(f"sub/im{i}.png {i % 3}")
    (root / "labels.txt").write_text("\n".join(lines) + "\n")
    return root


def test_image_dataset_basic(image_dir):
    from mandheling_tpu.data.image import ImageConfig, ImageDataset

    cfg = ImageConfig(resize_height=32, resize_width=32)
    ds = ImageDataset(str(image_dir), str(image_dir / "labels.txt"), cfg)
    assert len(ds) == 8
    img, label = ds[3]
    assert img.shape == (32, 32, 3) and img.dtype == np.float32
    assert label == 0
    # normalized around zero with default mean/scale 127.5
    assert -1.1 < img.min() and img.max() < 1.1


def test_image_dataset_center_crop_deterministic(image_dir):
    from mandheling_tpu.data.image import ImageConfig, ImageDataset

    cfg = ImageConfig(resize_height=16, resize_width=16,
                      crop_fraction=(0.5, 0.5), random_crop=False)
    ds = ImageDataset(str(image_dir), str(image_dir / "labels.txt"), cfg)
    a, _ = ds[0]
    b, _ = ds[0]
    np.testing.assert_array_equal(a, b)


def test_image_dataset_cache_matches_lazy(image_dir):
    from mandheling_tpu.data.image import ImageConfig, ImageDataset

    cfg = ImageConfig(resize_height=16, resize_width=16)
    lazy = ImageDataset(str(image_dir), str(image_dir / "labels.txt"), cfg)
    eager = ImageDataset(str(image_dir), str(image_dir / "labels.txt"), cfg,
                         read_all_to_memory=True)
    np.testing.assert_array_equal(lazy[5][0], eager[5][0])


def test_image_nolabel_dataset(image_dir):
    from mandheling_tpu.data.image import ImageConfig, ImageNoLabelDataset

    cfg = ImageConfig(resize_height=16, resize_width=16)
    ds = ImageNoLabelDataset(str(image_dir / "sub"), cfg)
    assert len(ds) == 8
    assert ds[0].shape == (16, 16, 3)


def test_transfer_only_updates_head():
    from mandheling_tpu.models import lenet_niti
    from mandheling_tpu.nn.layers import NITIConv2D, SqueezeLogits
    from mandheling_tpu.nn.module import Sequential
    from mandheling_tpu.train.transfer import (
        TransferModel, make_transfer_train_step)
    from mandheling_tpu.data import onehot_padded

    full = lenet_niti()
    split = len(full.layers) - 2
    features = Sequential(full.layers[:split])
    fparams = full.init(jax.random.PRNGKey(0))[:split]
    in_c = full.layers[split].in_channels
    head = Sequential([NITIConv2D(in_c, 12, (1, 1)), SqueezeLogits()])
    model = TransferModel(features, fparams, head)
    hp = model.init(jax.random.PRNGKey(1))

    step = jax.jit(make_transfer_train_step(model))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (16, 28, 28, 1)), jnp.float32)
    oh = jnp.asarray(onehot_padded(rng.integers(0, 10, 16), 10, 12))
    before = jax.tree_util.tree_map(lambda a: np.asarray(a).copy(), fparams)
    hp2, loss = step(hp, x, oh)
    assert np.isfinite(float(loss))
    # frozen features untouched
    for b, a in zip(jax.tree_util.tree_leaves(before),
                    jax.tree_util.tree_leaves(fparams)):
        np.testing.assert_array_equal(b, np.asarray(a))


def test_split_merge_params_roundtrip():
    from mandheling_tpu.train.transfer import merge_params, split_params

    params = [1, 2, 3, 4]
    frozen, train = split_params(params, [False, True, False, True])
    assert frozen == [1, None, 3, None] and train == [None, 2, None, 4]
    assert merge_params(frozen, train) == params


def test_distill_loss_matches_reference_formula():
    from mandheling_tpu.train.losses import (
        cross_entropy, distill_loss, kl_divergence)

    rng = np.random.default_rng(0)
    s = jnp.asarray(rng.normal(0, 1, (4, 10)), jnp.float32)
    t = jnp.asarray(rng.normal(0, 1, (4, 10)), jnp.float32)
    oh = jnp.asarray(np.eye(10, dtype=np.float32)[rng.integers(0, 10, 4)])
    T, alpha = 20.0, 0.9
    expected = (alpha * T * T * kl_divergence(
        jax.nn.softmax(s / T), jax.nn.softmax(t / T))
        + (1 - alpha) * cross_entropy(jax.nn.softmax(s), oh))
    np.testing.assert_allclose(
        float(distill_loss(s, t, oh, T, alpha)), float(expected), rtol=1e-6)
    # at equal logits and T=1, alpha=1, loss is zero
    assert float(distill_loss(s, s, oh, 1.0, 1.0)) < 1e-6
