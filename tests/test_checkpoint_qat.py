"""Checkpoint save/load roundtrip and QAT fake-quant training tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mandheling_tpu.models import lenet_niti
from mandheling_tpu.models.lenet_qat import LeNetQAT
from mandheling_tpu.utils.checkpoint import (
    load_checkpoint,
    quantize_params_tree,
    save_checkpoint,
)


def test_checkpoint_roundtrip(tmp_path):
    model = lenet_niti()
    params = model.init(jax.random.PRNGKey(0))
    path = os.path.join(tmp_path, "snap.npz")
    save_checkpoint(path, params, step=7)
    template = model.init(jax.random.PRNGKey(1))  # different values, same shape
    restored, step = load_checkpoint(path, template)
    assert step == 7
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_resume_continues_training(tmp_path):
    """Save -> load -> one more identical step must equal uninterrupted run."""
    from mandheling_tpu.data import onehot_padded, synthetic_mnist
    from mandheling_tpu.models import NITI_LOGIT_CHANNELS
    from mandheling_tpu.train import make_train_step

    model = lenet_niti()
    step = jax.jit(make_train_step(model))
    params = model.init(jax.random.PRNGKey(0))
    x, y = synthetic_mnist(128, seed=0)
    bx = jnp.asarray(x[:64].astype(np.float32))
    oh = jnp.asarray(onehot_padded(y[:64], 10, NITI_LOGIT_CHANNELS))

    p1, _ = step(params, bx, oh)
    path = os.path.join(tmp_path, "mid.npz")
    save_checkpoint(path, p1, step=1)
    p1_loaded, _ = load_checkpoint(path, model.init(jax.random.PRNGKey(2)))

    p2_direct, _ = step(p1, bx, oh)
    p2_resumed, _ = step(p1_loaded, bx, oh)
    for a, b in zip(jax.tree.leaves(p2_direct), jax.tree.leaves(p2_resumed)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_quantize_params_tree():
    tree = {"a": jnp.ones((4, 4)) * 0.5, "b": jnp.linspace(-1, 1, 8)}
    q = quantize_params_tree(tree)
    assert q["a"].data.dtype == jnp.int8
    # dequantized values approximate originals
    deq = q["b"].dequantize()
    np.testing.assert_allclose(np.asarray(deq), np.linspace(-1, 1, 8), atol=0.02)


@pytest.mark.slow
def test_qat_lenet_trains():
    from mandheling_tpu.data import onehot_padded, synthetic_mnist
    from mandheling_tpu.train.optim import sgd_init, sgd_update

    model = LeNetQAT()
    params, obs = model.init(jax.random.PRNGKey(0))
    velocity = sgd_init(params)

    def loss_fn(p, o, xb, oh):
        logits, new_o = model.apply(p, o, xb, training=True)
        return -jnp.mean(jnp.sum(jax.nn.log_softmax(logits) * oh, axis=-1)), new_o

    @jax.jit
    def step(p, o, v, xb, oh):
        (loss, new_o), g = jax.value_and_grad(loss_fn, has_aux=True)(p, o, xb, oh)
        p, v = sgd_update(p, g, v, 0.05)
        return p, new_o, v, loss

    x, y = synthetic_mnist(256, seed=0)
    losses = []
    for ep in range(6):
        for i in range(0, 256, 64):
            bx = (x[i : i + 64].astype(np.float32) / 255.0 - 0.5) * 2.0
            oh = onehot_padded(y[i : i + 64], 10, 10).astype(np.float32)
            params, obs, velocity, loss = step(
                params, obs, velocity, jnp.asarray(bx), jnp.asarray(oh)
            )
            losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.7, (losses[0], losses[-1])
    # observers must have moved off init
    assert float(obs["conv1"]["in_max"]) > 0.0


def test_export_load_inference_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mandheling_tpu.models import lenet_niti
    from mandheling_tpu.ops.qtensor import QTensor
    from mandheling_tpu.utils.checkpoint import export_inference, load_inference

    m = lenet_niti()
    p = m.init(jax.random.PRNGKey(3))
    path = str(tmp_path / "model.npz")
    export_inference(path, "lenet_niti", p)
    m2, p2 = load_inference(path)
    x = jnp.asarray(
        np.random.default_rng(0).integers(-100, 100, (4, 28, 28, 1)), jnp.int8)
    o1, _ = m.fwd(p, QTensor(x, jnp.int32(-5)))
    o2, _ = m2.fwd(p2, QTensor(x, jnp.int32(-5)))
    np.testing.assert_array_equal(np.asarray(o1.data), np.asarray(o2.data))
    assert int(o1.exp) == int(o2.exp)


def test_export_inference_unknown_model(tmp_path):
    import pytest

    from mandheling_tpu.utils.checkpoint import export_inference

    with pytest.raises(ValueError):
        export_inference(str(tmp_path / "m.npz"), "nope", [])


def test_checkpoint_schema_versioning(tmp_path):
    """v0 (round-1, no schema field) files load via migration; files newer
    than SCHEMA_VERSION are refused with a clear error."""
    import json

    from mandheling_tpu.utils.checkpoint import (
        SCHEMA_VERSION,
        load_checkpoint,
        save_checkpoint,
    )

    tree = {"w": jnp.arange(4, dtype=jnp.int8)}
    p = str(tmp_path / "c.npz")
    save_checkpoint(p, tree, step=3)
    with np.load(p) as d:
        meta = json.loads(str(d["__meta__"]))
        arrays = {k: d[k] for k in d.files if k != "__meta__"}
    assert meta["schema"] == SCHEMA_VERSION

    # v0 file (no schema field): loads through the migration
    meta_v0 = {k: v for k, v in meta.items() if k != "schema"}
    p0 = str(tmp_path / "c0.npz")
    np.savez(p0, __meta__=json.dumps(meta_v0), **arrays)
    got, step = load_checkpoint(p0, tree)
    assert step == 3
    np.testing.assert_array_equal(np.asarray(got["w"]), np.arange(4))

    # future version: refused
    meta_v9 = {**meta, "schema": SCHEMA_VERSION + 1}
    p9 = str(tmp_path / "c9.npz")
    np.savez(p9, __meta__=json.dumps(meta_v9), **arrays)
    with pytest.raises(ValueError, match="newer"):
        load_checkpoint(p9, tree)
