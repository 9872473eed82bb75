"""Training loops for the demo configurations.

Mirrors `MnistUtils::{train, dsp_train, float_train}`
(demo/MnistUtils.cpp:35-469): per-batch loss/lr/time logging, per-epoch test
accuracy. The NITI loops differ from the reference only in that the "DSP"
variant selects the Pallas kernel backend instead of writing DSP.txt mode
files — both are one cached accelerator program per iteration.
"""

from __future__ import annotations

import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data import onehot_padded
from ..data.loader import make_loader
from ..models import NITI_LOGIT_CHANNELS, lenet_niti
from ..models.lenet import LeNetFP32
from ..train import jit_eval_step, jit_train_step
from ..train.optim import lr_inv, sgd_init, sgd_update
from ..utils.profiler import StepTimer


def evaluate_niti(evals, params, x, y, batch: int = 64) -> float:
    # The tail (len(x) % batch samples) is dropped so every eval step runs
    # the same compiled program — matches the reference's eval loop, which
    # also iterates whole batches only (demo/MnistUtils.cpp:152-183). With
    # MNIST-sized test sets (10000 % 64 = 16) the bias is < 0.2%.
    n = (len(x) // batch) * batch
    correct = 0
    for i in range(0, n, batch):
        correct += int(
            evals(
                params,
                jnp.asarray(x[i : i + batch].astype(np.float32)),
                jnp.asarray(y[i : i + batch]),
            )
        )
    return correct / max(n, 1)


def train_niti(
    train_data,
    test_data,
    epochs: int = 10,
    batch: int = 64,
    seed: int = 0,
    log: Callable[[str], None] = print,
    checkpoint_path: Optional[str] = None,
    start_params=None,
    start_epoch: int = 0,
    model=None,
):
    """NITIInt8Train loop -> (params, final_test_accuracy). `model` defaults
    to the NITI LeNet; any Sequential NITI model works (the reference's
    MobilenetV2Utils::train reuses the same loop shape,
    demo/MobilenetV2Utils.cpp:34)."""
    model = model if model is not None else lenet_niti()
    params = (
        start_params
        if start_params is not None
        else model.init(jax.random.PRNGKey(seed))
    )
    step = jit_train_step(model)
    evals = jit_eval_step(model)

    x, y = train_data
    xt, yt = test_data
    dl = make_loader(x, y, batch, seed=seed)
    it = start_epoch * len(dl)
    acc = 0.0
    for epoch in range(start_epoch, epochs):
        timer = StepTimer()
        loss = None
        for bx, by in dl.epoch():
            oh = onehot_padded(by, 10, NITI_LOGIT_CHANNELS)
            with timer.step(batch):
                params, loss = step(params, jnp.asarray(bx), jnp.asarray(oh))
            it += 1
        acc = evaluate_niti(evals, params, xt, yt, batch=min(batch, len(xt)))
        log(
            f"epoch {epoch}: loss {float(loss):.4f} "
            f"lr {float(lr_inv(0.01, it)):.5f} test_acc {acc:.4f} "
            f"[{timer.summary()}]"
        )
        if checkpoint_path:
            from ..utils.checkpoint import save_checkpoint

            save_checkpoint(checkpoint_path, params, step=epoch + 1)
    return params, acc


def train_fp32(
    train_data,
    test_data,
    epochs: int = 10,
    batch: int = 64,
    seed: int = 0,
    log: Callable[[str], None] = print,
):
    """MnistTrain loop (fp32 LeNet + momentum SGD) -> (params, accuracy)."""
    model = LeNetFP32()
    params = model.init(jax.random.PRNGKey(seed))
    velocity = sgd_init(params)

    def loss_fn(p, x, onehot):
        logits = model.apply(p, x)
        return -jnp.mean(jnp.sum(jax.nn.log_softmax(logits) * onehot, axis=-1))

    @jax.jit
    def step(p, v, x, onehot, lr):
        loss, g = jax.value_and_grad(loss_fn)(p, x, onehot)
        p, v = sgd_update(p, g, v, lr)
        return p, v, loss

    @jax.jit
    def predict(p, x):
        return jnp.argmax(model.apply(p, x), axis=-1)

    x, y = train_data
    xt, yt = test_data
    dl = make_loader(x, y, batch, seed=seed)
    it = 0
    acc = 0.0
    for epoch in range(epochs):
        timer = StepTimer()
        loss = None
        for bx, by in dl.epoch():
            bx = (bx / 255.0 - 0.5) * 2.0
            oh = onehot_padded(by, 10, 10).astype(np.float32)
            with timer.step(batch):
                params, velocity, loss = step(
                    params, velocity, jnp.asarray(bx), jnp.asarray(oh),
                    lr_inv(0.01, it),
                )
            it += 1
        n = (len(xt) // batch) * batch
        correct = 0
        for i in range(0, n, batch):
            bx = (xt[i : i + batch].astype(np.float32) / 255.0 - 0.5) * 2.0
            pred = predict(params, jnp.asarray(bx))
            correct += int(np.sum(np.asarray(pred) == yt[i : i + batch]))
        acc = correct / max(n, 1)
        log(
            f"epoch {epoch}: loss {float(loss):.4f} test_acc {acc:.4f} "
            f"[{timer.summary()}]"
        )
    return params, acc

def train_fp32_bn(
    model,
    train_data,
    test_data,
    epochs: int = 10,
    batch: int = 64,
    seed: int = 0,
    num_classes: int = 10,
    log: Callable[[str], None] = print,
):
    """fp32 training loop for the BN-carrying float models
    (MobileNetV2FP32/ResNet18FP32 style: apply -> (logits, new_params with
    updated running stats)). Momentum SGD + inv-lr, same protocol as
    train_fp32 — the fp32 comparison axis for the CIFAR-geometry configs
    (reference MobilenetV2Utils::train, demo/MobilenetV2Utils.cpp:34)."""
    params = model.init(jax.random.PRNGKey(seed))
    velocity = sgd_init(params)

    def loss_fn(p, x, onehot):
        logits, new_p = model.apply(p, x, training=True)
        loss = -jnp.mean(jnp.sum(jax.nn.log_softmax(logits) * onehot, axis=-1))
        return loss, new_p

    @jax.jit
    def step(p, v, x, onehot, lr):
        (loss, new_p), g = jax.value_and_grad(loss_fn, has_aux=True)(p, x, onehot)
        p2, v = sgd_update(p, g, v, lr)
        p2 = jax.tree_util.tree_map_with_path(
            lambda path, a, b: b
            if getattr(path[-1], "key", None) in ("mean", "var") else a,
            p2, new_p,
        )
        return p2, v, loss

    @jax.jit
    def predict(p, x):
        logits, _ = model.apply(p, x, training=False)
        return jnp.argmax(logits, axis=-1)

    x, y = train_data
    xt, yt = test_data
    dl = make_loader(x, y, batch, seed=seed)
    it = 0
    acc = 0.0
    for epoch in range(epochs):
        timer = StepTimer()
        loss = None
        for bx, by in dl.epoch():
            bx = (bx / 255.0 - 0.5) * 2.0
            oh = onehot_padded(by, 10, num_classes).astype(np.float32)
            with timer.step(batch):
                params, velocity, loss = step(
                    params, velocity, jnp.asarray(bx), jnp.asarray(oh),
                    lr_inv(0.01, it),
                )
            it += 1
        n = max((len(xt) // batch) * batch, batch) if len(xt) >= batch else len(xt)
        correct = 0
        count = 0
        for i in range(0, len(xt) - batch + 1, batch):
            bx = (xt[i : i + batch].astype(np.float32) / 255.0 - 0.5) * 2.0
            pred = predict(params, jnp.asarray(bx))
            correct += int(np.sum(np.asarray(pred) == yt[i : i + batch]))
            count += batch
        acc = correct / max(count, 1)
        log(
            f"epoch {epoch}: loss {float(loss):.4f} test_acc {acc:.4f} "
            f"[{timer.summary()}]"
        )
    return params, acc
