"""Transfer learning: frozen feature extractor + trainable head.

TPU-native analog of the reference's MobilenetV2Transfer demo
(`demo/mobilenetV2Train.cpp:29-53`): it loads a pretrained graph, freezes
everything up to the AvgPool var (`NN::extract(..., false)`), bolts a fresh
conv head on top and registers only the head's parameters with the
optimizer. Here the split is explicit pytree partitioning — frozen params
are closed over (never donated, never updated), the head trains with the
normal NITI integer update.

Also the analog of `Transformer::turnModelToTrainable/turnModelToInfer`
(`transformer/Transformer.cpp:69`): in this framework models are code and
parameters are pytrees, so "turn trainable" is just choosing which subtree
the optimizer sees — `split_params`/`merge_params` below.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..nn.module import NITILayer, Sequential
from ..ops.loss import loss_cross_entropy_float, loss_grad_int8
from ..ops.qtensor import QTensor
from .optim import niti_sgd_update
from .train_step import quantize_batch


def split_params(params: List, trainable: Sequence[bool]) -> Tuple[List, List]:
    """Partition per-layer params into (frozen, trainable) lists; the frozen
    list holds None at trainable positions and vice versa."""
    frozen = [None if t else p for p, t in zip(params, trainable)]
    train = [p if t else None for p, t in zip(params, trainable)]
    return frozen, train


def merge_params(frozen: List, train: List) -> List:
    return [f if t is None else t for f, t in zip(frozen, train)]


class TransferModel:
    """`features` (frozen Sequential) -> `head` (trainable Sequential).

    Only head parameters flow through init/update; feature params are
    captured at construction like the reference's `mFix` submodule."""

    def __init__(self, features: Sequential, feature_params: List, head: Sequential):
        self.features = features
        self.feature_params = feature_params
        self.head = head

    def init(self, key: jax.Array) -> List:
        return self.head.init(key)

    def fwd(self, head_params, q: QTensor, axis_name: Optional[str] = None):
        feat, _ = self.features.fwd(self.feature_params, q, axis_name)
        return self.head.fwd(head_params, feat, axis_name)

    def bwd(self, head_params, residuals, gy, axis_name: Optional[str] = None):
        # backward stops at the head boundary — the feature extractor is
        # frozen, so its (expensive) backward never runs or compiles.
        return self.head.bwd(head_params, residuals, gy, axis_name)


def make_transfer_train_step(model: TransferModel, axis_name: Optional[str] = None):
    """train_step(head_params, x_float, onehot) -> (new_head_params, loss).

    Mirrors MobilenetV2Utils::train's per-iteration flow
    (`demo/MobilenetV2Utils.cpp:78-100`) with the NITI integer update."""

    def step(head_params, x, onehot):
        data, ascale = quantize_batch(x, axis_name)
        logits, residuals = model.fwd(head_params, QTensor(data, ascale), axis_name)
        loss = loss_cross_entropy_float(logits.data, logits.exp, onehot)
        if axis_name is not None:
            loss = jax.lax.pmean(loss, axis_name)
        g = loss_grad_int8(logits.data, logits.exp, onehot)
        _, grads = model.bwd(head_params, residuals, g, axis_name)
        return niti_sgd_update(head_params, grads), loss

    return step


def make_transfer_eval_step(model: TransferModel, num_classes: int = 10):
    def eval_step(head_params, x, labels):
        data, ascale = quantize_batch(x)
        logits, _ = model.fwd(head_params, QTensor(data, ascale))
        pred = jnp.argmax(logits.data[:, :num_classes], axis=-1)
        return jnp.sum((pred == labels).astype(jnp.int32))

    return eval_step
