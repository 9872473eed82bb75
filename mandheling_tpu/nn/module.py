"""Explicit forward/backward layer protocol — the TPU-native OpGrad.

The reference's backward pass is *not* autodiff of the forward: every grad op
has different requantization (bw-7 for input grads, bw-2 for filter grads,
bw-3 for matmul grads, fixed 4 for the loss) and pseudo-stochastic rounding
(SURVEY.md section 7 "the backward is not autodiff"). The reference wires it
with a per-OpType grad registry walking the expression DAG
(`tools/train/source/grad/OpGrad.cpp:56-128`).

JAX's grad machinery cannot carry int8 cotangents (integer primals have
float0 tangents), and hiding integers in floats would forfeit int8 MXU
throughput. So, like the reference, we build the backward graph explicitly:
each layer implements `fwd` (returning residuals) and `bwd` (consuming the
int8 output-diff, producing the int8 input-diff and parameter grads). A
`Sequential` composes them; the whole fwd+bwd+update traces into ONE jitted
XLA program per training step — the TPU analog of the reference's single
prepared DSP graph per iteration (`CPUBackend.cpp:341-452`).
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import jax

from ..ops.qtensor import QTensor

Params = Any
Residuals = Any
Grads = Any


class NITILayer:
    """Base class: int8-in/int8-out layer with explicit backward."""

    def init(self, key: jax.Array) -> Params:
        return ()

    def fwd(
        self, params: Params, q: QTensor, axis_name: Optional[str] = None
    ) -> Tuple[QTensor, Residuals]:
        raise NotImplementedError

    def bwd(
        self,
        params: Params,
        res: Residuals,
        gy: jax.Array,
        axis_name: Optional[str] = None,
    ) -> Tuple[jax.Array, Grads]:
        raise NotImplementedError

    def bwd_params_only(
        self,
        params: Params,
        res: Residuals,
        gy: jax.Array,
        axis_name: Optional[str] = None,
    ) -> Grads:
        """Parameter gradients without the input gradient. The model's first
        layer never needs an input gradient (the reference likewise wires no
        consumer for it), and for a conv that skips an entire deconv.
        Default falls back to the full backward."""
        _, grads = self.bwd(params, res, gy, axis_name)
        return grads


class Sequential:
    """Ordered layer list; mirrors the reference's Module/registerModel
    (`express/module/Module.cpp`, `demo/mnistTrain.cpp:132-188`)."""

    def __init__(self, layers: Sequence[NITILayer]):
        self.layers = list(layers)

    def init(self, key: jax.Array) -> List[Params]:
        keys = jax.random.split(key, max(len(self.layers), 1))
        return [l.init(k) for l, k in zip(self.layers, keys)]

    def fwd(
        self, params: List[Params], q: QTensor, axis_name: Optional[str] = None
    ) -> Tuple[QTensor, List[Residuals]]:
        residuals = []
        for layer, p in zip(self.layers, params):
            q, r = layer.fwd(p, q, axis_name)
            residuals.append(r)
        return q, residuals

    def bwd(
        self,
        params: List[Params],
        residuals: List[Residuals],
        gy: jax.Array,
        axis_name: Optional[str] = None,
        need_input_grad: bool = True,
    ) -> Tuple[Optional[jax.Array], List[Grads]]:
        """Reverse sweep. With need_input_grad=False the first layer's input
        gradient is skipped (returns None in its place) — the training step
        never consumes it, and for conv models that drops a whole deconv."""
        grads: List[Grads] = [None] * len(self.layers)
        for i in range(len(self.layers) - 1, -1, -1):
            if i == 0 and not need_input_grad:
                grads[0] = self.layers[0].bwd_params_only(
                    params[0], residuals[0], gy, axis_name
                )
                return None, grads
            gy, grads[i] = self.layers[i].bwd(
                params[i], residuals[i], gy, axis_name
            )
        return gy, grads
