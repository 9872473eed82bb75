"""Checkpoint / snapshot: save and restore the training state pytree.

Reference: `Variable::save/load` serializing VARPs to .mnn flatbuffers
(`express/Expr.cpp:731-938`), used by the MnistTrainSnapshot demo
(`demo/mnistTrain.cpp:340-360`) and `ParameterOptimizer::currentStep`
(`optimizer/ParameterOptimizer.cpp:64-70`). The TPU-native equivalent is a
flat npz of the (int8 weights, exponents, step, optimizer-state) pytree —
dependency-free and exact for integer state.

Schema versioning: every checkpoint carries `schema` in its meta record.
Loaders accept any version <= SCHEMA_VERSION through `_MIGRATIONS` (old
checkpoints are upgraded in memory at load; v0 = round-1 files without a
schema field) and refuse newer-than-known versions with a clear error —
the compat story the reference gets from flatbuffers schema evolution
(`schema/default/MNN.fbs`).
"""

from __future__ import annotations

import json
import os
from typing import Any, Tuple

import jax
import numpy as np

from ..ops.qtensor import QTensor


def _flatten_with_paths(tree: Any):
    flat, treedef = jax.tree.flatten_with_path(tree)
    out = {}
    for path, leaf in flat:
        key = "/".join(str(p) for p in path)
        out[key] = np.asarray(leaf)
    return out, treedef


SCHEMA_VERSION = 1

# version -> in-memory upgrade of (meta, arrays); applied in sequence
_MIGRATIONS = {
    # v0 (round-1, no schema field) -> v1: no array changes, just the field
    0: lambda meta, arrays: ({**meta, "schema": 1}, arrays),
}


def _migrate(meta, arrays):
    v = int(meta.get("schema", 0))
    if v > SCHEMA_VERSION:
        raise ValueError(
            f"checkpoint schema v{v} is newer than this build's "
            f"v{SCHEMA_VERSION} — upgrade the framework to load it"
        )
    while v < SCHEMA_VERSION:
        meta, arrays = _MIGRATIONS[v](meta, arrays)
        v = int(meta["schema"])
    return meta, arrays


def save_checkpoint(path: str, params: Any, step: int = 0, extra: Any = None):
    """Save a params pytree (+step) to an .npz; atomic via temp rename."""
    arrays, _ = _flatten_with_paths(params)
    meta = {"step": int(step), "schema": SCHEMA_VERSION}
    if extra is not None:
        meta["extra"] = extra
    tmp = path + ".tmp"
    np.savez(tmp, __meta__=json.dumps(meta), **arrays)
    # np.savez appends .npz to the temp name
    os.replace(tmp + ".npz" if not tmp.endswith(".npz") else tmp, path)


def load_checkpoint(path: str, params_template: Any) -> Tuple[Any, int]:
    """Restore into the structure of `params_template` -> (params, step)."""
    with np.load(path, allow_pickle=False) as data:
        meta = json.loads(str(data["__meta__"]))
        arrays = {k: data[k] for k in data.files if k != "__meta__"}
    meta, arrays = _migrate(meta, arrays)
    flat, treedef = jax.tree.flatten_with_path(params_template)
    leaves = []
    for path_keys, leaf in flat:
        key = "/".join(str(p) for p in path_keys)
        if key not in arrays:
            raise KeyError(f"checkpoint missing leaf {key!r}")
        arr = arrays[key]
        assert arr.shape == np.asarray(leaf).shape, (
            f"shape mismatch at {key}: {arr.shape} vs {np.asarray(leaf).shape}"
        )
        leaves.append(jax.numpy.asarray(arr, dtype=np.asarray(leaf).dtype))
    return jax.tree.unflatten(treedef, leaves), meta["step"]


def quantize_params_tree(float_params: Any) -> Any:
    """Turn an fp32 weight pytree into NITI QTensors — the analog of
    `Transformer::turnModelToTrainable` (transformer/Transformer.cpp:69):
    convert a trained/loaded float model into int8 trainable state."""
    from ..ops.qtensor import quantize_weights

    def q(leaf):
        return quantize_weights(leaf)

    return jax.tree.map(q, float_params)


# ---- inference export (Transformer::turnModelToInfer + Variable::save of an
# inference graph, demo/MobilenetV2Utils.cpp:137-146) ----

_MODEL_REGISTRY = {
    "lenet_niti": ("mandheling_tpu.models", "lenet_niti"),
    "mobilenet_v1_niti": ("mandheling_tpu.models", "mobilenet_v1_niti"),
    "mobilenet_v2_niti": ("mandheling_tpu.models", "mobilenet_v2_niti"),
    "resnet18_niti": ("mandheling_tpu.models", "resnet18_niti"),
}


def export_inference(path: str, model_name: str, params: Any, **model_kwargs):
    """Save (model identity + params) as a self-describing inference
    artifact. The model is code (not a serialized graph), so the artifact
    records which registry constructor rebuilds it — the analog of saving
    the inference .mnn after training."""
    if model_name not in _MODEL_REGISTRY:
        raise ValueError(
            f"unknown model {model_name!r}; known: {sorted(_MODEL_REGISTRY)}")
    save_checkpoint(path, params, step=0,
                    extra={"model": model_name, "kwargs": model_kwargs})


def load_inference(path: str):
    """-> (model, params): rebuild the model from the registry and restore
    its parameters; `model.fwd(params, QTensor(x, ascale))` serves."""
    import importlib

    with np.load(path, allow_pickle=False) as data:
        meta = json.loads(str(data["__meta__"]))
    extra = meta.get("extra") or {}
    name = extra.get("model")
    if name not in _MODEL_REGISTRY:
        raise ValueError(f"artifact has unknown model {name!r}")
    mod, fn = _MODEL_REGISTRY[name]
    model = getattr(importlib.import_module(mod), fn)(**extra.get("kwargs", {}))
    template = model.init(jax.random.PRNGKey(0))
    params, _ = load_checkpoint(path, template)
    return model, params
