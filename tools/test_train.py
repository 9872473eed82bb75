#!/usr/bin/env python
"""test_train — run a training config from JSON and assert the loss decreases.

TPU-native analog of `tools/cpp/testTrain.cpp` (reads a JSON config, runs a
training loop, checks convergence) combined with the explicit config-
dataclass replacement for the reference's DSP.txt/parallel.txt mode files
(SURVEY.md section 5.6).

    python tools/test_train.py config.json

Config schema (all fields optional):
{
  "model":   "lenet_niti" | "lenet_fp32" | "mobilenet_v2_niti" |
             "mobilenet_v1_niti" | "resnet18_niti",
  "backend": "xla" | "pallas" | "pallas_interpret",
  "steps": 50, "batch": 64, "seed": 0,
  "data": {"kind": "synthetic" | "mnist" | "cifar10", "root": null},
  "lr": 0.01,
  "max_final_loss_ratio": 0.9,   # final loss must be < ratio * initial
  "model_args": {},              # kwargs for the model constructor, e.g.
                                 # {"dw_per_channel": true}
  "fgrad_margin": null,          # dense filter-grad requant margin
  "dw_fgrad_margin": null        # depthwise filter-grad requant margin
}

The solved integer-MobileNetV2 recipe (DIVERGENCE_r05.json) as a config:
{"model": "mobilenet_v2_niti", "model_args": {"dw_per_channel": true},
 "fgrad_margin": 0, "dw_fgrad_margin": 0}

Exit code 0 and a PASS line iff mean loss over the last 10% of steps is
below max_final_loss_ratio * mean loss over the first 10%.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULTS = {
    "model": "lenet_niti",
    "backend": "xla",
    "steps": 50,
    "batch": 64,
    "seed": 0,
    "data": {"kind": "synthetic", "root": None},
    "max_final_loss_ratio": 0.9,
    "lr": 0.01,
    "model_args": {},
    "fgrad_margin": None,
    "dw_fgrad_margin": None,
}

NITI_MODELS = {
    "lenet_niti": ("mandheling_tpu.models", "lenet_niti", (28, 28, 1), 12),
    "mobilenet_v2_niti": ("mandheling_tpu.models", "mobilenet_v2_niti", (32, 32, 3), 12),
    "mobilenet_v1_niti": ("mandheling_tpu.models", "mobilenet_v1_niti", (32, 32, 3), 12),
    "resnet18_niti": ("mandheling_tpu.models", "resnet18_niti", (32, 32, 3), 12),
}


def load_config(path):
    cfg = dict(DEFAULTS)
    if path:
        with open(path) as f:
            user = json.load(f)
        data = {**DEFAULTS["data"], **user.pop("data", {})}
        cfg.update(user)
        cfg["data"] = data
    return cfg


def make_data(cfg):
    import numpy as np

    kind, root = cfg["data"]["kind"], cfg["data"]["root"]
    n = cfg["steps"] * cfg["batch"]
    if kind == "mnist" and root:
        from mandheling_tpu.data import load_or_synthesize

        x, y, real = load_or_synthesize(root, train=True, synth_n=n)
        if real:
            return x[:n].astype(np.float32), y[:n]
    if kind == "cifar10" and root:
        from mandheling_tpu.data.cifar import load_cifar10

        x, y = load_cifar10(root, train=True)
        return x[:n].astype(np.float32), y[:n]
    shape = NITI_MODELS.get(cfg["model"], (None, None, (28, 28, 1), 12))[2]
    rng = np.random.default_rng(cfg["seed"])
    # separable synthetic task: class-dependent mean shift so loss can drop
    y = rng.integers(0, 10, n).astype(np.int32)
    x = rng.normal(0, 1, (n, *shape)).astype(np.float32)
    x += (y / 10.0 - 0.45)[:, None, None, None]
    return x, y


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("config", nargs="?", default=None)
    args = ap.parse_args()
    cfg = load_config(args.config)

    import importlib

    import jax
    import jax.numpy as jnp
    import numpy as np

    from mandheling_tpu.data import DataLoader, onehot_padded
    from mandheling_tpu.ops.kernels import use_backend

    x, y = make_data(cfg)
    losses = []

    with use_backend(cfg["backend"]):
        if cfg["model"] == "lenet_fp32":
            from mandheling_tpu.models import LeNetFP32
            from mandheling_tpu.train.losses import cross_entropy_with_logits
            from mandheling_tpu.train.optim import sgd_init, sgd_update

            model = LeNetFP32()
            params = model.init(jax.random.PRNGKey(cfg["seed"]))
            vel = sgd_init(params)

            @jax.jit
            def step(p, v, xb, oh):
                def loss_fn(p):
                    return cross_entropy_with_logits(model.apply(p, xb), oh)

                loss, g = jax.value_and_grad(loss_fn)(p)
                p, v = sgd_update(p, g, v, cfg["lr"])
                return p, v, loss

            dl = DataLoader(x, y, cfg["batch"], seed=cfg["seed"])
            for bx, by in dl.epoch():
                oh = onehot_padded(by, 10, 10).astype(np.float32)
                params, vel, loss = step(params, vel, jnp.asarray(bx), jnp.asarray(oh))
                losses.append(float(loss))
        else:
            if cfg["fgrad_margin"] is not None:
                from mandheling_tpu.ops import conv as conv_ops

                conv_ops.set_fgrad_margin(int(cfg["fgrad_margin"]))
            if cfg["dw_fgrad_margin"] is not None:
                from mandheling_tpu.ops import depthwise as dw_ops

                dw_ops.set_dw_fgrad_margin(int(cfg["dw_fgrad_margin"]))
            mod_name, fn_name, _, logits_w = NITI_MODELS[cfg["model"]]
            model = getattr(importlib.import_module(mod_name), fn_name)(
                **(cfg["model_args"] or {}))
            from mandheling_tpu.train.train_step import jit_train_step

            params = model.init(jax.random.PRNGKey(cfg["seed"]))
            step = jit_train_step(model)
            dl = DataLoader(x, y, cfg["batch"], seed=cfg["seed"])
            for bx, by in dl.epoch():
                oh = onehot_padded(by, 10, logits_w)
                params, loss = step(params, jnp.asarray(bx), jnp.asarray(oh))
                losses.append(float(loss))

    k = max(1, len(losses) // 10)
    first, last = float(np.mean(losses[:k])), float(np.mean(losses[-k:]))
    ratio = last / max(first, 1e-9)
    ok = ratio < cfg["max_final_loss_ratio"]
    print(json.dumps({
        "model": cfg["model"], "backend": cfg["backend"],
        "steps": len(losses), "first_loss": round(first, 4),
        "last_loss": round(last, 4), "ratio": round(ratio, 4),
        "pass": ok,
    }))
    print("TEST_TRAIN " + ("PASS" if ok else "FAIL"))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
