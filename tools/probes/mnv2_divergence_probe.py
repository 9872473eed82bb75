#!/usr/bin/env python
"""Full-NITI MobileNetV2 divergence study (r4, VERDICT task 3).

r3 recorded that full-NITI (integer fwd+bwd, w-g update) MobileNetV2
training diverges at depth (loss -> 2e4 by epoch 10) while ResNet18-NITI
trains to ~fp32 parity, and the reference never trains MNv2 NITI either
(demo/MobilenetV2Utils.cpp is fp32/QAT-only). This probe attacks the
finding with the repo's own tooling:

--mode diagnose: instrumented training. Each epoch logs, per leaf layer,
  the forward activation exponent and max|data| on a fixed probe batch,
  the weight exponent and max|w|, and the int8 gradient max — localizing
  WHERE the explosion starts (layer class + depth) and HOW (activation
  exponent runaway vs weight magnitude runaway).

--mode sweep: grid over (dense fgrad margin, dw fgrad margin) — the only
  step-size control NITI has (shift = bw - margin; update is w <- w - g
  with no learning rate, optimizer/NITI_SGD.hpp:20-57) — reporting final
  loss/accuracy per cell.

Run on TPU:
  python tools/probes/mnv2_divergence_probe.py --mode diagnose
  python tools/probes/mnv2_divergence_probe.py --mode sweep
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

from mandheling_tpu.utils import compile_cache

compile_cache.enable()

import jax
import jax.numpy as jnp
import numpy as np


def leaf_layers(model, prefix=""):
    """Flatten the layer tree to (name, layer, param_path) leaves; param
    paths mirror Sequential.init's nested list structure."""
    from mandheling_tpu.nn.blocks import ResidualBlock
    from mandheling_tpu.nn.module import Sequential

    out = []
    for i, layer in enumerate(model.layers):
        name = f"{prefix}{i:02d}.{type(layer).__name__}"
        if isinstance(layer, Sequential):
            out.extend(leaf_layers(layer, prefix=name + "/"))
        elif isinstance(layer, ResidualBlock):
            out.append((name + "<branch>", layer.branch, (i,)))
        else:
            out.append((name, layer, (i,)))
    return out


def instrumented_fwd(model, params, q, collect, prefix=""):
    """Recursive fwd mirroring Sequential/ResidualBlock.fwd, recording
    (name, exp, max|data|) after every leaf layer."""
    from mandheling_tpu.nn.blocks import ResidualBlock
    from mandheling_tpu.nn.module import Sequential
    from mandheling_tpu.ops import eltwise as elt_ops
    from mandheling_tpu.ops.qtensor import QTensor

    residuals = []
    for i, (layer, p) in enumerate(zip(model.layers, params)):
        name = f"{prefix}{i:02d}.{type(layer).__name__}"
        if isinstance(layer, Sequential):
            q, r = instrumented_fwd(layer, p, q, collect, prefix=name + "/")
        elif isinstance(layer, ResidualBlock):
            skip = q
            out, r = instrumented_fwd(
                layer.branch, p, q, collect, prefix=name + "/")
            y, e = elt_ops.add_int8(out.data, out.exp, skip.data, skip.exp)
            q = QTensor(y, e)
            collect.append((name + "+add", q.exp,
                            jnp.max(jnp.abs(q.data.astype(jnp.int32)))))
        else:
            q, r = layer.fwd(p, q)
            collect.append((name, q.exp,
                            jnp.max(jnp.abs(q.data.astype(jnp.int32)))))
        residuals.append(r)
    return q, residuals


def grad_maxes(grads):
    """max|gw| per top-level layer from the grads pytree (0 if no params)."""
    out = []
    for g in grads:
        leaves = [l for l in jax.tree_util.tree_leaves(g)
                  if hasattr(l, "dtype") and l.dtype == jnp.int8]
        m = jnp.int32(0)
        for l in leaves:
            m = jnp.maximum(m, jnp.max(jnp.abs(l.astype(jnp.int32))))
        out.append(m)
    return out


def diagnose(epochs, out_path):
    from tools.accuracy_bench import load_cifar_or_fallback

    from mandheling_tpu.data import onehot_padded
    from mandheling_tpu.data.loader import make_loader
    from mandheling_tpu.models.mobilenet import mobilenet_v2_niti
    from mandheling_tpu.ops.loss import (
        loss_cross_entropy_float,
        loss_grad_int8,
    )
    from mandheling_tpu.ops.qtensor import QTensor
    from mandheling_tpu.train import jit_train_step
    from mandheling_tpu.train.train_step import quantize_batch
    from mandheling_tpu.train.optim import niti_sgd_update

    name, (x, y), (xt, yt) = load_cifar_or_fallback(
        os.environ.get("CIFAR_ROOT", "cifar10"))
    print("dataset:", name, flush=True)
    model = mobilenet_v2_niti()
    params = model.init(jax.random.PRNGKey(0))
    leaves = leaf_layers(model)
    names = None  # filled on first stats call

    @jax.jit
    def stats_step(params, xb, oh):
        """One full train step that ALSO returns the per-layer stats."""
        data, ascale = quantize_batch(xb)
        collect = []
        logits, residuals = instrumented_fwd(
            model, params, QTensor(data, ascale), collect)
        loss = loss_cross_entropy_float(logits.data, logits.exp, oh)
        g = loss_grad_int8(logits.data, logits.exp, oh)
        _, grads = model.bwd(params, residuals, g, need_input_grad=False)
        new_params = niti_sgd_update(params, grads)
        acts = [(e, m) for (_, e, m) in collect]
        return new_params, loss, acts, grad_maxes(grads)

    step = jit_train_step(model)
    dl = make_loader(x, y, 64, seed=0)
    probe_x = jnp.asarray(x[:64].astype(np.float32))
    probe_oh = jnp.asarray(onehot_padded(y[:64], 10, 12))
    record = {"dataset": name, "epochs": []}
    for epoch in range(epochs):
        # one instrumented step on the fixed probe batch (stats recorded),
        # then the plain fast step for the rest of the epoch
        params, loss, acts, gmax = stats_step(params, probe_x, probe_oh)
        act_names = [n for (n, _, _) in
                     _collect_names(model)] if names is None else names
        names = act_names
        rows = []
        for (n, (e, m)) in zip(names, acts):
            rows.append({"layer": n, "act_exp": int(e), "act_max": int(m)})
        wrows = []
        for (n, layer, path) in leaves:
            p = params[path[0]]
            for l in jax.tree_util.tree_leaves(p):
                if hasattr(l, "dtype") and l.dtype == jnp.int8:
                    wrows.append({"layer": n,
                                  "w_max": int(jnp.max(jnp.abs(
                                      l.astype(jnp.int32))))})
                    break
        gr = [{"layer": f"{i:02d}", "gmax": int(g)}
              for i, g in enumerate(gmax) if int(g) > 0]
        record["epochs"].append({
            "epoch": epoch, "probe_loss": float(loss),
            "acts": rows, "weights": wrows, "grad_max_toplevel": gr,
        })
        worst = sorted(rows, key=lambda r: -r["act_exp"])[:3]
        print(f"epoch {epoch}: probe_loss {float(loss):.4f} "
              f"top act_exp: "
              + ", ".join(f"{r['layer']}={r['act_exp']}" for r in worst),
              flush=True)
        for bx, by in dl.epoch():
            oh = onehot_padded(by, 10, 12)
            params, loss = step(params, jnp.asarray(bx), jnp.asarray(oh))
    with open(out_path, "w") as f:
        json.dump(record, f, indent=1)
    print("wrote", out_path)


def _collect_names(model, prefix=""):
    """Names in the same order instrumented_fwd appends them."""
    from mandheling_tpu.nn.blocks import ResidualBlock
    from mandheling_tpu.nn.module import Sequential

    out = []
    for i, layer in enumerate(model.layers):
        name = f"{prefix}{i:02d}.{type(layer).__name__}"
        if isinstance(layer, Sequential):
            out.extend(_collect_names(layer, prefix=name + "/"))
        elif isinstance(layer, ResidualBlock):
            out.extend(_collect_names(layer.branch, prefix=name + "/"))
            out.append((name + "+add", None, None))
        else:
            out.append((name, None, None))
    return out


def sweep(epochs, out_path):
    from tools.accuracy_bench import load_cifar_or_fallback

    from mandheling_tpu.models.mobilenet import mobilenet_v2_niti
    from mandheling_tpu.ops import conv as conv_ops
    from mandheling_tpu.ops import depthwise as dw_ops
    from mandheling_tpu.train.trainer import train_niti

    name, tr, te = load_cifar_or_fallback(
        os.environ.get("CIFAR_ROOT", "cifar10"))
    print("dataset:", name, flush=True)
    results = {"dataset": name, "epochs": epochs, "cells": []}
    for dense_m in (2, 3, 4):
        for dw_m in (2, 4, 6):
            conv_ops.set_fgrad_margin(dense_m)
            dw_ops.set_dw_fgrad_margin(dw_m)
            logs = []
            try:
                _, acc = train_niti(
                    tr, te, epochs=epochs, batch=64, seed=0,
                    model=mobilenet_v2_niti(),
                    log=lambda m: logs.append(m) or print(
                        f"[d{dense_m}/dw{dw_m}] {m}", flush=True))
                last_loss = float(logs[-1].split("loss ")[1].split(" ")[0])
                cell = {"dense_margin": dense_m, "dw_margin": dw_m,
                        "final_acc": round(acc, 4),
                        "final_loss": last_loss,
                        "diverged": last_loss > 10 or acc < 0.2}
            except Exception as e:
                cell = {"dense_margin": dense_m, "dw_margin": dw_m,
                        "error": str(e)[:120]}
            finally:
                conv_ops.set_fgrad_margin(2)
                dw_ops.set_dw_fgrad_margin(2)
            results["cells"].append(cell)
            print(json.dumps(cell), flush=True)
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", out_path)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="diagnose",
                    choices=["diagnose", "sweep"])
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    if args.mode == "diagnose":
        diagnose(args.epochs or 12,
                 args.out or "/tmp/mnv2_divergence_diagnose.json")
    else:
        sweep(args.epochs or 12, args.out or "/tmp/mnv2_divergence_sweep.json")


if __name__ == "__main__":
    main()
