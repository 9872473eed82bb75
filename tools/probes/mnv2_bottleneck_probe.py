#!/usr/bin/env python
"""r5 full-NITI MobileNetV2 bottleneck study — attack the r4 isolated
blocker (DIVERGENCE_r04.json mnv2_structure_isolation: the
expand->dw->LINEAR-projection chain under per-tensor int8 activation
requant keeps MNv2 at chance even with residuals removed).

Hypothesis under test (VERDICT r4 task 1, option b, generalized): the
linear projection's per-tensor int8 requant destroys the bottleneck
signal; widening ONLY the projection outputs (and the residual joins they
feed) to int16 (ops/numerics.requant_forward out_bits=15 — same
power-of-two, range-estimate, psto contract with shift = bw - 15)
restores enough SQNR for integer-only training to learn. The reference
never trains any MobileNet integer-only (demo/MobilenetV2Utils.cpp:34 is
fp32/QAT-only), so a positive result exceeds the reference.

Cells (run in priority order, JSON written incrementally so a relay
death keeps completed cells):
  mnv2_int16_pc   proj_bits=15 + per-channel dw, seeds 0/1
  mnv2_int16      proj_bits=15 only (ablation), seed 0
  mnv2_pc         per-channel dw only = the r4 blocked config, seeds 0/1
                  (two-seeds the r4 "chance" conclusion, VERDICT task 8)
  mnv1_pc_seed1   MNv1 per-channel second seed (VERDICT task 8)
Each MNv2 cell also records the per-projection SQNR table (requant error
of the projection outputs, measured on a fixed probe batch) at init and
after training — the measured mechanism, not just the outcome.

Run on TPU (single process, nohup):
  nohup python tools/probes/mnv2_bottleneck_probe.py --out /tmp/r5_study.json &
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


def projection_layers(model):
    """Ordered (path, layer) of the linear-projection 1x1 convs: every
    1x1 act-None NITIConv2D except the final logits conv (list order =
    graph order; the logits conv is the last such conv)."""
    from mandheling_tpu.nn.blocks import ResidualBlock
    from mandheling_tpu.nn.layers import NITIConv2D
    from mandheling_tpu.nn.module import Sequential

    out = []

    def walk(m, path):
        for i, layer in enumerate(m.layers):
            if isinstance(layer, Sequential):
                walk(layer, path + (i,))
            elif isinstance(layer, ResidualBlock):
                walk(layer.branch, path + (i,))
            elif (isinstance(layer, NITIConv2D) and layer.kernel == (1, 1)
                  and layer.act is None):
                out.append((path + (i,), layer))

    walk(model, ())
    return out[:-1]  # drop the logits conv


def sqnr_fwd(model, params, q, records, proj_ids, prefix=()):
    """Forward mirroring Sequential/ResidualBlock.fwd that records, for
    each projection conv, the requant SQNR: signal = the exact int32
    accumulator, error = acc - (y << shift). Returns the model output."""
    from mandheling_tpu.nn.blocks import ResidualBlock
    from mandheling_tpu.nn.module import Sequential
    from mandheling_tpu.ops import conv as conv_ops
    from mandheling_tpu.ops import eltwise as elt_ops
    from mandheling_tpu.ops.qtensor import QTensor

    for i, (layer, p) in enumerate(zip(model.layers, params)):
        path = prefix + (i,)
        if isinstance(layer, Sequential):
            q = sqnr_fwd(layer, p, q, records, proj_ids, path)
        elif isinstance(layer, ResidualBlock):
            skip = q
            out = sqnr_fwd(layer.branch, p, q, records, proj_ids, path)
            y, e = elt_ops.add_int8(out.data, out.exp, skip.data, skip.exp)
            q = QTensor(y, e)
        else:
            q_in = q
            q, _ = layer.fwd(p, q)
            if path in proj_ids:
                w = p["w"]
                acc = conv_ops.conv2d_int8_acc(q_in.data, w.data,
                                               layer.stride, layer.padding)
                shift = q.exp - (q_in.exp + w.exp)
                recon = jnp.left_shift(q.data.astype(jnp.int32), shift)
                err = (acc - recon).astype(jnp.float32)
                sig = jnp.sum(acc.astype(jnp.float32) ** 2)
                records.append((path, sig, jnp.sum(err ** 2), q.exp,
                                jnp.max(jnp.abs(acc))))
    return q


def measure_sqnr(model, params, probe_x):
    """Per-projection SQNR table on a fixed probe batch."""
    from mandheling_tpu.train.train_step import quantize_batch
    from mandheling_tpu.ops.qtensor import QTensor

    proj_ids = {path for path, _ in projection_layers(model)}

    @jax.jit
    def run(params, xb):
        data, ascale = quantize_batch(xb)
        records = []
        sqnr_fwd(model, params, QTensor(data, ascale), records, proj_ids)
        return [(sig, noise, e, m) for (_, sig, noise, e, m) in records]

    paths = [p for p, _ in projection_layers(model)]
    vals = run(params, probe_x)
    rows = []
    for path, (sig, noise, e, m) in zip(paths, vals):
        sig, noise = float(sig), float(noise)
        db = 10.0 * np.log10(sig / noise) if noise > 0 else float("inf")
        rows.append({"proj": "/".join(map(str, path)),
                     "sqnr_db": round(db, 2), "out_exp": int(e),
                     "max_acc": int(m)})
    return rows


def run_cell(name, model_fn, seed, epochs, data, out, out_path,
             sqnr_batch=None):
    from mandheling_tpu.train.trainer import train_niti

    (tr, te) = data
    model = model_fn()
    cell = {"cell": name, "seed": seed, "epochs": epochs, "curve": []}
    if sqnr_batch is not None:
        params0 = model.init(jax.random.PRNGKey(seed))
        cell["sqnr_init"] = measure_sqnr(model, params0, sqnr_batch)
        print(f"[{name} s{seed}] sqnr@init: "
              + " ".join(f"{r['sqnr_db']:.0f}" for r in cell["sqnr_init"]),
              flush=True)

    best = [0.0]

    def log(msg):
        print(f"[{name} s{seed}] {msg}", flush=True)
        try:
            ep = int(msg.split("epoch ")[1].split(":")[0])
            loss = float(msg.split("loss ")[1].split(" ")[0])
            acc = float(msg.split("test_acc ")[1].split(" ")[0])
            best[0] = max(best[0], acc)
            cell["curve"].append({"epoch": ep, "loss": loss, "acc": acc})
        except (IndexError, ValueError):
            pass

    params, acc = train_niti(tr, te, epochs=epochs, batch=64, seed=seed,
                             model=model, log=log)
    cell["final_acc"] = round(float(acc), 4)
    cell["best_acc"] = round(best[0], 4)
    if sqnr_batch is not None:
        cell["sqnr_trained"] = measure_sqnr(model, params, sqnr_batch)
    out["cells"].append(cell)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"[{name} s{seed}] DONE final {cell['final_acc']} "
          f"best {cell['best_acc']} -> {out_path}", flush=True)
    return cell


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/r5_mnv2_study.json")
    ap.add_argument("--epochs", type=int, default=15)
    ap.add_argument("--cells", default="int16_pc:0,int16_pc:1,int16:0,"
                                       "pc:0,pc:1,mnv1_pc:1")
    # r5 margin hypothesis: the r4 sweep only tried margins 2..4 (which
    # ENLARGE the integer update: requant keeps ~margin+1 top bits);
    # with MNv2's loss RISING under every precision variant, the untried
    # direction is SMALLER updates (margin 0/1)
    ap.add_argument("--dense-margin", type=int, default=None)
    ap.add_argument("--dw-margin", type=int, default=None)
    args = ap.parse_args()

    if args.dense_margin is not None:
        from mandheling_tpu.ops import conv as conv_ops

        conv_ops.set_fgrad_margin(args.dense_margin)
    if args.dw_margin is not None:
        from mandheling_tpu.ops import depthwise as dw_ops

        dw_ops.set_dw_fgrad_margin(args.dw_margin)

    from tools.accuracy_bench import load_cifar_or_fallback

    from mandheling_tpu.models.mobilenet import (
        mobilenet_v1_niti,
        mobilenet_v2_niti,
    )

    name, tr, te = load_cifar_or_fallback(os.environ.get("CIFAR_ROOT",
                                                         "cifar10"))
    print("dataset:", name, flush=True)
    probe_x = jnp.asarray(tr[0][:64].astype(np.float32))

    makers = {
        "int16_pc": lambda: mobilenet_v2_niti(proj_bits=15,
                                              dw_per_channel=True),
        "int16": lambda: mobilenet_v2_niti(proj_bits=15),
        "pc": lambda: mobilenet_v2_niti(dw_per_channel=True),
        "pt": lambda: mobilenet_v2_niti(),
        "mnv1_pc": lambda: mobilenet_v1_niti(dw_per_channel=True),
    }
    from mandheling_tpu.ops import conv as conv_ops
    from mandheling_tpu.ops import depthwise as dw_ops

    out = {"study": "r5 MNv2 linear-bottleneck int16 extension",
           "dataset": name, "epochs": args.epochs,
           "dense_margin": conv_ops.get_fgrad_margin(),
           "dw_margin": dw_ops.get_dw_fgrad_margin(), "cells": []}
    for spec in args.cells.split(","):
        cname, seed = spec.split(":")
        is_v2 = cname != "mnv1_pc"
        run_cell(cname, makers[cname], int(seed), args.epochs, (tr, te),
                 out, args.out, sqnr_batch=probe_x if is_v2 else None)


if __name__ == "__main__":
    main()
