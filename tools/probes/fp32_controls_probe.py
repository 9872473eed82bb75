#!/usr/bin/env python
"""r5 fp32 controls + MNv1 parity comparator (VERDICT r4 tasks 1/3).

Two holes in the r4 divergence study:

1. NO fp32 MobileNetV2-from-scratch control exists on the digits-CIFAR
   data: "MNv2-NITI sits at chance" was never compared against what
   *float* training achieves on the same 1,797-image set in the same
   protocol. If fp32 also fails, the blocker is (at least partly) the
   task, not the quantization. Reference axis: float-vs-NITI on one loop
   (demo/MnistUtils.cpp:35,338).
2. The MNv1-NITI per-channel result (0.86/0.90-best, 40 ep) has no fp32
   comparator, so the parity gap is unquantified.

Cells: mnv2_fp32 x 2 seeds (matches the NITI study's epochs),
mnv1_fp32 x 2 seeds and mnv1_pc x 2 seeds (60 epochs both sides — the
r4 40-epoch NITI curve was still climbing; epoch-40 values are also
reported for protocol comparability).

Run on TPU:  nohup python tools/probes/fp32_controls_probe.py --out ... &
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

from mandheling_tpu.utils import compile_cache

compile_cache.enable()

import jax  # noqa: E402


def parse_curve(cell, msg):
    try:
        ep = int(msg.split("epoch ")[1].split(":")[0])
        loss = float(msg.split("loss ")[1].split(" ")[0])
        acc = float(msg.split("test_acc ")[1].split(" ")[0])
        cell["curve"].append({"epoch": ep, "loss": loss, "acc": acc})
    except (IndexError, ValueError):
        pass


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/r5_fp32_controls.json")
    ap.add_argument("--mnv2-epochs", type=int, default=15)
    ap.add_argument("--mnv1-epochs", type=int, default=60)
    ap.add_argument("--cells", default="mnv2_fp32:0,mnv2_fp32:1,"
                                       "mnv1_fp32:0,mnv1_fp32:1,"
                                       "mnv1_pc:0,mnv1_pc:1")
    args = ap.parse_args()

    from tools.accuracy_bench import load_cifar_or_fallback

    from mandheling_tpu.models import MobileNetV1FP32, MobileNetV2FP32
    from mandheling_tpu.models.mobilenet import mobilenet_v1_niti
    from mandheling_tpu.train.trainer import train_fp32_bn, train_niti

    name, tr, te = load_cifar_or_fallback(os.environ.get("CIFAR_ROOT",
                                                         "cifar10"))
    print("dataset:", name, flush=True)
    out = {"study": "r5 fp32 controls + MNv1 parity", "dataset": name,
           "cells": []}

    for spec in args.cells.split(","):
        cname, seed = spec.split(":")
        seed = int(seed)
        epochs = args.mnv2_epochs if cname == "mnv2_fp32" else args.mnv1_epochs
        cell = {"cell": cname, "seed": seed, "epochs": epochs, "curve": []}

        def log(msg, cell=cell, cname=cname, seed=seed):
            print(f"[{cname} s{seed}] {msg}", flush=True)
            parse_curve(cell, msg)

        if cname == "mnv2_fp32":
            _, acc = train_fp32_bn(MobileNetV2FP32(num_classes=10), tr, te,
                                   epochs=epochs, batch=64, seed=seed,
                                   log=log)
        elif cname == "mnv1_fp32":
            _, acc = train_fp32_bn(MobileNetV1FP32(num_classes=10), tr, te,
                                   epochs=epochs, batch=64, seed=seed,
                                   log=log)
        elif cname == "mnv1_pc":
            _, acc = train_niti(tr, te, epochs=epochs, batch=64, seed=seed,
                                model=mobilenet_v1_niti(dw_per_channel=True),
                                log=log)
        else:
            raise ValueError(cname)
        cell["final_acc"] = round(float(acc), 4)
        cell["best_acc"] = round(max((r["acc"] for r in cell["curve"]),
                                     default=0.0), 4)
        if epochs > 40:
            at40 = [r["acc"] for r in cell["curve"] if r["epoch"] == 39]
            cell["acc_at_epoch40"] = round(at40[0], 4) if at40 else None
        out["cells"].append(cell)
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
        print(f"[{cname} s{seed}] DONE final {cell['final_acc']} "
              f"best {cell['best_acc']}", flush=True)


if __name__ == "__main__":
    main()
