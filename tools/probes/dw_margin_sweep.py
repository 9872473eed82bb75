#!/usr/bin/env python
"""Depthwise filter-grad margin sweep: full-NITI MobileNetV2 training
stability vs the dw-only requant margin (shift = bw - margin).

The dense NITI margin (2) diverges on MobileNetV1/V2 (loss -> 2^19);
depthwise is this framework's extension (the reference's MobileNets are
fp32), so the margin is a free design parameter. 15 epochs on the
CIFAR-geometry real-digits set per margin.

Run on TPU: python tools/probes/dw_margin_sweep.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

from mandheling_tpu.utils import compile_cache

compile_cache.enable()


def main():
    sys.argv = [sys.argv[0]]
    from tools.accuracy_bench import load_cifar_or_fallback

    from mandheling_tpu.models.mobilenet import mobilenet_v2_niti
    from mandheling_tpu.ops import depthwise as dw_ops
    from mandheling_tpu.train.trainer import train_niti

    name, tr, te = load_cifar_or_fallback(
        os.environ.get("CIFAR_ROOT", "cifar10"))
    print("dataset:", name, flush=True)
    for margin in (4, 6, 8):
        dw_ops.set_dw_fgrad_margin(margin)
        try:
            _, acc = train_niti(
                tr, te, epochs=15, batch=64, seed=0,
                model=mobilenet_v2_niti(),
                log=lambda m, mg=margin: print(f"[m{mg}] {m}", flush=True))
            print(json.dumps({"margin": margin, "final_acc": round(acc, 4)}),
                  flush=True)
        except Exception as e:
            print(json.dumps({"margin": margin, "error": str(e)[:120]}),
                  flush=True)
        finally:
            dw_ops.set_dw_fgrad_margin(2)


if __name__ == "__main__":
    main()
