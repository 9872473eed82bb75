#!/usr/bin/env python
"""Contract-required HBM bytes/step floor for the MNv2 NITI train step
(r5, VERDICT r4 weak #1: the "near the floor" claim needs an actual
floor). Pure accounting — no TPU needed.

The NITI requant contract is inherently two-pass (the GLOBAL max|acc|
must exist before any element can shift — tools/roofline.py), so each
conv-like op's floor depends on its accumulator-residence mode
(ops/conv.py requant policy, measured "auto" defaults):

  materialize: int8 in read (I) + int32 acc write (4A) + one int32 acc
               re-read by the requant pass (4A) + out write (O)
               [the abs-max reduce rides the producer's epilogue —
               observed in PROFILE_r04's fused conv+abs_reduce ops]
  recompute:   int8 in read twice (2I, one per pass) + out write (O);
               the acc never reaches HBM

Elementwise ops (residual adds) always recompute: 2 passes over the int8
inputs + one output write. Backward mask applications (relu6) fuse into
the consuming gradient op: one extra read of the stored forward output.
Weights/optimizer/loss terms are counted but negligible.

This floor is the *contract* minimum for the shipping per-layer residence
choices — XLA overhead (copy/layout ops, unfused passes, tap re-reads)
lands on top of it. Compare `floor_total` against the measured fusion
traffic in PROFILE_r05.json: measured/floor <= 1.15 closes the r4 claim;
larger means attackable slack.

Usage:  python tools/mnv2_bytes_floor.py [--batch 256] [--out -]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def conv_shapes(h, w, kernel, stride, padding):
    kh, kw = kernel
    sh, sw = stride
    if padding == "SAME":
        oh, ow = -(-h // sh), -(-w // sw)
    elif padding == "VALID":
        oh, ow = (h - kh) // sh + 1, (w - kw) // sw + 1
    else:  # explicit ((pt,pb),(pl,pr))
        (pt, pb), (pl, pr) = padding
        oh = (h + pt + pb - kh) // sh + 1
        ow = (w + pl + pr - kw) // sw + 1
    return oh, ow


def floor_rows(batch=256, in_hw=(32, 32), proj_bits=7, dw_per_channel=False):
    """Per-layer floor rows for the CIFAR MNv2 NITI step at `batch`."""
    from mandheling_tpu.models.mobilenet import mobilenet_v2_niti
    from mandheling_tpu.nn.blocks import (
        GlobalAvgPool,
        NITIDepthwiseConv2D,
        ResidualBlock,
    )
    from mandheling_tpu.nn.layers import NITIConv2D, SqueezeLogits
    from mandheling_tpu.nn.module import Sequential
    from mandheling_tpu.ops.conv import (
        _RECOMPUTE_MIN_ACC_ELEMS,
    )

    model = mobilenet_v2_niti(proj_bits=proj_bits,
                              dw_per_channel=dw_per_channel)
    rows = []

    def out_width(layer):
        return 2 if getattr(layer, "out_bits", 7) == 15 else 1

    def conv_row(name, layer, h, w, c, residual_in=False):
        """One NITIConv2D/NITIDepthwiseConv2D: forward + igrad + fgrad."""
        dw = isinstance(layer, NITIDepthwiseConv2D)
        kh, kw = layer.kernel
        oc = c if dw else layer.out_channels
        oh, ow = conv_shapes(h, w, layer.kernel, layer.stride, layer.padding)
        I = batch * h * w * c          # int8 in elements
        O = batch * oh * ow * oc       # out elements
        A = O                          # fwd acc elements
        Ai = I                         # igrad acc elements
        ob = out_width(layer)
        # residence decision mirrors ops/conv._recompute_matmul_acc /
        # ops/depthwise._recompute_dw_acc ("auto"): 1x1 expanding convs
        # >= threshold recompute; everything else (spatial, dw)
        # materializes
        fwd_recompute = ((kh, kw) == (1, 1) and not dw and oc > c
                         and A >= _RECOMPUTE_MIN_ACC_ELEMS and ob == 1)
        igrad_recompute = ((kh, kw) == (1, 1) and not dw and c > oc
                           and Ai >= _RECOMPUTE_MIN_ACC_ELEMS)
        wbytes = kh * kw * (1 if dw else c) * oc
        fwd = (2 * I + O * ob if fwd_recompute
               else I + 8 * A + O * ob) + wbytes
        # igrad: gy in (O int8), gx out (I int8); acc Ai
        igrad = (2 * O + I if igrad_recompute
                 else O + 8 * Ai + I) + wbytes
        # fgrad: read x (I) + gy (O), acc is weight-shaped (negligible)
        fgrad = I + O + 2 * wbytes
        # relu6 backward mask fused into igrad's gy read: + stored-y read
        act_extra = O if layer.act else 0
        rows.append({
            "layer": name, "kind": "dwconv" if dw else "conv",
            "shape": f"{h}x{w}x{c}->{oh}x{ow}x{oc}k{kh}",
            "mode": "recompute" if fwd_recompute else "materialize",
            "fwd_bytes": fwd, "bwd_bytes": igrad + fgrad + act_extra,
        })
        return oh, ow, oc

    def walk(m, h, w, c, prefix=""):
        for i, layer in enumerate(m.layers):
            name = f"{prefix}{i}"
            if isinstance(layer, Sequential):
                h, w, c = walk(layer, h, w, c, name + "/")
            elif isinstance(layer, ResidualBlock):
                bh, bw_, bc = walk(layer.branch, h, w, c, name + "b/")
                n = batch * bh * bw_ * bc
                wid = 2 if proj_bits == 15 else 1
                # fwd add: 2 passes over both int8/16 ins + out write;
                # bwd: gy passes to both branches unchanged (0) + the
                # int8 gx accumulation (2 reads + 1 write)
                rows.append({
                    "layer": name + "+add", "kind": "eltwise",
                    "shape": f"{bh}x{bw_}x{bc}", "mode": "recompute",
                    "fwd_bytes": wid * (4 * n) + wid * n,
                    "bwd_bytes": 3 * n,
                })
                h, w, c = bh, bw_, bc
            elif isinstance(layer, (NITIConv2D, NITIDepthwiseConv2D)):
                h, w, c = conv_row(name, layer, h, w, c)
            elif isinstance(layer, GlobalAvgPool):
                n = batch * h * w * c
                rows.append({"layer": name, "kind": "gap",
                             "shape": f"{h}x{w}x{c}", "mode": "-",
                             "fwd_bytes": n + batch * c,
                             "bwd_bytes": batch * c + n})
                h = w = 1
            elif isinstance(layer, SqueezeLogits):
                pass
        return h, w, c

    walk(model, in_hw[0], in_hw[1], 3)
    # input quantization: float32 read + int8 write (+ loss/softmax tiny)
    n_in = batch * in_hw[0] * in_hw[1] * 3
    rows.append({"layer": "quantize_batch", "kind": "io", "shape": "input",
                 "mode": "-", "fwd_bytes": 4 * n_in + n_in, "bwd_bytes": 0})
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--proj-bits", type=int, default=7)
    ap.add_argument("--out", default="-")
    ap.add_argument("--profile", default="PROFILE_r04.json",
                    help="measured artifact to compare against (repo-root "
                         "relative)")
    args = ap.parse_args()
    rows = floor_rows(args.batch, proj_bits=args.proj_bits)
    fwd = sum(r["fwd_bytes"] for r in rows)
    bwd = sum(r["bwd_bytes"] for r in rows)
    out = {
        "model": "mobilenet_v2_niti cifar",
        "batch": args.batch,
        "proj_bits": args.proj_bits,
        "floor_fwd_bytes": fwd,
        "floor_bwd_bytes": bwd,
        "floor_total_bytes": fwd + bwd,
        "floor_total_gb": round((fwd + bwd) / 1e9, 3),
        "note": ("contract-required HBM floor under the shipping "
                 "residence policy; see module docstring for the "
                 "per-mode accounting"),
        "rows": rows,
    }
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    prof_path = os.path.join(root, args.profile)
    if os.path.exists(prof_path):
        with open(prof_path) as f:
            prof = json.load(f)
        mn = prof.get("mobilenet_v2", {})
        iters = mn.get("iters_traced", 1) or 1
        meas = {}
        for cat in mn.get("cats", []):
            if cat["category"] in ("loop fusion", "convolution fusion",
                                  "broadcast", "custom fusion",
                                  "data formatting", "reduce"):
                meas[cat["category"]] = cat["bytes_accessed"] / iters
        total_meas = sum(meas.values())
        out["measured"] = {
            "artifact": args.profile,
            "per_category_bytes_per_step": {k: round(v)
                                            for k, v in meas.items()},
            "fusion_bytes_per_step": round(total_meas),
            "fusion_gb_per_step": round(total_meas / 1e9, 3),
        }
        out["measured_over_floor"] = round(total_meas / (fwd + bwd), 3)
    txt = json.dumps(out, indent=1)
    if args.out == "-":
        print(txt)
    else:
        with open(args.out, "w") as f:
            f.write(txt)
        print("wrote", args.out, "measured/floor =",
              out.get("measured_over_floor"))


if __name__ == "__main__":
    main()
