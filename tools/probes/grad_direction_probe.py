#!/usr/bin/env python
"""Gradient-DIRECTION quality probe (r5): per-layer cosine between the
NITI integer weight gradient and the true float gradient of a
dequantized twin network at the same parameter point.

Motivation: the r5 study ruled out forward precision (int16 projections
requant at 75-85 dB SQNR and MNv2-NITI still sits at chance with RISING
loss, /tmp/r5_mnv2_long.json) while fp32 MNv2 learns 0.76 on the same
data — so the blocker is the integer UPDATE. This probe measures, layer
by layer, whether the int8 requantized gradient still points the right
way: cos(g_int, g_float). Calibration: the same table for MobileNetV1-pc
(learns, 0.86) and ResNet18 (learns, 0.97) says what "good enough"
direction quality looks like.

The float twin replays the SAME architecture (convs + relu6 + residual
adds + pools, no BN) with weights w.data * 2^w.exp and float activations;
its autodiff gradient is the reference direction. Per-channel dw
exponents scale the twin's per-channel gradient back into data units
(2^exp_c) before the cosine, matching the integer update's units.

Run on TPU: python tools/probes/grad_direction_probe.py --out ...
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


def float_forward(model, fparams, x):
    """Differentiable float replay of a NITI Sequential tree. fparams
    mirrors params with QTensor -> float weight arrays."""
    from mandheling_tpu.nn.blocks import (
        GlobalAvgPool,
        NITIAvgPool,
        NITIDepthwiseConv2D,
        ParallelAdd,
        ParallelConcat,
        ResidualBlock,
    )
    from mandheling_tpu.nn.layers import (
        Flatten,
        NITIConv2D,
        NITIMaxPool,
        NITIRelu,
        NITIRelu6,
        SqueezeLogits,
    )
    from mandheling_tpu.nn.module import Sequential
    from mandheling_tpu.ops.conv import resolve_padding

    def act(y, a):
        if a == "relu6":
            return jnp.clip(y, 0.0, 6.0)
        return y

    def apply(layer, p, x):
        if isinstance(layer, Sequential):
            for sub, sp in zip(layer.layers, p):
                x = apply(sub, sp, x)
            return x
        if isinstance(layer, ResidualBlock):
            return x + apply(layer.branch, p, x)
        if type(layer).__name__ == "ProjectedResidualBlock":
            return (apply(layer.branch, p["branch"], x)
                    + apply(layer.proj, p["proj"], x))
        if isinstance(layer, ParallelAdd):
            outs = [apply(br, bp, x) for br, bp in zip(layer.branches, p)]
            return sum(outs[1:], outs[0])
        if isinstance(layer, ParallelConcat):
            outs = [apply(br, bp, x) for br, bp in zip(layer.branches, p)]
            return jnp.concatenate(outs, axis=-1)
        if isinstance(layer, NITIDepthwiseConv2D):
            w = p["w"]
            pad = resolve_padding(layer.padding, layer.kernel, layer.stride,
                                  x.shape[1:3])
            y = jax.lax.conv_general_dilated(
                x, w, layer.stride, pad,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=x.shape[-1])
            return act(y, layer.act)
        if isinstance(layer, NITIConv2D):
            w = p["w"]
            pad = resolve_padding(layer.padding, layer.kernel, layer.stride,
                                  x.shape[1:3])
            y = jax.lax.conv_general_dilated(
                x, w, layer.stride, pad,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return act(y, layer.act)
        if isinstance(layer, NITIRelu):
            return jnp.maximum(x, 0.0)
        if isinstance(layer, NITIRelu6):
            return jnp.clip(x, 0.0, 6.0)
        if isinstance(layer, NITIMaxPool):
            return jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max,
                (1,) + tuple(layer.window) + (1,),
                (1,) + tuple(layer.stride) + (1,), "VALID")
        if isinstance(layer, NITIAvgPool):
            xx = x
            if layer.pad:
                pp = layer.pad
                xx = jnp.pad(x, ((0, 0), (pp, pp), (pp, pp), (0, 0)))
            s = jax.lax.reduce_window(
                xx, 0.0, jax.lax.add,
                (1,) + tuple(layer.window) + (1,),
                (1,) + tuple(layer.stride) + (1,), "VALID")
            return s / float(layer.window[0] * layer.window[1])
        if isinstance(layer, GlobalAvgPool):
            return jnp.mean(x, axis=(1, 2), keepdims=True)
        if isinstance(layer, Flatten):
            return x.reshape(x.shape[0], 1, 1, -1)
        if isinstance(layer, SqueezeLogits):
            return x.reshape(x.shape[0], -1)
        raise ValueError(f"no float twin for {type(layer).__name__}")

    for layer, p in zip(model.layers, fparams):
        x = apply(layer, p, x)
    return x


def qt_to_float(params):
    """QTensor leaves -> float weight arrays (value = data * 2^exp)."""
    from mandheling_tpu.ops.qtensor import QTensor

    def conv(p):
        if isinstance(p, QTensor):
            e = p.exp.astype(jnp.float32)
            return p.data.astype(jnp.float32) * jnp.exp2(
                e if e.ndim == 0 else e[None, None, None, :])
        if isinstance(p, dict):
            return {k: conv(v) for k, v in p.items()}
        if isinstance(p, (list, tuple)):
            return type(p)(conv(v) for v in p)
        return p
    return [conv(p) for p in params]


def exp_scale_like(params):
    """Per-leaf 2^exp scaling arrays to express float grads in data units
    (d/d(data) = 2^exp * d/d(value))."""
    from mandheling_tpu.ops.qtensor import QTensor

    def conv(p):
        if isinstance(p, QTensor):
            e = p.exp.astype(jnp.float32)
            return jnp.exp2(e if e.ndim == 0 else e[None, None, None, :])
        if isinstance(p, dict):
            return {k: conv(v) for k, v in p.items()}
        if isinstance(p, (list, tuple)):
            return type(p)(conv(v) for v in p)
        return p
    return [conv(p) for p in params]


def layer_names(model):
    names = []
    for i, layer in enumerate(model.layers):
        names.append(f"{i:02d}.{type(layer).__name__}")
    return names


def grad_tables(model, params, xb, oh):
    """(names, cos, |gi|_mean, |gf|_norm) per TOP-LEVEL layer."""
    from mandheling_tpu.ops.loss import loss_grad_int8
    from mandheling_tpu.ops.qtensor import QTensor
    from mandheling_tpu.train.train_step import quantize_batch

    @jax.jit
    def run(params, xb, oh):
        data, ascale = quantize_batch(xb)
        logits, residuals = model.fwd(params, QTensor(data, ascale))
        g = loss_grad_int8(logits.data, logits.exp, oh)
        _, grads = model.bwd(params, residuals, g, need_input_grad=False)

        fparams = qt_to_float(params)
        scales = exp_scale_like(params)
        xf = data.astype(jnp.float32) * jnp.exp2(ascale.astype(jnp.float32))

        def loss_fn(fp):
            logits_f = float_forward(model, fp, xf)
            return -jnp.mean(jnp.sum(
                jax.nn.log_softmax(logits_f) * oh, axis=-1))

        gf = jax.grad(loss_fn)(fparams)
        # express float grads in data units
        gf = jax.tree.map(lambda g_, s: g_ * s, gf, scales)

        out = []
        is_qt = lambda x: hasattr(x, "data") and hasattr(x, "exp")
        for gi_l, gf_l in zip(grads, gf):
            gi_flat = [l.data.astype(jnp.float32).ravel()
                       for l in jax.tree.leaves(gi_l, is_leaf=is_qt)
                       if is_qt(l)]
            gf_flat = [jnp.asarray(g_).astype(jnp.float32).ravel()
                       for g_ in jax.tree.leaves(gf_l)]
            if not gi_flat or not gf_flat:
                out.append((jnp.float32(0), jnp.float32(0), jnp.float32(0)))
                continue
            a = jnp.concatenate(gi_flat)
            b = jnp.concatenate(gf_flat)
            cos = jnp.sum(a * b) / jnp.maximum(
                jnp.linalg.norm(a) * jnp.linalg.norm(b), 1e-12)
            out.append((cos, jnp.mean(jnp.abs(a)), jnp.linalg.norm(b)))
        return out

    vals = run(params, xb, oh)
    names = layer_names(model)
    rows = []
    for n, (cos, gmean, gfn) in zip(names, vals):
        if float(gfn) == 0 and float(gmean) == 0:
            continue
        rows.append({"layer": n, "cos": round(float(cos), 3),
                     "gint_absmean": round(float(gmean), 3),
                     "gfloat_norm": round(float(gfn), 5)})
    return rows


def run_model(tag, model, seeds, epochs_list, tr, te, out, out_path):
    from mandheling_tpu.data import onehot_padded
    from mandheling_tpu.train.trainer import train_niti

    (x, y) = tr
    xb = jnp.asarray(x[:64].astype(np.float32))
    oh = jnp.asarray(onehot_padded(y[:64], 10, 12).astype(np.float32))
    for seed in seeds:
        params = model.init(jax.random.PRNGKey(seed))
        stages = {"init": grad_tables(model, params, xb, oh)}
        prev_ep = 0
        for ep in epochs_list:
            params, _ = train_niti(tr, te, epochs=ep, batch=64, seed=seed,
                                   model=model, start_params=params,
                                   start_epoch=prev_ep,
                                   log=lambda m: None)
            prev_ep = ep
            stages[f"ep{ep}"] = grad_tables(model, params, xb, oh)
        out["models"].append({"model": tag, "seed": seed, "stages": stages})
        with open(out_path, "w") as f:
            json.dump(out, f, indent=1)
        for sname, rows in stages.items():
            worst = sorted(rows, key=lambda r: r["cos"])[:4]
            print(f"[{tag} s{seed} {sname}] median cos "
                  f"{np.median([r['cos'] for r in rows]):.3f} worst: "
                  + ", ".join(f"{r['layer']}={r['cos']}" for r in worst),
                  flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/r5_grad_direction.json")
    ap.add_argument("--models", default="mnv2_int16_pc,mnv1_pc,resnet18")
    ap.add_argument("--stages", default="5,20")
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
    from mandheling_tpu.models.resnet import resnet18_niti

    name, tr, te = load_cifar_or_fallback(os.environ.get("CIFAR_ROOT",
                                                         "cifar10"))
    print("dataset:", name, flush=True)
    out = {"study": "r5 gradient-direction (int vs float-twin cosine)",
           "dataset": name, "models": []}
    epochs_list = [int(s) for s in args.stages.split(",") if s]
    makers = {
        "mnv2_int16_pc": lambda: mobilenet_v2_niti(proj_bits=15,
                                                   dw_per_channel=True),
        "mnv2_pc": lambda: mobilenet_v2_niti(dw_per_channel=True),
        "mnv1_pc": lambda: mobilenet_v1_niti(dw_per_channel=True),
        "resnet18": lambda: resnet18_niti(),
    }
    for tag in args.models.split(","):
        run_model(tag, makers[tag](), [0], epochs_list, tr, te, out,
                  args.out)


if __name__ == "__main__":
    main()
