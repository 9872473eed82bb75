#!/usr/bin/env python
"""Model-zoo forward/training benchmark — the reference `benchmark/
benchmark.cpp` analog (per-model avg ms over warm runs), extended with
training-step timing.

    python tools/benchmark.py [--models lenet_niti ...] [--batch 256] [--json]

Times are device-side (loop inside one jitted program, fixed dispatch cost
cancelled by differencing two loop lengths — see bench.py).
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mandheling_tpu.utils import compile_cache

compile_cache.enable()

LO, HI = 5, 35

SHAPES = {
    "lenet_niti": (28, 28, 1),
    "lenet_fp32": (28, 28, 1),
    "mobilenet_v1_niti": (32, 32, 3),
    "mobilenet_v2_niti": (32, 32, 3),
    "mobilenet_v1_fp32": (32, 32, 3),
    "mobilenet_v2_fp32": (32, 32, 3),
    "resnet18_niti": (32, 32, 3),
    "squeezenet_niti": (224, 224, 3),
    "resnet50v2_niti": (224, 224, 3),
    "inceptionv3_niti": (299, 299, 3),
}

# The reference's headline benchmark table (forward latency, Kirin 990 CPU
# 4 threads, arm82 fp16 — `execution-engine/benchmark/result/
# 2020-3-22.md:1-29`), mapped to this framework's NITI int8 models at the
# same input geometry. `--headline` measures batch-1 forward latency (the
# reference protocol) and batch-256 throughput for each, on this device.
HEADLINE = [
    # (ref model name, ref avg ms, builder name, kwargs, input hw)
    ("resnet-v2-50", 40.19, "resnet50v2_niti", {"num_classes": 1000}, 224),
    ("MobileNetV2_224", 5.19, "mobilenet_v2_niti",
     {"num_classes": 1000, "variant": "imagenet"}, 224),
    ("mobilenet-v1-1.0", 6.46, "mobilenet_v1_niti",
     {"num_classes": 1000, "variant": "imagenet"}, 224),
    ("SqueezeNetV1.0", 11.59, "squeezenet_niti", {"num_classes": 1000}, 224),
    ("inception-v3", 45.73, "inceptionv3_niti", {"num_classes": 1000}, 299),
]


def _device_ms(step_like, rounds: int = 5, min_total_ms: float = 50.0):
    """step_like(dep_scalar) -> new dep scalar; returns ms/iter.

    Median of `rounds` LO/HI differentials; the iteration counts are
    scaled up until the HI run is expected to take >= min_total_ms so the
    relay's dispatch jitter cannot swamp sub-ms kernels (a single
    differential measured the mobilenet-v1 b1 latency *negative*)."""

    @jax.jit
    def run(iters):
        def body(i, dep):
            return step_like(dep)

        return jax.lax.fori_loop(0, iters, body, jnp.int32(0))

    lo_i, hi_i = LO, HI
    np.asarray(run(jnp.int32(lo_i)))
    t0 = time.perf_counter()
    np.asarray(run(jnp.int32(hi_i)))
    est_ms = 1e3 * (time.perf_counter() - t0)
    if est_ms < min_total_ms:
        scale = int(np.ceil(min_total_ms / max(est_ms, 1e-3)))
        lo_i, hi_i = lo_i * scale, hi_i * scale
        np.asarray(run(jnp.int32(hi_i)))  # warm the scaled loop
    deltas = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        np.asarray(run(jnp.int32(lo_i)))
        t1 = time.perf_counter()
        np.asarray(run(jnp.int32(hi_i)))
        t2 = time.perf_counter()
        deltas.append(1e3 * ((t2 - t1) - (t1 - t0)) / (hi_i - lo_i))
    return float(np.median(deltas))


def build(name, batch):
    from mandheling_tpu import models as M
    from mandheling_tpu.ops.qtensor import QTensor

    h, w, c = SHAPES[name]
    rng = np.random.default_rng(0)

    if name.endswith("_niti") :
        model = getattr(M, name)() if name != "lenet_niti" else M.lenet_niti()
        params = model.init(jax.random.PRNGKey(0))
        x = jnp.asarray(rng.integers(-100, 100, (batch, h, w, c)), jnp.int8)

        def fwd(dep):
            q = QTensor(x + dep.astype(jnp.int8), jnp.int32(-5))
            out, _ = model.fwd(params, q)
            return jnp.max(out.data).astype(jnp.int32) & 1

        return fwd

    xf = jnp.asarray(rng.normal(0, 1, (batch, h, w, c)), jnp.float32)
    if name == "lenet_fp32":
        model = M.LeNetFP32()
        params = model.init(jax.random.PRNGKey(0))

        def fwd(dep):
            logits = model.apply(params, xf + dep.astype(jnp.float32))
            return (jnp.max(logits) > 0).astype(jnp.int32)

        return fwd

    cls = M.MobileNetV1FP32 if "v1" in name else M.MobileNetV2FP32
    model = cls(num_classes=10)
    params = model.init(jax.random.PRNGKey(0))

    def fwd(dep):
        logits, _ = model.apply(params, xf + dep.astype(jnp.float32), training=False)
        return (jnp.max(logits) > 0).astype(jnp.int32)

    return fwd


def _niti_fwd(builder_name, kwargs, hw, batch):
    from mandheling_tpu import models as M
    from mandheling_tpu.ops.qtensor import QTensor

    model = getattr(M, builder_name)(**kwargs)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-100, 100, (batch, hw, hw, 3)), jnp.int8)

    def fwd(dep):
        q = QTensor(x + dep.astype(jnp.int8), jnp.int32(-5))
        out, _ = model.fwd(params, q)
        return jnp.max(out.data).astype(jnp.int32) & 1

    return fwd


def run_headline(out_path=None):
    """Batch-1 forward latency + batch-256 throughput for the reference's
    headline benchmark models; writes the INFER_BENCH artifact."""
    rows = []
    for ref_name, ref_ms, builder, kwargs, hw in HEADLINE:
        b1_ms = _device_ms(_niti_fwd(builder, kwargs, hw, 1))
        bT = 256
        thr_ms = _device_ms(_niti_fwd(builder, kwargs, hw, bT))
        rows.append({
            "ref_model": ref_name,
            "model": builder,
            "input": hw,
            "ref_ms_kirin990_fp16": ref_ms,
            "fwd_ms_b1": round(b1_ms, 4),
            "speedup_vs_ref": round(ref_ms / b1_ms, 1),
            "imgs_per_sec_b256": round(bT / (thr_ms / 1e3), 1),
        })
        print(f"{ref_name:18s} in{hw}  b1 {b1_ms:8.3f} ms "
              f"(ref {ref_ms:6.2f} ms, {ref_ms / b1_ms:8.1f}x)  "
              f"b256 {rows[-1]['imgs_per_sec_b256']:10.1f} imgs/s")
    doc = {"device": jax.devices()[0].device_kind,
           "protocol": "device-loop differential timing, int8 NITI forward",
           "rows": rows}
    if out_path:
        with open(out_path, "w") as f:
            json.dump(doc, f, indent=1)
        print(f"wrote {out_path}")
    return doc


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    # default run sticks to the CIFAR/MNIST-scale models; the 224/299-input
    # headline models (large compiles, OOM-prone at b256) run via --headline
    # or an explicit --models entry
    ap.add_argument(
        "--models", nargs="*",
        default=sorted(n for n, (h, _, _) in SHAPES.items() if h <= 32),
        choices=sorted(SHAPES),
    )
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--json", action="store_true")
    ap.add_argument("--headline", action="store_true",
                    help="reference benchmark-table models at 224/299; "
                         "writes INFER_BENCH artifact")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    if args.headline:
        run_headline(args.out)
        return

    rows = []
    for name in args.models:
        ms = _device_ms(build(name, args.batch))
        rows.append({
            "model": name, "batch": args.batch,
            "fwd_ms": round(ms, 3),
            "imgs_per_sec": round(args.batch / (ms / 1e3), 1),
        })
        if not args.json:
            print(f"{name:22s} batch {args.batch:4d}  {ms:8.3f} ms "
                  f"{rows[-1]['imgs_per_sec']:12.1f} imgs/s")
    if args.json:
        print(json.dumps({"device": jax.devices()[0].device_kind, "rows": rows}))


if __name__ == "__main__":
    main()
