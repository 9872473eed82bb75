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
}


def _device_ms(step_like):
    """step_like(dep_scalar) -> new dep scalar; returns ms/iter."""

    @jax.jit
    def run(iters):
        def body(i, dep):
            return step_like(dep)

        return jax.lax.fori_loop(0, iters, body, jnp.int32(0))

    lo, hi = jnp.int32(LO), jnp.int32(HI)
    np.asarray(run(lo))
    np.asarray(run(hi))
    t0 = time.perf_counter()
    np.asarray(run(lo))
    t1 = time.perf_counter()
    np.asarray(run(hi))
    t2 = time.perf_counter()
    return 1e3 * ((t2 - t1) - (t1 - t0)) / (HI - LO)


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


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--models", nargs="*", default=sorted(SHAPES))
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

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
