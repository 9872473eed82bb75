"""Per-op profile of a model's jitted train step — Executor::Profiler analog.

The reference dumps per-OpType time+flops each epoch
(express/Executor.cpp:34-77, MnistUtils.cpp:72,184). This tool captures an
XLA profiler trace of the whole jitted NITI train step and prints the
per-op and per-HLO-category device-time tables (utils/profiler.per_op_profile).

Run on the TPU (default platform) or CPU (JAX_PLATFORMS=cpu):

    python tools/profile_model.py --model mobilenet_v2 --batch 256
    python tools/profile_model.py --model resnet18 --batch 256 --top 40
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def build(name: str, batch: int):
    from mandheling_tpu.data import onehot_padded
    from mandheling_tpu.train import make_train_step

    if name == "lenet":
        from mandheling_tpu.models import lenet_niti

        model, hw, cin, logits = lenet_niti(), 28, 1, 12
    elif name == "mobilenet_v2":
        from mandheling_tpu.models.mobilenet import mobilenet_v2_niti

        model, hw, cin, logits = mobilenet_v2_niti(), 32, 3, 12
    elif name == "mobilenet_v1":
        from mandheling_tpu.models.mobilenet import mobilenet_v1_niti

        model, hw, cin, logits = mobilenet_v1_niti(), 32, 3, 12
    elif name == "resnet18":
        from mandheling_tpu.models.resnet import resnet18_niti

        model, hw, cin, logits = resnet18_niti(), 32, 3, 12
    else:
        raise SystemExit(f"unknown model {name}")

    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (batch, hw, hw, cin)), jnp.float32)
    oh = jnp.asarray(onehot_padded(rng.integers(0, 10, batch), 10, logits))
    step = make_train_step(model)
    return lambda p: step(p, x, oh), params


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="mobilenet_v2")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--json", default=None, help="also dump rows to this file")
    ap.add_argument("--backend", default=None, choices=["xla", "pallas"],
                    help="kernel backend override")
    ap.add_argument("--dw", default=None, choices=["taps", "grouped"],
                    help="depthwise acc implementation override")
    ap.add_argument("--sps", action="store_true",
                    help="also measure wall samples/s (differential "
                         "device loop, the bench.py methodology)")
    ap.add_argument("--overlap", action="store_true",
                    help="also print the compute/copy overlap report "
                         "(utils/xplane.overlap_report) — the measured "
                         "CPU-DSP co-scheduling analog")
    ap.add_argument("--fgrad-marker", default="",
                    help="substring identifying filter-grad ops for the "
                         "overlap report's parallel-gradient analysis")
    args = ap.parse_args()

    if args.dw:
        from mandheling_tpu.ops import depthwise

        depthwise.set_dw_impl(args.dw)

    from mandheling_tpu.ops.kernels import use_backend
    from mandheling_tpu.utils import profiler, xplane
    from mandheling_tpu.utils import compile_cache

    compile_cache.enable()

    fn, params = build(args.model, args.batch)
    ctx = use_backend(args.backend) if args.backend else None
    if ctx:
        ctx.__enter__()
    try:
        if args.sps:
            import time

            import numpy as np

            @jax.jit
            def run(p, iters):
                def body(i, carry):
                    p, acc = carry
                    p, loss = fn(p)
                    return (p, acc + loss)

                _, acc = jax.lax.fori_loop(
                    0, iters, body, (p, jnp.float32(0)))
                return acc

            lo, hi = jnp.int32(5), jnp.int32(45)
            np.asarray(run(params, lo)); np.asarray(run(params, hi))
            deltas = []
            for _ in range(3):
                t0 = time.perf_counter(); np.asarray(run(params, lo))
                t1 = time.perf_counter(); np.asarray(run(params, hi))
                t2 = time.perf_counter()
                deltas.append(((t2 - t1) - (t1 - t0)) / 40)
            dt = float(np.median(deltas))
            print(f"WALL: {dt*1e3:.3f} ms/step, "
                  f"{args.batch/dt:.0f} samples/s")
        planes = profiler.trace_device_planes(fn, params, iters=args.iters)
        rows = xplane.per_op_rows(planes)
        cats = xplane.by_category(rows)
        overlap = (xplane.overlap_report(planes,
                                         fgrad_marker=args.fgrad_marker)
                   if args.overlap else None)
    finally:
        if ctx:
            ctx.__exit__(None, None, None)

    total_us = sum(r["total_us"] for r in rows)
    print(f"== {args.model} b{args.batch} train step: "
          f"{total_us/args.iters/1e3:.3f} ms/step device time "
          f"({args.iters} steps traced) ==\n")
    print("-- per op --")
    print(xplane.format_table(rows, top=args.top))
    print("\n-- per HLO category --")
    print(xplane.format_table(cats))
    if overlap is not None:
        print("\n-- compute/copy overlap (all traced steps) --")
        for k, v in overlap.items():
            print(f"  {k}: {v:.1f}" if isinstance(v, float) else
                  f"  {k}: {v}")
    if args.json:
        with open(args.json, "w") as f:
            json.dump({"model": args.model, "batch": args.batch,
                       "iters": args.iters, "rows": rows, "cats": cats,
                       "overlap": overlap}, f, indent=1)


if __name__ == "__main__":
    main()
