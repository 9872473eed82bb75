#!/usr/bin/env python
"""Data-parallel scaling-efficiency harness -> SCALING_r0N.json (default SCALING_r04).

Measures samples/s of the DP NITI train step at 1 device vs N devices
(fixed per-device batch, so perfect scaling = N x samples/s), plus a
2-process x N/2-device run through the multi-host path
(parallel/distributed.py) to exercise the cross-process allreduce.

On this sandbox only ONE real TPU chip exists, so the sweep runs on the
virtual CPU mesh (JAX_PLATFORMS=cpu, xla_force_host_platform_device_count)
— it validates the *harness and sharding* (collective overhead visible,
numerics bit-identical per tests/test_multihost.py); chip-scaling numbers
must come from real multi-chip hardware with the same entry points.

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python tools/scaling_bench.py --out SCALING_r04.json
"""

import argparse
import functools
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from mandheling_tpu.utils import compile_cache

compile_cache.enable()

PER_DEVICE_BATCH = 64
LO, HI = 2, 12


def measure_dp(n_devices: int) -> float:
    import jax
    import jax.numpy as jnp

    from mandheling_tpu.data import onehot_padded
    from mandheling_tpu.models import NITI_LOGIT_CHANNELS, lenet_niti
    from mandheling_tpu.parallel import (
        data_mesh,
        make_dp_train_step,
        replicate,
        shard_batch,
    )

    mesh = data_mesh(n_devices)
    model = lenet_niti()
    params = replicate(mesh, model.init(jax.random.PRNGKey(0)))
    step = make_dp_train_step(model, mesh, donate=False)
    batch = PER_DEVICE_BATCH * n_devices
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (batch, 28, 28, 1)), jnp.float32)
    oh = jnp.asarray(onehot_padded(rng.integers(0, 10, batch), 10,
                                   NITI_LOGIT_CHANNELS))
    xs, ohs = shard_batch(mesh, x, oh)

    def run(iters):
        p = params
        for _ in range(iters):
            p, loss = step(p, xs, ohs)
        jax.block_until_ready(loss)

    run(LO)
    t0 = time.perf_counter(); run(LO)
    t1 = time.perf_counter(); run(HI)
    t2 = time.perf_counter()
    dt = ((t2 - t1) - (t1 - t0)) / (HI - LO)
    return batch / dt


def measure_multihost(nproc: int, ndev_each: int, armode: str):
    """Spawn nproc jax.distributed workers (ndev_each virtual devices each)
    running tools/multihost_bench_worker.py; returns process-0 samples/s."""
    import socket
    import tempfile

    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    here = os.path.dirname(os.path.abspath(__file__))
    worker = os.path.join(here, "multihost_bench_worker.py")
    out = tempfile.mktemp(suffix=".json")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "PYTHONPATH")}
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(port), str(i), str(nproc),
             str(ndev_each), str(PER_DEVICE_BATCH), armode, out],
            env=env,
        )
        for i in range(nproc)
    ]
    rcs = [p.wait(timeout=600) for p in procs]
    if any(rcs) or not os.path.exists(out):
        return None
    with open(out) as f:
        return json.load(f)["samples_per_sec"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="SCALING_r04.json")
    ap.add_argument("--devices", type=int, nargs="*", default=[1, 2, 4, 8])
    args = ap.parse_args()

    import jax

    rows = []
    base = None
    for n in args.devices:
        if n > len(jax.devices()):
            break
        sps = measure_dp(n)
        if n == 1:
            base = sps
        row = {
            "devices": n,
            "processes": 1,
            "samples_per_sec": round(sps, 1),
        }
        if base:
            if jax.devices()[0].platform == "cpu":
                # virtual devices share the host's cores: ideal here is FLAT
                # samples/s while doing N x the global batch — report the
                # throughput retained vs 1 device (sharding overhead), not
                # the x N chip-scaling formula, which needs real chips
                row["throughput_retained_vs_1dev"] = round(sps / base, 3)
            else:
                row["scaling_efficiency"] = round(sps / (base * n), 3)
        rows.append(row)
        print(json.dumps(rows[-1]), flush=True)

    # the promised 2-process row: 2 x N/2 devices through the real
    # jax.distributed multi-host path (cross-process allreduce on the wire)
    n_total = max(n for n in args.devices if n <= len(jax.devices()))
    if n_total >= 2:
        for armode in ("int32", "int8"):
            sps = measure_multihost(2, n_total // 2, armode)
            if sps is None:
                rows.append({"devices": n_total, "processes": 2,
                             "allreduce": armode, "error": "worker failed"})
            else:
                row = {"devices": n_total, "processes": 2,
                       "allreduce": armode,
                       "samples_per_sec": round(sps, 1)}
                if base:
                    row["throughput_retained_vs_1dev"] = round(sps / base, 3)
                one_proc = next((r["samples_per_sec"] for r in rows
                                 if r.get("devices") == n_total
                                 and r.get("processes") == 1), None)
                if one_proc:
                    row["vs_single_process_same_devices"] = round(
                        sps / one_proc, 3)
                rows.append(row)
            print(json.dumps(rows[-1]), flush=True)

    payload = {
        "platform": jax.devices()[0].platform,
        "device_kind": jax.devices()[0].device_kind,
        "per_device_batch": PER_DEVICE_BATCH,
        "note": "single real TPU chip in this sandbox: sweep runs on the "
                "virtual CPU mesh, where all devices share the host cores — "
                "ideal is FLAT samples/s at N x global batch, so the "
                "recorded metric is throughput retained vs 1 device "
                "(collective/sharding overhead). Real chip-scaling "
                "efficiency needs real multi-chip hardware with these same "
                "entry points; multihost bit-identity is asserted in "
                "tests/test_multihost.py",
        "validity": {
            "gate": "BASELINE.md >=90% samples/s scaling efficiency at "
                    "N>=2 hosts",
            "status": "HARDWARE-BLOCKED in this sandbox: one real TPU "
                      "chip, no second host; the gate has no measurable "
                      "instantiation here and these rows are NOT a "
                      "measurement of it.",
            "what_rows_show": "the virtual-mesh rows validate the "
                              "sharding/collective HARNESS only — the DP "
                              "step compiles, runs, and stays bit-identical "
                              "across device/process counts "
                              "(tests/test_parallel.py, "
                              "tests/test_multihost.py); all virtual "
                              "devices time-share one host's cores, so "
                              "throughput ratios mix collective overhead "
                              "with core contention and under-read as "
                              "chip-scaling efficiency.",
            "what_rows_do_not_show": "real ICI/DCN collective latency, "
                                     "per-chip HBM bandwidth isolation, or "
                                     "any number comparable to the >=90% "
                                     "gate.",
        },
        "rows": rows,
    }
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
