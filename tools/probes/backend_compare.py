#!/usr/bin/env python
"""Compare full-train-step throughput across kernel backends on TPU:
LeNet (MNIST, batch 2048) and the CIFAR-scale models (batch 256) under
"xla" vs "pallas". Feeds the per-shape backend defaults and BENCH_DETAIL.

Run on TPU (one process at a time): python tools/probes/backend_compare.py
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp
import numpy as np

from mandheling_tpu.utils import compile_cache

compile_cache.enable()

ITERS_LO, ITERS_HI, ROUNDS = 5, 55, 3


def device_loop_sps(step_fn, init_state, batch):
    @jax.jit
    def run(state, iters):
        def body(i, carry):
            state, acc = carry
            state, loss = step_fn(state)
            return (state, acc + loss)

        _, acc = jax.lax.fori_loop(0, iters, body, (state, jnp.float32(0)))
        return acc

    np.asarray(run(init_state, jnp.int32(ITERS_LO)))
    np.asarray(run(init_state, jnp.int32(ITERS_HI)))
    deltas = []
    for _ in range(ROUNDS):
        t0 = time.perf_counter()
        np.asarray(run(init_state, jnp.int32(ITERS_LO)))
        t1 = time.perf_counter()
        np.asarray(run(init_state, jnp.int32(ITERS_HI)))
        t2 = time.perf_counter()
        deltas.append(((t2 - t1) - (t1 - t0)) / (ITERS_HI - ITERS_LO))
    dt = float(np.median(deltas))
    return batch / dt, dt


def bench_model(model_fn, logits_width, batch, hw, chans, backend):
    from mandheling_tpu.data import onehot_padded
    from mandheling_tpu.ops.kernels import use_backend
    from mandheling_tpu.train import make_train_step

    model = model_fn()
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (batch, hw, hw, chans)), jnp.float32)
    oh = jnp.asarray(onehot_padded(rng.integers(0, 10, batch), 10, logits_width))
    with use_backend(backend):
        step = make_train_step(model)
        sps, dt = device_loop_sps(lambda p: step(p, x, oh), params, batch)
    return sps, dt


def main():
    from mandheling_tpu.models import lenet_niti
    from mandheling_tpu.models.mobilenet import mobilenet_v2_niti
    from mandheling_tpu.models.resnet import resnet18_niti

    cases = [
        ("lenet_b2048", lambda: lenet_niti(), 12, 2048, 28, 1),
        ("mobilenet_v2_niti_b256", lambda: mobilenet_v2_niti(), 12, 256, 32, 3),
        ("resnet18_niti_b256", lambda: resnet18_niti(), 12, 256, 32, 3),
    ]
    out = []
    for name, fn, lw, b, hw, ch, in cases:
        for backend in ("xla", "pallas"):
            try:
                sps, dt = bench_model(fn, lw, b, hw, ch, backend)
                row = {"case": name, "backend": backend,
                       "samples_per_sec": round(sps, 1),
                       "ms_per_step": round(dt * 1e3, 3)}
            except Exception as e:  # record, keep going
                row = {"case": name, "backend": backend,
                       "error": f"{type(e).__name__}: {e}"[:200]}
            print(json.dumps(row), flush=True)
            out.append(row)
    with open("/tmp/backend_compare.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
