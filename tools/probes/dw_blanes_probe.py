#!/usr/bin/env python
"""Batch-on-lanes Pallas depthwise kernel vs the XLA taps formulation:
isolated model-zoo shapes + the whole MNv2 b256 train step, hoist-proof
dep-threaded device timing. Decides the default _DW_IMPL routing.

Run on TPU: python tools/probes/dw_blanes_probe.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp
import numpy as np

from mandheling_tpu.utils import compile_cache

compile_cache.enable()

from mandheling_tpu.ops import depthwise as dw_ops

LO, HI, ROUNDS = 5, 55, 3


def dev_time(fn):
    @jax.jit
    def run(iters):
        def body(i, carry):
            dep, acc = carry
            out = fn(dep)
            y = out[0] if isinstance(out, tuple) else out
            return ((y.ravel()[0] & 1).astype(jnp.int8),
                    acc + jnp.sum(y, dtype=jnp.int32))

        _, acc = jax.lax.fori_loop(
            0, iters, body, (jnp.zeros((), jnp.int8), jnp.int32(0)))
        return acc

    lo, hi = jnp.int32(LO), jnp.int32(HI)
    np.asarray(run(lo)); np.asarray(run(hi))
    deltas = []
    for _ in range(ROUNDS):
        t0 = time.perf_counter(); np.asarray(run(lo))
        t1 = time.perf_counter(); np.asarray(run(hi))
        t2 = time.perf_counter()
        deltas.append(((t2 - t1) - (t1 - t0)) / (HI - LO))
    return float(np.median(deltas))


def main():
    rng = np.random.default_rng(0)
    e = jnp.int32(-5)
    B = 256
    shapes = [(32, 144), (16, 192), (8, 384), (8, 576), (4, 960)]
    for hw, c in shapes:
        x = jnp.asarray(rng.integers(-30, 30, (B, hw, hw, c)).astype(np.int8))
        w = jnp.asarray(rng.integers(-30, 30, (3, 3, 1, c)).astype(np.int8))
        for impl in ("taps", "pallas"):
            dw_ops.set_dw_impl(impl)
            name = f"dw fwd {hw}x{hw}x{c} {impl}"
            try:
                ms = dev_time(lambda d, x=x, w=w: dw_ops.dwconv2d_forward(
                    x + d, e, w, e, (1, 1), "SAME")) * 1e3
                print(json.dumps({"op": name, "ms": round(ms, 4)}),
                      flush=True)
            except Exception as ex:
                print(json.dumps({"op": name,
                                  "error": f"{type(ex).__name__}: {ex}"[:140]}),
                      flush=True)
    dw_ops.set_dw_impl("taps")

    # whole MNv2 train step per impl
    from mandheling_tpu.data import onehot_padded
    from mandheling_tpu.models.mobilenet import mobilenet_v2_niti
    from mandheling_tpu.train import make_train_step

    model = mobilenet_v2_niti()
    params = model.init(jax.random.PRNGKey(0))
    xf = jnp.asarray(rng.normal(0, 1, (B, 32, 32, 3)), jnp.float32)
    oh = jnp.asarray(onehot_padded(rng.integers(0, 10, B), 10, 12))
    for impl in ("taps", "pallas"):
        dw_ops.set_dw_impl(impl)
        step = make_train_step(model)

        @jax.jit
        def run(p, iters):
            def body(i, carry):
                p, acc = carry
                p, loss = step(p, xf, oh)
                return (p, acc + loss)

            _, acc = jax.lax.fori_loop(0, iters, body, (p, jnp.float32(0)))
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
        print(json.dumps({"op": f"mnv2 b256 step {impl}",
                          "ms": round(dt * 1e3, 3),
                          "samples_per_sec": round(B / dt, 1)}), flush=True)
    dw_ops.set_dw_impl("taps")


if __name__ == "__main__":
    main()
