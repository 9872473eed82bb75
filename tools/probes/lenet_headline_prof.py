"""Per-op profile of the actual bench.py headline programs (r4 task 1).

The driver headline (LeNet b2048, int8-vs-fp32) has been frozen at
~1.135x for three rounds (BENCH_r01..r03). This probe traces the same
device-side fori_loop programs bench.py times — `run(state, iters)` with
the step inlined in the loop body — for BOTH the NITI int8 and fp32
LeNet cases, and prints the per-HLO-category and top-op device-time
tables, so the ratio can be explained op-by-op (the reference's
MnistTrain-vs-NITIInt8Train axis, demo/MnistUtils.cpp:35,338).

Usage (TPU):  python tools/probes/lenet_headline_prof.py [--iters 50]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp
import numpy as np

BATCH = 2048


def int8_program():
    from mandheling_tpu.data import onehot_padded
    from mandheling_tpu.models import NITI_LOGIT_CHANNELS, lenet_niti
    from mandheling_tpu.train import make_train_step

    model = lenet_niti()
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (BATCH, 28, 28, 1)), jnp.float32)
    oh = jnp.asarray(
        onehot_padded(rng.integers(0, 10, BATCH), 10, NITI_LOGIT_CHANNELS))
    step = make_train_step(model)
    return lambda p: step(p, x, oh), params


def fp32_program():
    from mandheling_tpu.data import onehot_padded
    from mandheling_tpu.models import LeNetFP32
    from mandheling_tpu.train.optim import sgd_init, sgd_update

    model = LeNetFP32()
    params = model.init(jax.random.PRNGKey(0))
    velocity = sgd_init(params)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (BATCH, 28, 28, 1)), jnp.float32)
    oh = jnp.asarray(
        onehot_padded(rng.integers(0, 10, BATCH), 10, 10).astype(np.float32))

    def loss_fn(p):
        logits = model.apply(p, x)
        return -jnp.mean(jnp.sum(jax.nn.log_softmax(logits) * oh, axis=-1))

    def step(state):
        p, v = state
        loss, g = jax.value_and_grad(loss_fn)(p)
        p, v = sgd_update(p, g, v, 0.01)
        return (p, v), loss

    return step, (params, velocity)


def looped(step_fn):
    def run(state, iters):
        def body(i, carry):
            state, acc = carry
            state, loss = step_fn(state)
            return (state, acc + loss)

        _, acc = jax.lax.fori_loop(0, iters, body, (state, jnp.float32(0)))
        return acc

    return jax.jit(run)


def profile_case(name, step_fn, state, iters, out):
    import time

    from mandheling_tpu.utils import profiler, xplane

    run = looped(step_fn)
    it = jnp.int32(iters)
    np.asarray(run(state, it))  # compile + warm
    t0 = time.perf_counter()
    np.asarray(run(state, it))
    wall_ms = (time.perf_counter() - t0) / iters * 1e3
    rows, cats = profiler.per_op_profile(run, state, it, iters=1)
    dev_ms = sum(r["total_us"] for r in rows) / iters / 1e3
    print(f"\n==== {name}: wall {wall_ms:.3f} ms/step "
          f"({BATCH/wall_ms*1e3:,.0f} samples/s), device-sum "
          f"{dev_ms:.3f} ms/step over {iters} looped steps ====")
    print("-- per HLO category (totals over the loop) --")
    print(xplane.format_table(cats))
    print("-- top ops --")
    print(xplane.format_table(rows, top=20))
    out[name] = {
        "wall_ms_per_step": round(wall_ms, 4),
        "samples_per_sec": round(BATCH / wall_ms * 1e3, 1),
        "device_ms_per_step": round(dev_ms, 4),
        "cats": cats,
        "top_ops": rows[:20],
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--json", default="/tmp/lenet_headline_prof.json")
    args = ap.parse_args()

    from mandheling_tpu.utils import compile_cache

    compile_cache.enable()
    out = {"batch": BATCH, "iters": args.iters}
    fn, state = int8_program()
    profile_case("int8", fn, state, args.iters, out)
    fn, state = fp32_program()
    profile_case("fp32", fn, state, args.iters, out)
    r = out["fp32"]["wall_ms_per_step"] / out["int8"]["wall_ms_per_step"]
    print(f"\nint8-vs-fp32 wall speedup: {r:.3f}x")
    out["int8_vs_fp32_wall"] = round(r, 4)
    with open(args.json, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
