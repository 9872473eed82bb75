"""Benchmark: NITI int8 training throughput (samples/sec/chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...} and
writes BENCH_DETAIL_r05.json with every case: LeNet b2048 plus CIFAR-scale
MobileNetV2/ResNet18 int8 throughput AND their fp32 train-step
counterparts (the reference's own MnistTrain-vs-NITIInt8Train comparison
axis, demo/MnistUtils.cpp:35,338, extended to the model zoo per the r2
verdict), plus per-case int8-vs-fp32 speedups.

Measurement: the step loop runs INSIDE one jitted program (lax.fori_loop
with params as carry) and the summed loss is read back to the host — pure
device time, immune to async-dispatch artifacts (on this setup
block_until_ready can return before remote execution finishes, inflating
naive timings ~40x).

Baseline: the reference publishes no training throughput (BASELINE.md) —
its loops only print per-iteration wall time on a phone. vs_baseline is
the int8-vs-fp32 train-step speedup on the same chip (the reference's own
MnistTrain-vs-NITIInt8Train comparison axis), reported as the GEOMEAN
over the model zoo {LeNet b2048, MobileNetV2 b256, ResNet18 b256} — r4
change, per the r3 verdict ("make the driver's number reflect the real
story"): the single-model LeNet ratio is still printed as
`lenet_int8_vs_fp32`, and r1-r3 rounds' vs_baseline (1.152/1.135/1.135)
are LeNet-only numbers. If any zoo case fails, vs_baseline falls back to
the LeNet-only ratio and says so in `vs_baseline_def`.

Budget: every jitted program goes through the persistent compile cache
(<repo>/.jax_cache, shared across processes); a warm cache turns the
multi-minute relay compiles into sub-second loads so all six rows + the
headline fit the driver's window (the r3 driver refresh skipped both
ResNet18 rows on time budget). Cold-cache runs degrade gracefully: cases
are ordered headline-first and a case that would exceed the budget is
recorded as skipped rather than aborting the line.

Backend selection: the kernel backend per case comes from _BACKEND_CHOICE,
set from measured TPU comparisons (tools/probes/backend_compare.py /
fused_shape_probe.py; see BENCH_DETAIL notes). Override with
BENCH_BACKEND=pallas|xla to force one. The requant accumulator policy is
the measured "auto" default (ops/conv.py, r4)."""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from mandheling_tpu.utils import compile_cache

compile_cache.enable()

BATCH = 2048
ITERS_LO = 10
ITERS_HI = 210
ROUNDS = 3
# leave headroom under the driver's timeout (env-overridable: relay
# compile times vary minutes-per-program when the cache misses)
TIME_BUDGET_S = int(os.environ.get("BENCH_TIME_BUDGET_S", "780"))

# measured on TPU v5e (r2 tools/probes/backend_compare.py + r3 dw
# probes, hoist-proof loop-carried timing): XLA wins every
# model-zoo train step — r3 numbers: lenet b2048 1.60M samples/s,
# mobilenet_v2 b256 21.1k (2.2x r2 after the taps/bgc-fgrad formulation
# fixes), resnet18 b256 36.8k; every hand Pallas kernel generation loses
# (see README kernel finding — the exact-NITI requant's two-pass ceiling).
# The Pallas paths are the SIMU/parity layer; per-shape flips go here if
# that ever changes.
_BACKEND_CHOICE = {
    "lenet": os.environ.get("BENCH_BACKEND", "xla"),
    "mobilenet_v2": os.environ.get("BENCH_BACKEND", "xla"),
    "resnet18": os.environ.get("BENCH_BACKEND", "xla"),
}


def _device_loop_sps(step_fn, init_state, batch, iters_lo=None, iters_hi=None):
    """samples/s of `state, loss = step_fn(state)` looped on device.

    The axon relay adds a large, *noisy* fixed cost per dispatch, so the
    per-iteration time is the difference between a long and a short loop,
    measured over several rounds with the median taken (single-round
    differential timing was observed to go negative under relay jitter).

    `iters` is a *traced* loop bound: lo and hi share ONE compiled
    executable (relay compiles are minutes; halving the compile count
    matters more than any static-unroll gain, and XLA does not unroll
    static fori_loops anyway)."""

    @jax.jit
    def run(state, iters):
        def body(i, carry):
            state, acc = carry
            state, loss = step_fn(state)
            return (state, acc + loss)

        _, acc = jax.lax.fori_loop(0, iters, body, (state, jnp.float32(0)))
        return acc

    iters_lo = jnp.int32(iters_lo or ITERS_LO)
    iters_hi = jnp.int32(iters_hi or ITERS_HI)
    np.asarray(run(init_state, iters_lo))  # compile + warm
    np.asarray(run(init_state, iters_hi))
    deltas = []
    for _ in range(ROUNDS):
        t0 = time.perf_counter()
        np.asarray(run(init_state, iters_lo))  # forced scalar readbacks
        t1 = time.perf_counter()
        np.asarray(run(init_state, iters_hi))
        t2 = time.perf_counter()
        deltas.append(((t2 - t1) - (t1 - t0)) / int(iters_hi - iters_lo))
    dt = float(np.median(deltas))
    return batch / dt


def bench_niti_int8():
    from mandheling_tpu.data import onehot_padded
    from mandheling_tpu.models import NITI_LOGIT_CHANNELS, lenet_niti
    from mandheling_tpu.ops.kernels import use_backend
    from mandheling_tpu.train import make_train_step

    model = lenet_niti()
    params = model.init(jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (BATCH, 28, 28, 1)), jnp.float32)
    oh = jnp.asarray(onehot_padded(rng.integers(0, 10, BATCH), 10, NITI_LOGIT_CHANNELS))

    with use_backend(_BACKEND_CHOICE["lenet"]):
        step = make_train_step(model)
        return _device_loop_sps(lambda p: step(p, x, oh), params, BATCH)


def bench_fp32():
    from mandheling_tpu.data import onehot_padded
    from mandheling_tpu.models import LeNetFP32
    from mandheling_tpu.train.optim import sgd_init, sgd_update

    model = LeNetFP32()
    params = model.init(jax.random.PRNGKey(0))
    velocity = sgd_init(params)

    def loss_fn(p, x, onehot):
        logits = model.apply(p, x)
        return -jnp.mean(jnp.sum(jax.nn.log_softmax(logits) * onehot, axis=-1))

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (BATCH, 28, 28, 1)), jnp.float32)
    oh = jnp.asarray(
        onehot_padded(rng.integers(0, 10, BATCH), 10, 10).astype(np.float32)
    )

    def step(state):
        p, v = state
        loss, g = jax.value_and_grad(loss_fn)(p, x, oh)
        p, v = sgd_update(p, g, v, 0.01)
        return (p, v), loss

    return _device_loop_sps(step, (params, velocity), BATCH)


def bench_cifar_model(name, batch=256):
    from mandheling_tpu.data import onehot_padded
    from mandheling_tpu.ops.kernels import use_backend
    from mandheling_tpu.train import make_train_step

    if name == "mobilenet_v2":
        from mandheling_tpu.models.mobilenet import mobilenet_v2_niti

        model = mobilenet_v2_niti()
    else:
        from mandheling_tpu.models.resnet import resnet18_niti

        model = resnet18_niti()
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (batch, 32, 32, 3)), jnp.float32)
    oh = jnp.asarray(onehot_padded(rng.integers(0, 10, batch), 10, 12))
    with use_backend(_BACKEND_CHOICE[name]):
        step = make_train_step(model)
        return _device_loop_sps(
            lambda p: step(p, x, oh), params, batch, iters_lo=5, iters_hi=45
        )


def bench_cifar_fp32(name, batch=256):
    """fp32 train-step counterpart (conv+BN model, SGD momentum) for the
    int8-vs-fp32 speedup at model scale."""
    from mandheling_tpu.train.optim import sgd_init, sgd_update

    if name == "mobilenet_v2":
        from mandheling_tpu.models.mobilenet_fp32 import MobileNetV2FP32

        model = MobileNetV2FP32(num_classes=10)
    else:
        from mandheling_tpu.models.resnet_fp32 import ResNet18FP32

        model = ResNet18FP32(num_classes=10)
    params = model.init(jax.random.PRNGKey(0))
    velocity = sgd_init(params)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (batch, 32, 32, 3)), jnp.float32)
    y = rng.integers(0, 10, batch)
    oh = jnp.zeros((batch, 10), jnp.float32).at[jnp.arange(batch), y].set(1.0)

    def loss_fn(p):
        logits, new_p = model.apply(p, x, training=True)
        loss = -jnp.mean(jnp.sum(jax.nn.log_softmax(logits) * oh, axis=-1))
        return loss, new_p

    def step(state):
        p, v = state
        (loss, new_p), g = jax.value_and_grad(loss_fn, has_aux=True)(p)
        p2, v = sgd_update(p, g, v, 0.01)
        # BN running stats come from the forward pass, not the SGD update
        p2 = jax.tree_util.tree_map_with_path(
            lambda path, a, b: b
            if getattr(path[-1], "key", None) in ("mean", "var") else a,
            p2, new_p,
        )
        return (p2, v), loss

    return _device_loop_sps(step, (params, velocity), batch,
                            iters_lo=5, iters_hi=45)


def main():
    t_start = time.time()
    detail = {"cases": [], "backend_choice": dict(_BACKEND_CHOICE)}

    int8_sps = bench_niti_int8()
    detail["cases"].append(
        {"case": "lenet_niti_int8_b2048", "samples_per_sec": round(int8_sps, 1),
         "backend": _BACKEND_CHOICE["lenet"]}
    )
    fp32_sps = bench_fp32()
    detail["cases"].append(
        {"case": "lenet_fp32_b2048", "samples_per_sec": round(fp32_sps, 1)}
    )
    # Safety line: if the driver's timeout kills the model-zoo cases below
    # (relay compiles can cost minutes each on a cold cache), the tail
    # still carries a valid headline. Distinct metric NAME (`_partial`
    # suffix, r4 advisor finding) so a parser that grabs the first
    # matching line never records the LeNet-only ratio as the zoo geomean.
    print(
        json.dumps(
            {
                "metric": "niti_int8_mnist_train_samples_per_sec_per_chip"
                          "_partial",
                "value": round(int8_sps, 1),
                "unit": "samples/s",
                "vs_baseline": round(int8_sps / fp32_sps, 3),
                "vs_baseline_def": "lenet-only (partial-run safety line; "
                                   "superseded by the final line below "
                                   "when present)",
            }
        ),
        flush=True,
    )

    # CIFAR-scale models + fp32 counterparts, budget-permitting
    sps_by_case = {}
    for name in ("mobilenet_v2", "resnet18"):
        for kind in ("int8", "fp32"):
            case = (f"{name}_niti_int8_b256" if kind == "int8"
                    else f"{name}_fp32_b256")
            if time.time() - t_start > TIME_BUDGET_S - 120:
                detail["cases"].append({"case": case,
                                        "skipped": "time budget"})
                continue
            try:
                if kind == "int8":
                    sps = bench_cifar_model(name)
                    row = {"case": case, "samples_per_sec": round(sps, 1),
                           "backend": _BACKEND_CHOICE[name]}
                else:
                    sps = bench_cifar_fp32(name)
                    row = {"case": case, "samples_per_sec": round(sps, 1)}
                sps_by_case[case] = sps
                detail["cases"].append(row)
            except Exception as e:
                detail["cases"].append(
                    {"case": case,
                     "error": f"{type(e).__name__}: {e}"[:160]}
                )

    ratios = {"lenet": int8_sps / fp32_sps}
    for name in ("mobilenet_v2", "resnet18"):
        i8 = sps_by_case.get(f"{name}_niti_int8_b256")
        f32 = sps_by_case.get(f"{name}_fp32_b256")
        if i8 and f32:
            ratios[name] = i8 / f32
    detail["int8_vs_fp32"] = {k: round(v, 3) for k, v in ratios.items()}

    if len(ratios) == 3:
        vs_baseline = float(np.prod(list(ratios.values())) ** (1 / 3))
        vs_def = ("geomean int8/fp32 train-step speedup over "
                  "{lenet b2048, mobilenet_v2 b256, resnet18 b256}")
    else:
        vs_baseline = ratios["lenet"]
        vs_def = ("lenet-only int8/fp32 speedup (zoo cases incomplete: "
                  + ",".join(sorted(set(("mobilenet_v2", "resnet18"))
                                    - set(ratios))) + ")")
    detail["vs_baseline_def"] = vs_def

    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_DETAIL_r05.json"), "w") as f:
            json.dump(detail, f, indent=1)
    except OSError:
        pass

    print(
        json.dumps(
            {
                "metric": "niti_int8_mnist_train_samples_per_sec_per_chip",
                "value": round(int8_sps, 1),
                "unit": "samples/s",
                "vs_baseline": round(vs_baseline, 3),
                "vs_baseline_def": vs_def,
                "lenet_int8_vs_fp32": round(ratios["lenet"], 3),
                "mobilenet_v2_int8_vs_fp32": round(
                    ratios.get("mobilenet_v2", 0), 3) or None,
                "resnet18_int8_vs_fp32": round(
                    ratios.get("resnet18", 0), 3) or None,
            }
        )
    )


if __name__ == "__main__":
    main()
