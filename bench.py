"""Benchmark: NITI int8 MNIST training throughput (samples/sec/chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measurement: the step loop runs INSIDE one jitted program (lax.fori_loop
with params as carry) and the summed loss is read back to the host — pure
device time, immune to async-dispatch artifacts (on this setup
block_until_ready can return before remote execution finishes, inflating
naive timings ~40x).

Baseline: the reference publishes no training throughput (BASELINE.md) — its
loops only print per-iteration wall time on a phone. vs_baseline is the
int8-vs-fp32 speedup on the same chip (the reference's own
MnistTrain-vs-NITIInt8Train comparison axis):
vs_baseline = int8_samples_per_sec / fp32_samples_per_sec.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BATCH = 2048
ITERS_LO = 10
ITERS_HI = 210
ROUNDS = 3


def _device_loop_sps(step_fn, init_state, batch):
    """samples/s of `state, loss = step_fn(state)` looped on device.

    The axon relay adds a large, *noisy* fixed cost per dispatch, so the
    per-iteration time is the difference between a long and a short loop,
    measured over several rounds with the median taken (single-round
    differential timing was observed to go negative under relay jitter)."""
    import functools

    @functools.partial(jax.jit, static_argnums=1)
    def run(state, iters):
        def body(i, carry):
            state, acc = carry
            state, loss = step_fn(state)
            return (state, acc + loss)

        _, acc = jax.lax.fori_loop(0, iters, body, (state, jnp.float32(0)))
        return acc

    np.asarray(run(init_state, ITERS_LO))  # compile + warm
    np.asarray(run(init_state, ITERS_HI))
    deltas = []
    for _ in range(ROUNDS):
        t0 = time.perf_counter()
        np.asarray(run(init_state, ITERS_LO))  # forced scalar readbacks
        t1 = time.perf_counter()
        np.asarray(run(init_state, ITERS_HI))
        t2 = time.perf_counter()
        deltas.append(((t2 - t1) - (t1 - t0)) / (ITERS_HI - ITERS_LO))
    dt = float(np.median(deltas))
    return batch / dt


def bench_niti_int8():
    from mandheling_tpu.data import onehot_padded
    from mandheling_tpu.models import NITI_LOGIT_CHANNELS, lenet_niti
    from mandheling_tpu.train import make_train_step

    model = lenet_niti()
    params = model.init(jax.random.PRNGKey(0))
    step = make_train_step(model)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (BATCH, 28, 28, 1)), jnp.float32)
    oh = jnp.asarray(onehot_padded(rng.integers(0, 10, BATCH), 10, NITI_LOGIT_CHANNELS))

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


def main():
    int8_sps = bench_niti_int8()
    fp32_sps = bench_fp32()
    print(
        json.dumps(
            {
                "metric": "niti_int8_mnist_train_samples_per_sec_per_chip",
                "value": round(int8_sps, 1),
                "unit": "samples/s",
                "vs_baseline": round(int8_sps / fp32_sps, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
