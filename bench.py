"""Benchmark: NITI int8 MNIST training throughput (samples/sec/chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference publishes no training throughput (BASELINE.md) — its
loops print only wall time per iteration on a phone. vs_baseline is therefore
measured against this repo's recorded fp32 LeNet training throughput on the
same chip (the reference's own MnistTrain-vs-NITIInt8Train comparison axis):
vs_baseline = int8_samples_per_sec / fp32_samples_per_sec.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


BATCH = 512  # MXU-friendly batch; reference uses 64 on the phone
WARMUP = 3
ITERS = 30


def bench_niti_int8():
    from mandheling_tpu.data import onehot_padded
    from mandheling_tpu.models import NITI_LOGIT_CHANNELS, lenet_niti
    from mandheling_tpu.train import make_train_step

    model = lenet_niti()
    params = model.init(jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(model), donate_argnums=(0,))

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (BATCH, 28, 28, 1)), jnp.float32)
    oh = jnp.asarray(onehot_padded(rng.integers(0, 10, BATCH), 10, NITI_LOGIT_CHANNELS))

    for _ in range(WARMUP):
        params, loss = step(params, x, oh)
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        params, loss = step(params, x, oh)
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0
    return BATCH * ITERS / dt


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

    @jax.jit
    def step(p, v, x, onehot):
        loss, g = jax.value_and_grad(loss_fn)(p, x, onehot)
        p, v = sgd_update(p, g, v, 0.01)
        return p, v, loss

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (BATCH, 28, 28, 1)), jnp.float32)
    oh = jnp.asarray(
        onehot_padded(rng.integers(0, 10, BATCH), 10, 10).astype(np.float32)
    )
    for _ in range(WARMUP):
        params, velocity, loss = step(params, velocity, x, oh)
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        params, velocity, loss = step(params, velocity, x, oh)
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0
    return BATCH * ITERS / dt


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
