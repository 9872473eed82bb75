#!/usr/bin/env python
"""Component-level device timing of the NITI train step (TPU).

Times (device-side loop, dispatch-cost-cancelled like bench.py):
full int8 step (xla / pallas backends), int8 forward only, loss grad only,
backward only, and the fp32 step — to locate where the int8 path loses
against fp32.
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

BATCH = 2048
LO, HI = 5, 55


def device_ms(fn, *args):
    @functools.partial(jax.jit, static_argnums=0)
    def run(iters, *a):
        def body(i, carry):
            return fn(*a, carry)

        out = jax.lax.fori_loop(0, iters, body, jnp.float32(0))
        return out

    np.asarray(run(LO, *args))
    np.asarray(run(HI, *args))
    t0 = time.perf_counter()
    np.asarray(run(LO, *args))
    t1 = time.perf_counter()
    np.asarray(run(HI, *args))
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (HI - LO) * 1e3


def main():
    from mandheling_tpu.data import onehot_padded
    from mandheling_tpu.models import NITI_LOGIT_CHANNELS, lenet_niti
    from mandheling_tpu.ops.kernels import dispatch
    from mandheling_tpu.ops.loss import loss_grad_int8
    from mandheling_tpu.ops.qtensor import QTensor
    from mandheling_tpu.train.train_step import make_train_step, quantize_batch

    model = lenet_niti()
    params = model.init(jax.random.PRNGKey(0))
    step = make_train_step(model)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (BATCH, 28, 28, 1)), jnp.float32)
    oh = jnp.asarray(
        onehot_padded(rng.integers(0, 10, BATCH), 10, NITI_LOGIT_CHANNELS)
    )
    xd, xe = jax.jit(quantize_batch)(x)
    xd = jax.block_until_ready(xd)

    def full_step(p, x, oh, dep):
        newp, loss = step(p, x, oh)
        return loss + dep

    def fwd_only(p, xd, xe, dep):
        logits, _ = model.fwd(p, QTensor(xd + dep.astype(jnp.int8), xe))
        return jnp.float32(jnp.sum(logits.data.astype(jnp.int32)))

    def quant_only(x, dep):
        d, e = quantize_batch(x + dep)
        return jnp.float32(jnp.sum(d.astype(jnp.int32)) + e)

    logits8 = jnp.asarray(rng.integers(-127, 127, (BATCH, 12)), jnp.int8)

    def loss_only(l8, oh, dep):
        g = loss_grad_int8(l8 + dep.astype(jnp.int8), jnp.int32(-3), oh)
        return jnp.float32(jnp.sum(g.astype(jnp.int32)))

    for backend in ("xla", "pallas"):
        with dispatch.use_backend(backend):
            ms = device_ms(full_step, params, x, oh)
            print(f"full int8 step [{backend}]: {ms:.3f} ms "
                  f"({BATCH/ms*1000:.0f} samples/s)")
            msf = device_ms(fwd_only, params, xd, xe)
            print(f"  fwd only [{backend}]: {msf:.3f} ms")

    print(f"quantize_batch: {device_ms(quant_only, x):.3f} ms")
    print(f"loss_grad_int8: {device_ms(loss_only, logits8, oh):.3f} ms")

    # fp32 comparison
    from mandheling_tpu.models import LeNetFP32
    from mandheling_tpu.train.optim import sgd_init, sgd_update

    fmodel = LeNetFP32()
    fparams = fmodel.init(jax.random.PRNGKey(0))
    vel = sgd_init(fparams)
    ohf = oh[:, :10].astype(jnp.float32)

    def loss_fn(p, x, onehot):
        logits = fmodel.apply(p, x)
        return -jnp.mean(jnp.sum(jax.nn.log_softmax(logits) * onehot, axis=-1))

    def fp32_step(p, v, x, onehot, dep):
        loss, g = jax.value_and_grad(loss_fn)(p, x, onehot)
        p, v = sgd_update(p, g, v, 0.01)
        return loss + dep

    ms = device_ms(fp32_step, fparams, vel, x, ohf)
    print(f"fp32 step: {ms:.3f} ms ({BATCH/ms*1000:.0f} samples/s)")

    def fp32_fwd(p, x, dep):
        return jnp.sum(fmodel.apply(p, x + dep))

    print(f"fp32 fwd only: {device_ms(fp32_fwd, fparams, x):.3f} ms")


if __name__ == "__main__":
    main()
