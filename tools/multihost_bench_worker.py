"""Timed worker for the multi-host scaling row (not a pytest file).

Usage: python multihost_bench_worker.py <port> <pid> <nproc> <local_devs>
           <per_dev_batch> <allreduce_mode> <out_json>

Each process joins the jax.distributed cluster, runs the DP NITI LeNet
train step over the global mesh (per-host data slices through
parallel/distributed.py), and times it with the LO/HI differential loop.
Process 0 writes {"samples_per_sec": ...} to out_json.
"""

import json
import os
import sys
import time

port, pid, nproc, ndev, pdb_, armode, out = sys.argv[1:8]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={ndev}"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from mandheling_tpu.data import onehot_padded  # noqa: E402
from mandheling_tpu.models import NITI_LOGIT_CHANNELS, lenet_niti  # noqa: E402
from mandheling_tpu.ops import allreduce  # noqa: E402
from mandheling_tpu.parallel import distributed as dist  # noqa: E402
from mandheling_tpu.parallel.sharded_step import make_dp_train_step  # noqa: E402

LO, HI = 2, 12


def main():
    dist.initialize(f"localhost:{port}", int(nproc), int(pid))
    mesh = dist.make_global_mesh()
    allreduce.set_grad_allreduce(armode)

    model = lenet_niti()
    params = dist.replicate_global(mesh, model.init(jax.random.PRNGKey(0)))
    step = make_dp_train_step(model, mesh, donate=False)

    batch = int(pdb_) * jax.device_count()
    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (batch, 28, 28, 1)).astype(np.float32)
    oh = onehot_padded(rng.integers(0, 10, batch), 10, NITI_LOGIT_CHANNELS)
    lo, hi = dist.local_batch_slice(batch)
    gx, goh = dist.shard_host_batch(mesh, x[lo:hi], oh[lo:hi])

    def run(iters):
        p = params
        for _ in range(iters):
            p, loss = step(p, gx, goh)
        jax.block_until_ready(loss)

    run(LO)
    t0 = time.perf_counter(); run(LO)
    t1 = time.perf_counter(); run(HI)
    t2 = time.perf_counter()
    dt = ((t2 - t1) - (t1 - t0)) / (HI - LO)

    if jax.process_index() == 0:
        with open(out, "w") as f:
            json.dump({"samples_per_sec": batch / dt,
                       "allreduce": armode}, f)


if __name__ == "__main__":
    main()
