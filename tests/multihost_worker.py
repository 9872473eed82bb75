"""Worker process for the multi-host DP test (not a pytest file).

Usage: python multihost_worker.py <port> <process_id> <num_processes>
           <local_devices> <steps> <out_npz> [allreduce_mode]

Runs `steps` data-parallel NITI LeNet train steps over the global mesh on
deterministic data (same seed in every process; each process feeds only its
`local_batch_slice` rows) and, on process 0, dumps the final params leaves
+ per-step losses.
"""

import json
import os
import sys

port, pid, nproc, ndev, steps, out = sys.argv[1:7]
armode = sys.argv[7] if len(sys.argv) > 7 else "int32"

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={ndev}"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from mandheling_tpu.data import onehot_padded  # noqa: E402
from mandheling_tpu.models import NITI_LOGIT_CHANNELS, lenet_niti  # noqa: E402
from mandheling_tpu.parallel import distributed as dist  # noqa: E402
from mandheling_tpu.parallel.sharded_step import make_dp_train_step  # noqa: E402


def main():
    from mandheling_tpu.ops import allreduce

    dist.initialize(f"localhost:{port}", int(nproc), int(pid))
    allreduce.set_grad_allreduce(armode)
    assert jax.process_count() == int(nproc)
    mesh = dist.make_global_mesh()

    model = lenet_niti()
    params = dist.replicate_global(mesh, model.init(jax.random.PRNGKey(0)))
    step = make_dp_train_step(model, mesh, donate=False)

    rng = np.random.default_rng(0)
    batch = 16
    losses = []
    for _ in range(int(steps)):
        x = rng.normal(0, 1, (batch, 28, 28, 1)).astype(np.float32)
        y = rng.integers(0, 10, batch)
        oh = onehot_padded(y, 10, NITI_LOGIT_CHANNELS)
        lo, hi = dist.local_batch_slice(batch)
        gx, goh = dist.shard_host_batch(mesh, x[lo:hi], oh[lo:hi])
        params, loss = step(params, gx, goh)
        losses.append(float(loss))

    if jax.process_index() == 0:
        leaves = [np.asarray(l) for l in jax.tree.leaves(params)]
        np.savez(out, *leaves)
        with open(out + ".losses.json", "w") as f:
            json.dump(losses, f)


if __name__ == "__main__":
    main()
