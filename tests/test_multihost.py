"""Multi-host data parallelism: 2 processes x 4 devices must train
bit-identically to single-process 8-device DP (which in turn is
bit-identical to single-chip — tests/test_parallel.py).

This is the TPU-native scaling axis SURVEY section 7 step 4 / BASELINE.md
prescribe; the reference has no distributed anything (SURVEY section 2.10),
so the invariant is defined against our own single-process DP.
"""

import json
import os
import subprocess
import sys
import socket

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mandheling_tpu.data import onehot_padded
from mandheling_tpu.models import NITI_LOGIT_CHANNELS, lenet_niti
from mandheling_tpu.parallel import data_mesh, make_dp_train_step, replicate, shard_batch

STEPS = 3


def _reference_single_process(armode="int32"):
    """8-device single-process DP, same data protocol as the worker.
    Restores the global allreduce mode on exit (leaking "int8" made the
    later TP bit-identity tests fail in full-suite order — r3)."""
    from mandheling_tpu.ops import allreduce

    with allreduce.use_grad_allreduce(armode):
        return _reference_single_process_inner()


def _reference_single_process_inner():
    mesh = data_mesh(8)
    model = lenet_niti()
    params = replicate(mesh, model.init(jax.random.PRNGKey(0)))
    step = make_dp_train_step(model, mesh, donate=False)
    rng = np.random.default_rng(0)
    losses = []
    for _ in range(STEPS):
        x = rng.normal(0, 1, (16, 28, 28, 1)).astype(np.float32)
        y = rng.integers(0, 10, 16)
        oh = onehot_padded(y, 10, NITI_LOGIT_CHANNELS)
        gx, goh = shard_batch(mesh, jnp.asarray(x), jnp.asarray(oh))
        params, loss = step(params, gx, goh)
        losses.append(float(loss))
    return [np.asarray(l) for l in jax.tree.leaves(params)], losses


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.multihost
@pytest.mark.slow
def test_two_process_dp_bit_identical_to_single_process(tmp_path):
    port = _free_port()
    out = str(tmp_path / "mh_params.npz")
    workers = []
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    script = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    for pid in range(2):
        workers.append(
            subprocess.Popen(
                [sys.executable, script, str(port), str(pid), "2", "4",
                 str(STEPS), out],
                env={**env, "PYTHONPATH": ""},
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
            )
        )
    logs = []
    for w in workers:
        stdout, _ = w.communicate(timeout=300)
        logs.append(stdout.decode(errors="replace"))
    assert all(w.returncode == 0 for w in workers), "\n".join(logs)

    ref_leaves, ref_losses = _reference_single_process()
    with np.load(out) as z:
        mh_leaves = [z[k] for k in z.files]
    mh_losses = json.load(open(out + ".losses.json"))

    assert mh_losses == ref_losses
    assert len(mh_leaves) == len(ref_leaves)
    for a, b in zip(mh_leaves, ref_leaves):
        np.testing.assert_array_equal(a, b)


@pytest.mark.multihost
@pytest.mark.slow
def test_two_process_dp_int8_allreduce_bit_identical(tmp_path):
    """Multi-host DP composed with the 1-byte-per-element int8 gradient
    allreduce (ops/allreduce.py): the exponent-aligned int8 psum is exact
    integer addition, so 2 processes x 4 devices must still be
    bit-identical to the single-process 8-device run in the SAME mode."""
    port = _free_port()
    out = str(tmp_path / "mh_params_int8.npz")
    workers = []
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    script = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    for pid in range(2):
        workers.append(
            subprocess.Popen(
                [sys.executable, script, str(port), str(pid), "2", "4",
                 str(STEPS), out, "int8"],
                env={**env, "PYTHONPATH": ""},
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
            )
        )
    logs = []
    for w in workers:
        stdout, _ = w.communicate(timeout=300)
        logs.append(stdout.decode(errors="replace"))
    assert all(w.returncode == 0 for w in workers), "\n".join(logs)

    ref_leaves, ref_losses = _reference_single_process("int8")
    with np.load(out) as z:
        mh_leaves = [z[k] for k in z.files]
    mh_losses = json.load(open(out + ".losses.json"))

    assert mh_losses == ref_losses
    for a, b in zip(mh_leaves, ref_leaves):
        np.testing.assert_array_equal(a, b)
