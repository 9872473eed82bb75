"""Quantify microbatched GPipe numerics: LeNet on real data, single-chip
vs GPipe M=1 vs GPipe M=4 (>= 10 epochs), recording per-epoch loss and
final test accuracy — the accuracy validation of the reference's
split-batch gradient strategy that this pipeline generalizes
(`NITI_DSPGradientSplitBatchConv_Int8.cpp`, selection
`grad/NITI_DSPConv_Int8_Grad.cpp:178-186`; its contract was validated by
the reference's MNIST runs).

M=1 is bit-identical to single-chip (tests/test_pp.py asserts it); M>1
changes the forward/input-grad range estimates to per-microbatch while
filter gradients remain exact full-batch int32 sums — this artifact
measures what that costs in training quality.

Runs on the virtual 8-device CPU mesh:
    PYTHONPATH= JAX_PLATFORMS=cpu python tools/pp_bench.py --epochs 10
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"  # CPU mesh harness, never the TPU relay
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax
import jax.numpy as jnp
import numpy as np

from mandheling_tpu.utils import compile_cache

compile_cache.enable()

from tools.accuracy_bench import load_dataset  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default=os.environ.get("MNIST_ROOT", "mnist"))
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--stages", type=int, default=4)
    ap.add_argument("--out", default="PP_QUANT_r03.json")
    args = ap.parse_args()

    from mandheling_tpu.data import onehot_padded
    from mandheling_tpu.models import NITI_LOGIT_CHANNELS, lenet_niti
    from mandheling_tpu.parallel.pp import pipe_mesh, quantize_microbatches
    from mandheling_tpu.parallel.pp_general import (
        GPipePlan,
        make_gpipe_train_step,
        shard_packed_params,
    )
    from mandheling_tpu.train import make_eval_step, make_train_step

    name, (xtr, ytr), (xte, yte) = load_dataset(args.root)
    print(f"dataset: {name}  train={len(xtr)} test={len(xte)}")
    B = args.batch
    n_steps = len(xtr) // B

    model = lenet_niti()
    params0 = model.init(jax.random.PRNGKey(0))
    eval_step = jax.jit(make_eval_step(model))

    def normalize(xb):
        return jnp.asarray(xb.astype(np.float32))

    def evaluate(params):
        correct = 0
        eb = 179  # divides the sklearn digits test set (360 = 2*179 + rem)
        n = 0
        for i in range(0, len(xte) - eb + 1, eb):
            xb = normalize(xte[i : i + eb])
            correct += int(eval_step(params, xb,
                                     jnp.asarray(yte[i : i + eb])))
            n += eb
        return correct / n

    def run_single():
        step = jax.jit(make_train_step(model))
        params = params0
        losses = []
        for ep in range(args.epochs):
            rng = np.random.default_rng(ep)
            order = rng.permutation(len(xtr))
            ep_loss = []
            for s in range(n_steps):
                idx = order[s * B : (s + 1) * B]
                oh = jnp.asarray(onehot_padded(ytr[idx], 10,
                                               NITI_LOGIT_CHANNELS))
                params, loss = step(params, normalize(xtr[idx]), oh)
                ep_loss.append(float(loss))
            losses.append(round(float(np.mean(ep_loss)), 4))
            print(f"[single] epoch {ep}: loss {losses[-1]}")
        return params, losses

    def run_gpipe(M):
        mesh = pipe_mesh(n_stages=args.stages)
        plan = GPipePlan(model, params0, (B // M, 28, 28, 1),
                         n_stages=args.stages)
        gstep = make_gpipe_train_step(plan, mesh, n_microbatches=M,
                                      donate=False)
        packed = shard_packed_params(mesh, plan.pack_params(params0))
        losses = []
        for ep in range(args.epochs):
            rng = np.random.default_rng(ep)
            order = rng.permutation(len(xtr))
            ep_loss = []
            for s in range(n_steps):
                idx = order[s * B : (s + 1) * B]
                oh = jnp.asarray(onehot_padded(
                    ytr[idx], 10, NITI_LOGIT_CHANNELS)).reshape(
                        M, B // M, NITI_LOGIT_CHANNELS)
                x_d, x_e = quantize_microbatches(normalize(xtr[idx]), M)
                packed, loss = gstep(packed, x_d, x_e, oh)
                ep_loss.append(float(loss))
            losses.append(round(float(np.mean(ep_loss)), 4))
            print(f"[gpipe M={M}] epoch {ep}: loss {losses[-1]}")
        params = plan.unpack_params(tuple(np.asarray(b) for b in packed))
        return params, losses

    p_single, l_single = run_single()
    acc_single = evaluate(p_single)
    p_m1, l_m1 = run_gpipe(1)
    acc_m1 = evaluate(p_m1)
    p_m4, l_m4 = run_gpipe(4)
    acc_m4 = evaluate(p_m4)

    artifact = {
        "dataset": name,
        "protocol": (f"LeNet-NITI batch {B}, {args.epochs} epochs, "
                     f"{args.stages} pipeline stages; per-epoch mean loss "
                     "+ final test accuracy; M=1 bit-identity also gated "
                     "by tests/test_pp.py"),
        "losses": {"single_chip": l_single, "gpipe_m1": l_m1,
                   "gpipe_m4": l_m4},
        "final_test_accuracy": {
            "single_chip": round(acc_single, 4),
            "gpipe_m1": round(acc_m1, 4),
            "gpipe_m4": round(acc_m4, 4),
        },
        "m1_bit_identical_to_single": bool(
            all(np.array_equal(np.asarray(a["w"].data), np.asarray(b["w"].data))
                for a, b in zip(p_single, p_m1) if a)
        ),
        "m4_accuracy_delta_vs_single": round(acc_m4 - acc_single, 4),
        "m4_final_loss_delta_vs_single": round(l_m4[-1] - l_single[-1], 4),
    }
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps({k: v for k, v in artifact.items() if k != "losses"},
                     indent=1))


if __name__ == "__main__":
    main()
