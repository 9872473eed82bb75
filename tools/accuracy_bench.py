#!/usr/bin/env python
"""Accuracy-parity artifact: NITI int8 training vs the fp32 baseline on a
REAL handwritten-digit dataset, 50 epochs, batch 64 — the reference's own
functional baseline protocol (`demo/MnistUtils.cpp:35-184`, BASELINE.md:
fp32 ~99%, NITI int8 ~98-99% within 50 epochs).

Dataset resolution order:
1. MNIST idx files under --root (train-images-idx3-ubyte etc.) — the exact
   reference dataset. This sandbox has no network egress; fetch with
   tools/fetch_mnist.py wherever egress exists.
2. sklearn's bundled digits dataset (1797 REAL handwritten 8x8 digit
   images, the UCI optdigits test set) upsampled 4x and cropped to 28x28 so
   the exact reference LeNet geometry applies. Documented in the artifact.

Writes ACCURACY_r02.json: per-epoch loss curves + final test accuracies for
both configs.

    python tools/accuracy_bench.py [--root mnist_dir] [--epochs 50]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from mandheling_tpu.utils import compile_cache

compile_cache.enable()


def load_dataset(root):
    from mandheling_tpu.data.mnist import load_mnist

    if root:
        try:
            (x, y), (xt, yt) = load_mnist(root)
            return "mnist", (x, y), (xt, yt)
        except (FileNotFoundError, OSError):
            print(f"(no MNIST idx files under {root!r})")
    from sklearn.datasets import load_digits

    d = load_digits()
    imgs = (d.images / 16.0 * 255.0).astype(np.uint8)  # (N, 8, 8) 0..255
    big = np.kron(imgs, np.ones((1, 4, 4), np.uint8))  # (N, 32, 32)
    big = big[:, 2:30, 2:30][..., None]  # (N, 28, 28, 1)
    rng = np.random.default_rng(0)
    idx = rng.permutation(len(big))
    big, y = big[idx], d.target[idx].astype(np.int64)
    n_tr = 1437
    return (
        "sklearn_digits_upsampled_28x28",
        (big[:n_tr], y[:n_tr]),
        (big[n_tr:], y[n_tr:]),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default=os.environ.get("MNIST_ROOT", "mnist"))
    ap.add_argument("--epochs", type=int, default=50)
    ap.add_argument("--out", default="ACCURACY_r02.json")
    args = ap.parse_args()

    name, train, test = load_dataset(args.root)
    print(f"dataset: {name}  train={len(train[0])} test={len(test[0])}")

    from mandheling_tpu.train.trainer import train_fp32, train_niti

    logs = {"int8": [], "fp32": []}

    def mk_log(key):
        def log(msg):
            print(f"[{key}] {msg}")
            logs[key].append(msg)
        return log

    _, acc_int8 = train_niti(train, test, epochs=args.epochs, batch=64,
                             seed=0, log=mk_log("int8"))
    _, acc_fp32 = train_fp32(train, test, epochs=args.epochs, batch=64,
                             seed=0, log=mk_log("fp32"))

    artifact = {
        "dataset": name,
        "protocol": "reference MnistUtils: batch 64, 50 epochs, "
                    "NITI_SGD (w-g) vs fp32 SGD momentum+inv-lr",
        "epochs": args.epochs,
        "final_test_accuracy": {"niti_int8": round(acc_int8, 4),
                                "fp32": round(acc_fp32, 4)},
        "gap": round(acc_fp32 - acc_int8, 4),
        "reference_expectation":
            "fp32 ~99%, NITI int8 ~98-99% on MNIST (BASELINE.md:21-23); "
            "no-egress sandbox substitutes the bundled real-handwritten "
            "sklearn digits set when MNIST idx files are absent",
        "log": logs,
    }
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps({k: v for k, v in artifact.items() if k != "log"},
                     indent=1))


if __name__ == "__main__":
    main()
