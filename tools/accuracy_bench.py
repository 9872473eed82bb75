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

Writes the ACCURACY artifact: per-epoch loss curves + final test accuracies for
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
            x, y = load_mnist(root, train=True)
            xt, yt = load_mnist(root, train=False)
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


def load_cifar_or_fallback(root):
    """Real CIFAR-10 bins if present (tools/fetch_cifar.py), else the real
    digits set at CIFAR geometry (32x32x3: 2px pad + channel tile) — a
    documented no-egress substitute that exercises the exact CIFAR config
    (model geometry, loader, batch plan) on real labeled images."""
    from mandheling_tpu.data.cifar import load_cifar10

    try:
        xtr, ytr = load_cifar10(root, train=True)
        xte, yte = load_cifar10(root, train=False)
        return "cifar10", (xtr, ytr), (xte, yte)
    except (FileNotFoundError, OSError):
        pass
    _, (xtr, ytr), (xte, yte) = load_dataset(None)

    def to32x3(x):
        x = np.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)))
        return np.repeat(x, 3, axis=3)

    return ("digits_at_cifar_geometry_32x32x3",
            (to32x3(xtr), ytr), (to32x3(xte), yte))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default=os.environ.get("MNIST_ROOT", "mnist"))
    ap.add_argument("--cifar-root",
                    default=os.environ.get("CIFAR_ROOT", "cifar10"))
    ap.add_argument("--epochs", type=int, default=50)
    ap.add_argument("--cifar-epochs", type=int, default=15)
    ap.add_argument("--cifar-model", default="resnet18",
                    choices=["resnet18", "mobilenet_v2"])
    ap.add_argument("--seeds", type=int, nargs="*", default=[0, 1])
    ap.add_argument("--skip-cifar", action="store_true")
    ap.add_argument("--out", default="ACCURACY_r04.json")
    args = ap.parse_args()

    name, train, test = load_dataset(args.root)
    print(f"dataset: {name}  train={len(train[0])} test={len(test[0])}")

    from mandheling_tpu.train.trainer import train_fp32, train_niti

    logs = {}

    def mk_log(key):
        logs[key] = []

        def log(msg):
            print(f"[{key}] {msg}")
            logs[key].append(msg)
        return log

    digits = {"niti_int8": {}, "fp32": {}}
    for seed in args.seeds:
        _, acc_i = train_niti(train, test, epochs=args.epochs, batch=64,
                              seed=seed, log=mk_log(f"int8_s{seed}"))
        _, acc_f = train_fp32(train, test, epochs=args.epochs, batch=64,
                              seed=seed, log=mk_log(f"fp32_s{seed}"))
        digits["niti_int8"][f"seed{seed}"] = round(acc_i, 4)
        digits["fp32"][f"seed{seed}"] = round(acc_f, 4)

    artifact = {
        "digits": {
            "dataset": name,
            "protocol": "reference MnistUtils: batch 64, "
                        f"{args.epochs} epochs, NITI_SGD (w-g) vs fp32 SGD "
                        f"momentum+inv-lr; seeds {args.seeds}",
            "final_test_accuracy": digits,
            "max_gap": round(
                max(abs(digits["fp32"][k] - digits["niti_int8"][k])
                    for k in digits["fp32"]), 4),
        },
        "reference_expectation":
            "fp32 ~99%, NITI int8 ~98-99% on MNIST (BASELINE.md:21-23); "
            "no-egress sandbox substitutes the bundled real-handwritten "
            "sklearn digits set when MNIST idx files are absent "
            "(tools/fetch_mnist.py / fetch_cifar.py fetch the real sets "
            "where egress exists)",
    }

    if not args.skip_cifar:
        cname, ctrain, ctest = load_cifar_or_fallback(args.cifar_root)
        print(f"cifar config dataset: {cname}  train={len(ctrain[0])} "
              f"test={len(ctest[0])}")
        from mandheling_tpu.train.trainer import train_fp32_bn

        if args.cifar_model == "resnet18":
            from mandheling_tpu.models.resnet import resnet18_niti
            from mandheling_tpu.models.resnet_fp32 import ResNet18FP32

            nmodel, fmodel = resnet18_niti(), ResNet18FP32(num_classes=10)
        else:
            from mandheling_tpu.models import mobilenet_v2_niti
            from mandheling_tpu.models.mobilenet_fp32 import MobileNetV2FP32

            nmodel, fmodel = mobilenet_v2_niti(), MobileNetV2FP32(
                num_classes=10)
        _, acc_ci = train_niti(
            ctrain, ctest, epochs=args.cifar_epochs, batch=64, seed=0,
            model=nmodel, log=mk_log("cifar_int8"))
        _, acc_cf = train_fp32_bn(
            fmodel, ctrain, ctest,
            epochs=args.cifar_epochs, batch=64, seed=0,
            log=mk_log("cifar_fp32"))
        artifact["cifar_config"] = {
            "dataset": cname,
            "model": f"{args.cifar_model} (niti int8 vs fp32+BN)",
            "protocol": f"batch 64, {args.cifar_epochs} epochs, "
                        "reference MobilenetV2Utils::train shape "
                        "(demo/MobilenetV2Utils.cpp:34)",
            "final_test_accuracy": {"niti_int8": round(acc_ci, 4),
                                    "fp32": round(acc_cf, 4)},
            "gap": round(acc_cf - acc_ci, 4),
        }
        artifact["mnv2_niti_finding"] = {
            "summary": (
                "full-NITI MobileNet training: SOLVED for both families "
                "(r4 forward fixes + r5 update-magnitude fix; full study "
                "DIVERGENCE_r05.json, probes tools/probes/"
                "mnv2_bottleneck_probe.py / fp32_controls_probe.py / "
                "grad_direction_probe.py)."),
            "mechanism_1_fixed": (
                "forward exponent runaway: with unbounded relu, activation "
                "exponents inflate monotonically (to 2^25 by epoch 11; "
                "probe loss 5e7) while gradients stay tiny (max 4) — a "
                "forward requant feedback loop, not gradient blowup. FIXED "
                "by the reference architecture's ReLU6 "
                "(models/MobilenetV2.cpp:67) under the NITI contract "
                "(ops/relu.relu6): exponents stay <= 0 over 12 epochs."),
            "mechanism_2_depthwise": (
                "with the forward stabilized, MNv1/MNv2 still sat at "
                "chance accuracy across a dense x dw fgrad-margin grid "
                "({2,3,4} x {2,4,6}, 9 cells, 12 epochs each) while "
                "dense-conv NITI models learn (LeNet 0.99, ResNet18 0.97; "
                "logit scales measured comparable in learning and "
                "non-learning models) — isolating the blocker to "
                "depthwise-separable blocks under PER-TENSOR weight "
                "quantization. Per-channel dw weight exponents "
                "(dw_per_channel=True, ops/depthwise.py) make full-NITI "
                "MobileNetV1 LEARN: 0.097 (chance) -> 0.34 @15 epochs "
                "-> 0.966/0.978 @60 epochs (2 seeds, r5)."),
            "mechanism_3_update_magnitude_r5": (
                "MNv2's remaining blocker was the integer UPDATE "
                "magnitude, not forward precision: int16 projection "
                "outputs (requant SQNR 75-85 dB, out_bits=15) changed "
                "nothing; the fp32 from-scratch control learns 0.85/0.94 "
                "on the same data; and shrinking the filter-grad requant "
                "margins to 1/1 (updates ~+-1-2 instead of ~+-4) with "
                "per-channel dw takes integer-only MNv2 from chance to "
                "0.97-0.98 at 60 epochs — above fp32. Both ingredients "
                "necessary, neither sufficient (per-tensor at margin 0 "
                "stays at chance; per-channel at margin 2 stays at "
                "chance with rising loss). MNv1-pc at 60 epochs: "
                "0.966/0.978 (2 seeds) vs fp32 best 0.53/0.73. Full "
                "tables: DIVERGENCE_r05.json. The reference never "
                "trains any MobileNet integer-only "
                "(demo/MobilenetV2Utils.cpp is fp32/QAT-only)."),
        }

    artifact["log"] = logs
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps({k: v for k, v in artifact.items() if k != "log"},
                     indent=1))


if __name__ == "__main__":
    main()
