#!/usr/bin/env python
"""run_train_demo — the CLI demo registry.

TPU-native analog of the reference's `runTrainDemo.out` + DemoUnitSet
(`tools/train/source/demo/DemoUnit.hpp:40-98`, `demoMain.cpp:11`). Same
config names:

    python tools/run_train_demo.py MnistTrain        [mnist_root] [--epochs N]
    python tools/run_train_demo.py NITIInt8Train     [mnist_root] [--epochs N]
    python tools/run_train_demo.py NITIDSPInt8Train  [mnist_root] [--epochs N]
    python tools/run_train_demo.py MnistInt8Train    [mnist_root] [--epochs N]
    python tools/run_train_demo.py MnistTrainSnapshot [mnist_root]
    python tools/run_train_demo.py DistributedNITITrain [mnist_root]
    python tools/run_train_demo.py NnGradTest
    python tools/run_train_demo.py DataLoaderDemo    [mnist_root]
    python tools/run_train_demo.py LinearRegression

`NITIDSPInt8Train` runs the identical int8 graph through the Pallas MXU
kernels (the "offload everything to the accelerator" config); `NITIInt8Train`
uses the XLA lowering. Both are a single cached accelerator program per
iteration; numerics are bit-identical (tests/test_pallas_kernels.py).
Without an MNIST root on disk, a deterministic synthetic dataset is used.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEMOS = {}


def demo(name):
    def wrap(fn):
        DEMOS[name] = fn
        return fn

    return wrap


def _data(root, synth_n=8192):
    from mandheling_tpu.data import load_or_synthesize

    train = load_or_synthesize(root, train=True, synth_n=synth_n)
    test = load_or_synthesize(root, train=False, synth_n=synth_n)
    if not train[2]:
        print("(no MNIST idx files found — using synthetic dataset)")
    return (train[0], train[1]), (test[0], test[1])


@demo("MnistTrain")
def mnist_train(args):
    from mandheling_tpu.train.trainer import train_fp32

    train, test = _data(args.root)
    _, acc = train_fp32(train, test, epochs=args.epochs)
    print(f"final test accuracy: {acc:.4f}")


@demo("NITIInt8Train")
def niti_train(args):
    from mandheling_tpu.train.trainer import train_niti

    train, test = _data(args.root)
    _, acc = train_niti(train, test, epochs=args.epochs,
                        checkpoint_path=args.snapshot)
    print(f"final test accuracy: {acc:.4f}")


@demo("NITIDSPInt8Train")
def niti_dsp_train(args):
    from mandheling_tpu.ops.kernels import use_backend
    from mandheling_tpu.train.trainer import train_niti

    train, test = _data(args.root)
    with use_backend("pallas"):
        _, acc = train_niti(train, test, epochs=args.epochs)
    print(f"final test accuracy: {acc:.4f}")


@demo("MnistTrainSnapshot")
def mnist_train_snapshot(args):
    """Resume NITI training from mnist.snapshot.npz (the reference's
    MnistTrainSnapshot loads mnist.snapshot.mnn, mnistTrain.cpp:340-360)."""
    import jax

    from mandheling_tpu.models import lenet_niti
    from mandheling_tpu.train.trainer import train_niti
    from mandheling_tpu.utils.checkpoint import load_checkpoint

    snap = args.snapshot or "mnist.snapshot.npz"
    train, test = _data(args.root)
    start_params, start_epoch = None, 0
    if os.path.exists(snap):
        template = lenet_niti().init(jax.random.PRNGKey(0))
        start_params, start_epoch = load_checkpoint(snap, template)
        print(f"resumed from {snap} at epoch {start_epoch}")
    _, acc = train_niti(
        train, test, epochs=args.epochs, checkpoint_path=snap,
        start_params=start_params, start_epoch=start_epoch,
    )
    print(f"final test accuracy: {acc:.4f}")


@demo("MnistInt8Train")
def mnist_int8_train(args):
    """Fake-quant QAT training (reference MnistInt8Train)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mandheling_tpu.data import DataLoader, onehot_padded
    from mandheling_tpu.models.lenet_qat import LeNetQAT
    from mandheling_tpu.train.optim import lr_inv, sgd_init, sgd_update

    (x, y), (xt, yt) = _data(args.root)
    model = LeNetQAT(bits=8)
    params, obs = model.init(jax.random.PRNGKey(0))
    velocity = sgd_init(params)

    def loss_fn(p, o, xb, oh, key):
        logits, new_o = model.apply(p, o, xb, dropout_key=key, training=True)
        logp = jax.nn.log_softmax(logits)
        return -jnp.mean(jnp.sum(logp * oh, axis=-1)), new_o

    @jax.jit
    def step(p, o, v, xb, oh, lr, key):
        (loss, new_o), g = jax.value_and_grad(loss_fn, has_aux=True)(
            p, o, xb, oh, key
        )
        p, v = sgd_update(p, g, v, lr)
        return p, new_o, v, loss

    @jax.jit
    def predict(p, o, xb):
        logits, _ = model.apply(p, o, xb, training=False)
        return jnp.argmax(logits, axis=-1)

    dl = DataLoader(x, y, 64, seed=0)
    key = jax.random.PRNGKey(1)
    it = 0
    for epoch in range(args.epochs):
        for bx, by in dl.epoch():
            key, sub = jax.random.split(key)
            bx = (bx / 255.0 - 0.5) * 2.0
            oh = onehot_padded(by, 10, 10).astype(np.float32)
            params, obs, velocity, loss = step(
                params, obs, velocity, jnp.asarray(bx), jnp.asarray(oh),
                lr_inv(0.01, it), sub,
            )
            it += 1
        n = (len(xt) // 64) * 64
        correct = 0
        for i in range(0, n, 64):
            bx = (xt[i : i + 64].astype(np.float32) / 255.0 - 0.5) * 2.0
            pred = predict(params, obs, jnp.asarray(bx))
            correct += int(np.sum(np.asarray(pred) == yt[i : i + 64]))
        print(f"epoch {epoch}: loss {float(loss):.4f} test_acc {correct/max(n,1):.4f}")


@demo("DistributedNITITrain")
def distributed_niti_train(args):
    """Data-parallel NITI training over all available devices."""
    import jax
    import jax.numpy as jnp

    from mandheling_tpu.data import DataLoader, onehot_padded
    from mandheling_tpu.models import NITI_LOGIT_CHANNELS, lenet_niti
    from mandheling_tpu.parallel import (
        data_mesh,
        make_dp_eval_step,
        make_dp_train_step,
        replicate,
        shard_batch,
    )

    n = len(jax.devices())
    mesh = data_mesh(n)
    print(f"mesh: {n} devices, data-parallel")
    (x, y), (xt, yt) = _data(args.root)
    model = lenet_niti()
    params = replicate(mesh, model.init(jax.random.PRNGKey(0)))
    step = make_dp_train_step(model, mesh, donate=False)
    evals = make_dp_eval_step(model, mesh)

    batch = 64 * n
    dl = DataLoader(x, y, batch, seed=0)
    import numpy as np

    for epoch in range(args.epochs):
        loss = None
        for bx, by in dl.epoch():
            oh = onehot_padded(by, 10, NITI_LOGIT_CHANNELS)
            bx_s, oh_s = shard_batch(mesh, jnp.asarray(bx), jnp.asarray(oh))
            params, loss = step(params, bx_s, oh_s)
        nt = (len(xt) // batch) * batch
        correct = 0
        for i in range(0, nt, batch):
            bx_s, by_s = shard_batch(
                mesh,
                jnp.asarray(xt[i : i + batch].astype(np.float32)),
                jnp.asarray(yt[i : i + batch]),
            )
            correct += int(evals(params, bx_s, by_s))
        print(f"epoch {epoch}: loss {float(loss):.4f} test_acc {correct/max(nt,1):.4f}")


@demo("MobilenetV2Train")
def mobilenet_v2_train(args):
    """Full-NITI int8 MobileNetV2 on CIFAR-10 (reference
    MobilenetV2Utils::train, demo/MobilenetV2Utils.cpp:34; CIFAR bin root or
    synthetic fallback) — integer-only training the reference never does
    (its MNv2 demos are fp32/QAT).

    The r5 recipe (DIVERGENCE_r05.json): per-channel depthwise weight
    exponents AND filter-grad requant margins 0/0 (+-1 integer updates).
    The two are jointly necessary — per-tensor dw at any margin stays at
    chance, and per-channel dw at the reference margin 2 stays at chance
    with RISING loss (the bottleneck's 6x-expanded fan-in makes
    ~+-4-unit integer updates destructive; margin 1 is seed-marginal:
    0.98 on one seed, chance on another). With margins 0/0: 0.97/0.98
    across 2 seeds on digits-CIFAR at 60 epochs, ABOVE the fp32+BN
    comparator (best 0.85/0.94) on the same protocol. Forward precision
    was ruled out first: int16 projection outputs (requant SQNR 75-85
    dB) changed nothing. Expect a ~10-epoch chance-level plateau before
    breakout; use 40+ epochs."""
    from mandheling_tpu.data.cifar import load_or_synthesize_cifar
    from mandheling_tpu.models import mobilenet_v2_niti
    from mandheling_tpu.ops import conv as conv_ops
    from mandheling_tpu.ops import depthwise as dw_ops
    from mandheling_tpu.train.trainer import train_niti

    conv_ops.set_fgrad_margin(0)
    dw_ops.set_dw_fgrad_margin(0)
    print("(full-NITI MNv2 recipe: per-channel dw exponents + fgrad "
          "margins 0/0 — see DIVERGENCE_r05.json; breakout needs ~10+ "
          "epochs)")
    xtr, ytr, real = load_or_synthesize_cifar(args.root, train=True,
                                              synth_n=512)
    xte, yte, _ = load_or_synthesize_cifar(args.root, train=False,
                                           synth_n=256)
    if not real:
        print("(no CIFAR-10 bin files found — using synthetic dataset)")
    try:
        _, acc = train_niti(
            (xtr, ytr), (xte, yte), epochs=args.epochs,
            batch=32 if real else 16,
            model=mobilenet_v2_niti(dw_per_channel=True))
    finally:
        conv_ops.set_fgrad_margin(2)
        dw_ops.set_dw_fgrad_margin(2)
    print(f"final test accuracy: {acc:.4f}")


@demo("MobilenetV1Train")
def mobilenet_v1_train(args):
    """Full-NITI int8 MobileNetV1 on CIFAR-10 (CIFAR bin root or synthetic
    fallback). Uses per-channel depthwise weight exponents
    (dw_per_channel=True) — the r4 finding that makes integer-only
    MobileNetV1 training converge; at 60 epochs it reaches 0.966/0.978
    across 2 seeds, ABOVE its fp32+BN comparator on the same protocol
    (best 0.53/0.73; DIVERGENCE_r05.json mnv1_parity). The reference
    never trains any MobileNet integer-only (its demos are fp32/QAT,
    demo/MobilenetV2Utils.cpp)."""
    from mandheling_tpu.data.cifar import load_or_synthesize_cifar
    from mandheling_tpu.models import mobilenet_v1_niti
    from mandheling_tpu.train.trainer import train_niti

    xtr, ytr, real = load_or_synthesize_cifar(args.root, train=True,
                                              synth_n=512)
    xte, yte, _ = load_or_synthesize_cifar(args.root, train=False,
                                           synth_n=256)
    if not real:
        print("(no CIFAR-10 bin files found — using synthetic dataset)")
    _, acc = train_niti(
        (xtr, ytr), (xte, yte), epochs=args.epochs,
        batch=32 if real else 16,
        model=mobilenet_v1_niti(dw_per_channel=True))
    print(f"final test accuracy: {acc:.4f}")


@demo("PipelineNITITrain")
def pipeline_niti_train(args):
    """Pipeline-parallel NITI training (GPipe over a 'pipe' mesh axis) —
    the TPU generalization of the reference's CPU||DSP parallel-gradient
    co-scheduling (CPUBackend.cpp:209-263, SURVEY.md section 2.10)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mandheling_tpu.data import onehot_padded
    from mandheling_tpu.parallel.pp import (
        homogeneous_blocks,
        pipe_mesh,
        quantize_microbatches,
    )
    from mandheling_tpu.parallel.pp_general import (
        GPipePlan,
        make_gpipe_train_step,
        shard_packed_params,
    )

    n = len(jax.devices())
    stages = 4 if n >= 4 else (2 if n >= 2 else 1)
    channels, blocks, micro, mb = 32, 2 * max(stages, 1), 4, 64
    mesh = pipe_mesh(n_stages=stages)
    print(f"mesh: {stages} pipeline stages, {blocks} blocks, "
          f"{micro} microbatches x {mb}")
    model = homogeneous_blocks(blocks, channels)
    params = model.init(jax.random.PRNGKey(0))
    plan = GPipePlan(model, params, (mb, 1, 1, channels), n_stages=stages)
    step = make_gpipe_train_step(plan, mesh, n_microbatches=micro,
                                 donate=False)
    packed = shard_packed_params(mesh, plan.pack_params(params))
    rng = np.random.default_rng(0)
    wstar = rng.normal(0, 1, (channels, 10))
    for it in range(args.epochs * 8):
        xf = rng.normal(0, 1, (micro * mb, 1, 1, channels)).astype(np.float32)
        labels = np.argmax(xf.reshape(-1, channels) @ wstar, axis=1)
        oh = onehot_padded(labels, 10, channels).reshape(micro, mb, channels)
        x_d, x_e = quantize_microbatches(jnp.asarray(xf), micro)
        packed, loss = step(packed, x_d, x_e, jnp.asarray(oh))
        if it % 8 == 0:
            print(f"iter {it}: loss {float(loss):.4f}")
    print(f"final loss: {float(loss):.4f}")


@demo("GPipeLeNetTrain")
def gpipe_lenet_train(args):
    """General pipeline parallelism: the REAL LeNet staged across the
    'pipe' mesh axis (heterogeneous stages, parallel/pp_general.py),
    bit-identical to single-chip at one microbatch."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mandheling_tpu.data import onehot_padded
    from mandheling_tpu.models import NITI_LOGIT_CHANNELS, lenet_niti
    from mandheling_tpu.parallel.pp import pipe_mesh, quantize_microbatches
    from mandheling_tpu.parallel.pp_general import (
        GPipePlan,
        make_gpipe_train_step,
        shard_packed_params,
    )

    n = len(jax.devices())
    stages = 4 if n >= 4 else (2 if n >= 2 else 1)
    micro, mb = 2, 32
    mesh = pipe_mesh(n_stages=stages)
    model = lenet_niti()
    params = model.init(jax.random.PRNGKey(0))
    plan = GPipePlan(model, params, (mb, 28, 28, 1), n_stages=stages)
    print(f"mesh: {stages} stages, layer bounds {plan.bounds}, "
          f"{micro} microbatches x {mb}")
    step = make_gpipe_train_step(plan, mesh, n_microbatches=micro,
                                 donate=False)
    packed = shard_packed_params(mesh, plan.pack_params(params))
    (x, y), _ = _data(args.root)
    for it in range(args.epochs * 8):
        i0 = (it * micro * mb) % (len(x) - micro * mb)
        xf = jnp.asarray(x[i0 : i0 + micro * mb].astype(np.float32))
        oh = onehot_padded(y[i0 : i0 + micro * mb], 10, NITI_LOGIT_CHANNELS)
        x_d, x_e = quantize_microbatches(xf, micro)
        packed, loss = step(
            packed, x_d, x_e,
            jnp.asarray(oh).reshape(micro, mb, -1),
        )
        if it % 8 == 0:
            print(f"iter {it}: loss {float(loss):.4f}")
    print(f"final loss: {float(loss):.4f}")


@demo("OnnxImportTrain")
def onnx_import_train(args):
    """turnModelToTrainable from ONNX: build a demo ONNX graph, import it
    as a trainable NITI model (utils/onnx_model.py), train a few steps."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mandheling_tpu.data import onehot_padded
    from mandheling_tpu.train import make_train_step
    from mandheling_tpu.utils.onnx_io import build_onnx_sequential
    from mandheling_tpu.utils.onnx_model import niti_model_from_onnx

    rng = np.random.default_rng(0)
    ops = [
        ("Conv", {"w": rng.normal(0, 0.2, (8, 1, 5, 5)).astype(np.float32)}),
        ("Relu", {}),
        ("MaxPool", {"kernel": (2, 2), "strides": (2, 2)}),
        ("Conv", {"w": rng.normal(0, 0.2, (16, 8, 3, 3)).astype(np.float32)}),
        ("Relu", {}),
        ("MaxPool", {"kernel": (2, 2), "strides": (2, 2)}),
        ("Flatten", {}),
        ("Gemm", {"w": rng.normal(0, 0.1, (12, 400)).astype(np.float32)}),
    ]
    model_pb = build_onnx_sequential(ops, (1, 1, 28, 28))
    model, params = niti_model_from_onnx(model_pb)
    print(f"imported {len(model.layers)} NITI layers from ONNX")
    step = jax.jit(make_train_step(model))
    (x, y), _ = _data(args.root)
    for it in range(args.epochs * 16):
        i0 = (it * 64) % (len(x) - 64)
        xf = jnp.asarray(x[i0 : i0 + 64].astype(np.float32))
        oh = jnp.asarray(onehot_padded(y[i0 : i0 + 64], 10, 12))
        params, loss = step(params, xf, oh)
        if it % 16 == 0:
            print(f"iter {it}: loss {float(loss):.4f}")
    print(f"final loss: {float(loss):.4f}")


@demo("TfImportTrain")
def tf_import_train(args):
    """turnModelToTrainable from a TensorFlow frozen graph: build a demo
    GraphDef (residual block included), import it as a trainable NITI
    model (utils/tf_model.py), train a few steps."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mandheling_tpu.data import onehot_padded
    from mandheling_tpu.train import make_train_step
    from mandheling_tpu.utils import tf_graphdef as G
    from mandheling_tpu.utils.tf_model import niti_model_from_graphdef

    rng = np.random.default_rng(0)
    F = np.float32
    DT = ("dtype", G.DT_FLOAT)

    def const(name, arr):
        return (name, "Const", [], {"dtype": DT, "value": np.asarray(arr, F)})

    nodes = [
        ("input", "Placeholder", [], {"dtype": DT}),
        const("w0", rng.normal(0, 0.2, (5, 5, 1, 8)).astype(F)),
        ("conv0", "Conv2D", ["input", "w0"],
         {"strides": [1, 1, 1, 1], "padding": "SAME"}),
        ("relu0", "Relu", ["conv0"], {}),
        const("w1", rng.normal(0, 0.2, (3, 3, 8, 8)).astype(F)),
        ("conv1", "Conv2D", ["relu0", "w1"],
         {"strides": [1, 1, 1, 1], "padding": "SAME"}),
        ("res", "AddV2", ["conv1", "relu0"], {}),
        ("relu1", "Relu", ["res"], {}),
        const("axes", np.asarray([1, 2], np.int32)),
        ("gap", "Mean", ["relu1", "axes"], {"keep_dims": True}),
        const("shape", np.asarray([-1, 8], np.int32)),
        ("flat", "Reshape", ["gap", "shape"], {}),
        const("wf", rng.normal(0, 0.1, (8, 12)).astype(F)),
        ("logits", "MatMul", ["flat", "wf"], {"transpose_b": False}),
    ]
    buf = G.build_graphdef(nodes)
    model, params = niti_model_from_graphdef(buf, input_shape=(1, 28, 28, 1))
    print(f"imported {len(model.layers)} NITI layers from the frozen graph "
          f"({[type(l).__name__ for l in model.layers]})")
    step = jax.jit(make_train_step(model))
    (x, y), _ = _data(args.root)
    for it in range(args.epochs * 16):
        i0 = (it * 64) % (len(x) - 64)
        xf = jnp.asarray(x[i0 : i0 + 64].astype(np.float32))
        oh = jnp.asarray(onehot_padded(y[i0 : i0 + 64], 10, 12))
        params, loss = step(params, xf, oh)
        if it % 16 == 0:
            print(f"iter {it}: loss {float(loss):.4f}")
    print(f"final loss: {float(loss):.4f}")


@demo("CaffeImportTrain")
def caffe_import_train(args):
    """turnModelToTrainable from a binary .caffemodel: build a demo net
    (conv+BN+Scale with in-place ReLUs, Eltwise residual), import it as a
    trainable NITI model (utils/caffe_model.py), train a few steps."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mandheling_tpu.data import onehot_padded
    from mandheling_tpu.train import make_train_step
    from mandheling_tpu.utils.caffe_model import (
        build_caffemodel,
        niti_model_from_caffemodel,
    )

    rng = np.random.default_rng(0)
    F = np.float32
    layers = [
        ("conv0", "Convolution", ["data"], ["c0"],
         {"num_output": 8, "kernel_size": 5, "pad": 2},
         [rng.normal(0, 0.2, (8, 1, 5, 5)).astype(F)]),
        ("relu0", "ReLU", ["c0"], ["c0"], {}, []),
        ("conv1", "Convolution", ["c0"], ["c1"],
         {"num_output": 8, "kernel_size": 3, "pad": 1},
         [rng.normal(0, 0.2, (8, 8, 3, 3)).astype(F)]),
        ("bn1", "BatchNorm", ["c1"], ["c1"], {"use_global_stats": 1},
         [np.zeros(8, F), np.ones(8, F), np.ones(1, F)]),
        ("sc1", "Scale", ["c1"], ["c1"], {"axis": 1},
         [rng.uniform(0.5, 1.5, 8).astype(F)]),
        ("res", "Eltwise", ["c1", "c0"], ["r"], {"operation": 1}, []),
        ("relu1", "ReLU", ["r"], ["r"], {}, []),
        ("gap", "Pooling", ["r"], ["g"], {"pool": 1, "global_pooling": 1}, []),
        ("fc", "InnerProduct", ["g"], ["logits"], {"num_output": 12},
         [rng.normal(0, 0.1, (12, 8)).astype(F)]),
    ]
    buf = build_caffemodel(layers, ["data"], [[1, 1, 28, 28]])
    model, params = niti_model_from_caffemodel(buf)
    print(f"imported {len(model.layers)} NITI layers from the caffemodel "
          f"({[type(l).__name__ for l in model.layers]})")
    step = jax.jit(make_train_step(model))
    (x, y), _ = _data(args.root)
    for it in range(args.epochs * 16):
        i0 = (it * 64) % (len(x) - 64)
        xf = jnp.asarray(x[i0 : i0 + 64].astype(np.float32))
        oh = jnp.asarray(onehot_padded(y[i0 : i0 + 64], 10, 12))
        params, loss = step(params, xf, oh)
        if it % 16 == 0:
            print(f"iter {it}: loss {float(loss):.4f}")
    print(f"final loss: {float(loss):.4f}")


@demo("TFLiteImportTrain")
def tflite_import_train(args):
    """turnModelToTrainable from TFLite: export a NITI LeNet to a .tflite
    flatbuffer, re-import it as a trainable NITI model
    (utils/tflite_model.py), train a few steps."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mandheling_tpu.data import onehot_padded
    from mandheling_tpu.models import lenet_niti
    from mandheling_tpu.train import make_train_step
    from mandheling_tpu.utils.tflite_model import (
        niti_model_from_tflite,
        tflite_from_sequential,
    )

    src = lenet_niti()
    buf = tflite_from_sequential(src, src.init(jax.random.PRNGKey(0)),
                                 (64, 28, 28, 1))
    print(f"exported LeNet-NITI as TFLite ({len(buf)} bytes)")
    model, params = niti_model_from_tflite(buf)
    print(f"imported {len(model.layers)} NITI layers from TFLite")
    step = jax.jit(make_train_step(model))
    (x, y), _ = _data(args.root)
    for it in range(args.epochs * 16):
        i0 = (it * 64) % (len(x) - 64)
        xf = jnp.asarray(x[i0 : i0 + 64].astype(np.float32))
        oh = jnp.asarray(onehot_padded(y[i0 : i0 + 64], 10, 12))
        params, loss = step(params, xf, oh)
        if it % 16 == 0:
            print(f"iter {it}: loss {float(loss):.4f}")
    print(f"final loss: {float(loss):.4f}")


@demo("NnGradTest")
def nn_grad_test(args):
    """Gradient correctness check (reference nnGradTest.cpp / DEBUG_GRAD
    dumps): compares the integer conv gradients' int32 accumulators against
    naive scalar references and prints max deltas."""
    import jax.numpy as jnp
    import numpy as np

    from mandheling_tpu.ops import conv as conv_ops

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-30, 30, (4, 12, 12, 8)), jnp.int8)
    w = jnp.asarray(rng.integers(-30, 30, (5, 5, 8, 16)), jnp.int8)
    gy = jnp.asarray(rng.integers(-30, 30, (4, 8, 8, 16)), jnp.int8)

    acc_dx = conv_ops.conv2d_input_grad_acc(gy, w, (12, 12))
    acc_dw = conv_ops.conv2d_filter_grad_acc(x, gy, (5, 5))

    xf = np.asarray(x, np.float64)
    wf = np.asarray(w, np.float64)
    gyf = np.asarray(gy, np.float64)
    import jax

    dx_ref = jax.lax.conv_general_dilated(
        jnp.asarray(gyf), jnp.asarray(np.flip(wf, (0, 1)).transpose(0, 1, 3, 2)),
        (1, 1), [(4, 4), (4, 4)], dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    print("input-grad max |delta| vs float conv:",
          float(jnp.max(jnp.abs(acc_dx - dx_ref))))
    # filter grad vs direct einsum
    dw_direct = np.zeros((5, 5, 8, 16))
    for dy in range(5):
        for dxx in range(5):
            dw_direct[dy, dxx] = np.einsum(
                "bhwi,bhwo->io", xf[:, dy : dy + 8, dxx : dxx + 8, :], gyf
            )
    print("filter-grad max |delta| vs einsum:",
          float(np.max(np.abs(np.asarray(acc_dw) - dw_direct))))
    print("PASS" if float(np.max(np.abs(np.asarray(acc_dw) - dw_direct))) == 0
          else "FAIL")


@demo("QuanByMSE")
def quan_by_mse(args):
    """Post-training quantization by MSE/KL scale search (reference
    demo/quanByMSE.cpp + tools/quantization/calibration.cpp). Calibrates a
    float LeNet's activation scales on sample batches (ImageNoLabelDataset
    when root is an image folder, else synthetic/MNIST), quantizes weights
    per-channel, and reports the scales + quantized-vs-float agreement."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mandheling_tpu.models import LeNetFP32
    from mandheling_tpu.utils.calibration import (
        calibrate_activations,
        quantize_weight_admm,
        quantize_weight_maxabs,
    )

    if args.root and os.path.isdir(args.root) and any(
        f.lower().endswith((".png", ".jpg", ".jpeg", ".bmp"))
        for f in os.listdir(args.root)
    ):
        from mandheling_tpu.data.image import ImageConfig, ImageNoLabelDataset

        ds = ImageNoLabelDataset(args.root, ImageConfig(28, 28, [1 / 127.5], [127.5]))
        batches = [np.stack([ds[i][..., :1] for i in range(min(len(ds), 64))])]
        print(f"calibrating on {len(ds)} images from {args.root}")
    else:
        (x, _), _ = _data(args.root, synth_n=512)
        batches = [x[i:i + 64].astype(np.float32)[..., None]
                   if x.ndim == 3 else x[i:i + 64].astype(np.float32)
                   for i in range(0, 256, 64)]
        print("calibrating on MNIST/synthetic batches")

    model = LeNetFP32()
    params = model.init(jax.random.PRNGKey(0))

    # collect per-layer activations by tapping the forward
    acts = {"input": [], "logits": []}
    for b in batches:
        acts["input"].append(np.asarray(b))
        acts["logits"].append(np.asarray(model.apply(params, jnp.asarray(b))))

    for method in ("MSE", "KL"):
        scales = calibrate_activations(acts, method)
        print(f"{method} scales: " +
              ", ".join(f"{k}={v:.4f}" for k, v in sorted(scales.items())))

    # weight PTQ: per-channel max-abs vs ADMM reconstruction error
    for name, quant in (("maxabs", quantize_weight_maxabs),
                        ("admm", quantize_weight_admm)):
        errs = []
        for p in jax.tree_util.tree_leaves(params):
            w = np.asarray(p)
            if w.ndim == 4:
                q, s = quant(w)
                errs.append(float(np.abs(q * s - w).mean()))
        print(f"weight PTQ ({name}): mean |recon err| per conv layer: "
              + ", ".join(f"{e:.5f}" for e in errs))


@demo("DistillTrainQuant")
def distill_train_quant(args):
    """Knowledge-distillation QAT (reference demo/distillTrainQuant.cpp:114-139):
    a float teacher's logits guide a fake-quant student via _DistillLoss
    (T=20, alpha=0.9, Loss.cpp:68-84). Teacher = LeNetFP32 (loaded from
    --snapshot if given, else briefly pre-trained); student = LeNetQAT."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mandheling_tpu.data import DataLoader, onehot_padded
    from mandheling_tpu.models import LeNetFP32
    from mandheling_tpu.models.lenet_qat import LeNetQAT
    from mandheling_tpu.train.losses import distill_loss
    from mandheling_tpu.train.optim import sgd_init, sgd_update

    (x, y), (xt, yt) = _data(args.root)
    teacher = LeNetFP32()
    tparams = teacher.init(jax.random.PRNGKey(0))

    # quick teacher pre-training (one epoch of plain SGD)
    tvel = sgd_init(tparams)

    def tloss(p, xb, oh):
        logits = teacher.apply(p, xb)
        return -jnp.mean(jnp.sum(jax.nn.log_softmax(logits) * oh, -1))

    @jax.jit
    def tstep(p, v, xb, oh):
        loss, g = jax.value_and_grad(tloss)(p, xb, oh)
        p, v = sgd_update(p, g, v, 0.05)
        return p, v, loss

    dl = DataLoader(x, y, 64, seed=0)
    for bx, by in dl.epoch():
        oh = onehot_padded(by, 10, 10).astype(np.float32)
        tparams, tvel, _ = tstep(tparams, tvel, jnp.asarray(bx), jnp.asarray(oh))
    print("teacher pre-trained (1 epoch)")

    student = LeNetQAT(bits=8)
    sparams, obs = student.init(jax.random.PRNGKey(1))
    svel = sgd_init(sparams)

    def sloss(p, o, xb, oh, key):
        slogits, new_o = student.apply(p, o, xb, dropout_key=key, training=True)
        tlogits = teacher.apply(tparams, xb)
        return distill_loss(slogits, tlogits, oh, 20.0, 0.9), new_o

    @jax.jit
    def sstep(p, o, v, xb, oh, key):
        (loss, new_o), g = jax.value_and_grad(sloss, has_aux=True)(p, o, xb, oh, key)
        p, v = sgd_update(p, g, v, 0.01)
        return p, new_o, v, loss

    @jax.jit
    def predict(p, o, xb):
        logits, _ = student.apply(p, o, xb, training=False)
        return jnp.argmax(logits, -1)

    key = jax.random.PRNGKey(2)
    for epoch in range(args.epochs):
        loss = None
        for bx, by in dl.epoch():
            key, sub = jax.random.split(key)
            oh = onehot_padded(by, 10, 10).astype(np.float32)
            sparams, obs, svel, loss = sstep(
                sparams, obs, svel, jnp.asarray(bx), jnp.asarray(oh), sub)
        n = (len(xt) // 64) * 64
        correct = sum(
            int(jnp.sum(predict(sparams, obs, jnp.asarray(xt[i:i + 64])) ==
                        jnp.asarray(yt[i:i + 64])))
            for i in range(0, n, 64)
        )
        print(f"epoch {epoch}: distill_loss {float(loss):.4f} "
              f"student_test_acc {correct / max(n, 1):.4f}")


@demo("MobilenetV2Transfer")
def mobilenet_v2_transfer(args):
    """Transfer learning (reference demo/mobilenetV2Train.cpp:29-53): frozen
    MobileNetV2 features + a fresh trainable classifier conv. With
    `root pointing at a folder` + `--images-txt path` it trains on an
    ImageDataset (path label lines); otherwise synthetic CIFAR-shaped data.
    `--snapshot` loads pretrained feature params (npz checkpoint)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mandheling_tpu.data import DataLoader, onehot_padded
    from mandheling_tpu.models.mobilenet import mobilenet_v2_niti
    from mandheling_tpu.nn.layers import NITIConv2D, SqueezeLogits
    from mandheling_tpu.nn.module import Sequential
    from mandheling_tpu.train.transfer import (
        TransferModel,
        make_transfer_eval_step,
        make_transfer_train_step,
    )
    from mandheling_tpu.utils.checkpoint import load_checkpoint

    num_classes = 10
    full = mobilenet_v2_niti(num_classes=num_classes, width_mult=0.25)
    # split after GlobalAvgPool: everything before the classifier conv is
    # frozen (the reference freezes up to MobilenetV2/Logits/AvgPool)
    split = len(full.layers) - 2
    features = Sequential(full.layers[:split])
    head_width = full.layers[split].in_channels
    logit_width = (num_classes + 3) // 4 * 4
    head = Sequential([NITIConv2D(head_width, logit_width, (1, 1)), SqueezeLogits()])

    full_params = full.init(jax.random.PRNGKey(0))
    if args.snapshot and os.path.exists(args.snapshot):
        full_params, _ = load_checkpoint(args.snapshot, full_params)
        print(f"loaded pretrained features from {args.snapshot}")
    else:
        print("(no pretrained snapshot — feature extractor is random init)")
    model = TransferModel(features, full_params[:split], head)
    head_params = model.init(jax.random.PRNGKey(1))

    if args.root and args.images_txt:
        from mandheling_tpu.data.image import ImageConfig, ImageDataset

        cfg = ImageConfig(resize_height=32, resize_width=32,
                          crop_fraction=(0.875, 0.875))
        ds = ImageDataset(args.root, args.images_txt, cfg)
        x = np.stack([ds[i][0] for i in range(len(ds))])
        y = np.array([ds[i][1] for i in range(len(ds))], np.int32)
        print(f"ImageDataset: {len(ds)} images from {args.images_txt}")
    else:
        rng = np.random.default_rng(0)
        x = rng.normal(0, 1, (512, 32, 32, 3)).astype(np.float32)
        y = (rng.integers(0, num_classes, 512)).astype(np.int32)
        print("(no image folder/txt — synthetic data)")

    step = jax.jit(make_transfer_train_step(model), donate_argnums=(0,))
    evals = jax.jit(make_transfer_eval_step(model, num_classes))
    dl = DataLoader(x, y, 64, seed=0)
    for epoch in range(args.epochs):
        loss = None
        for bx, by in dl.epoch():
            oh = onehot_padded(by, num_classes, logit_width)
            head_params, loss = step(head_params, jnp.asarray(bx), jnp.asarray(oh))
        n = (len(x) // 64) * 64
        correct = sum(
            int(evals(head_params, jnp.asarray(x[i:i + 64]), jnp.asarray(y[i:i + 64])))
            for i in range(0, n, 64)
        )
        print(f"epoch {epoch}: loss {float(loss):.4f} "
              f"train_acc {correct / max(n, 1):.4f}")


@demo("DataLoaderDemo")
def dataloader_demo(args):
    from mandheling_tpu.data import DataLoader, load_or_synthesize

    x, y, real = load_or_synthesize(args.root, train=True)
    print(f"dataset: {len(x)} images ({'real MNIST' if real else 'synthetic'})")
    dl = DataLoader(x, y, 64, seed=0)
    for i, (bx, by) in enumerate(dl.epoch()):
        if i < 3:
            print(f"batch {i}: images {bx.shape} {bx.dtype}, "
                  f"labels {by.shape}, first labels {by[:8]}")
    print(f"{len(dl)} batches/epoch")


@demo("LinearRegression")
def linear_regression(args):
    """The reference's sanity demo (demo/linearRegression.cpp): fit y=ax+b."""
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(0)
    xs = jax.random.normal(key, (256, 1))
    ys = 3.0 * xs + 1.5 + 0.01 * jax.random.normal(jax.random.PRNGKey(1), (256, 1))
    w = jnp.zeros((1, 1))
    b = jnp.zeros((1,))

    @jax.jit
    def step(w, b):
        def loss_fn(w, b):
            return jnp.mean((xs @ w + b - ys) ** 2)

        loss, (gw, gb) = jax.value_and_grad(loss_fn, argnums=(0, 1))(w, b)
        return w - 0.1 * gw, b - 0.1 * gb, loss

    for i in range(200):
        w, b, loss = step(w, b)
    print(f"fit: a={float(w[0,0]):.3f} b={float(b[0]):.3f} loss={float(loss):.6f}")


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("demo", choices=sorted(DEMOS), nargs="?")
    parser.add_argument("root", nargs="?", default=None,
                        help="MNIST idx-file root dir")
    parser.add_argument("--epochs", type=int, default=10)
    parser.add_argument("--snapshot", default=None)
    parser.add_argument("--images-txt", default=None,
                        help="label txt for MobilenetV2Transfer ImageDataset")
    args = parser.parse_args()
    if not args.demo:
        print("available demos:")
        for name in sorted(DEMOS):
            print(" ", name)
        return
    DEMOS[args.demo](args)


if __name__ == "__main__":
    main()
