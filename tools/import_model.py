"""Generic graph importer CLI: any supported model file -> trainable NITI
checkpoint — the full `MNNConvert + transformer.out` pipeline of the
reference (converter: `tools/converter`; turn-trainable:
`transformer/Transformer.cpp:69`) in one command, with no
architecture-matched adapter: the graph's own topology (including
residual/concat branches) becomes the NITI layer tree through
utils/graph_import.RegionWalker.

    python tools/import_model.py model.onnx --input-shape 1,3,32,32 --out m.npz
    python tools/import_model.py model.tflite --out m.npz
    python tools/import_model.py frozen.pb --format tf \
        --input-shape 1,224,224,3 --out m.npz
    python tools/import_model.py net.caffemodel --out m.npz

Formats: onnx (NCHW), tflite (NHWC), tf frozen GraphDef (NHWC),
caffe binary NetParameter (NCHW). `--check` runs one integer train step
on synthetic data before saving.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


FORMATS = ("onnx", "tflite", "tf", "caffe")
EXT = {".onnx": "onnx", ".tflite": "tflite", ".pb": "tf",
       ".caffemodel": "caffe"}


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("input")
    ap.add_argument("--format", choices=FORMATS, default=None,
                    help="inferred from the extension when omitted")
    ap.add_argument("--input-shape", default=None,
                    help="comma-separated; NCHW for onnx/caffe, NHWC for "
                         "tflite/tf (required for tf; optional elsewhere "
                         "when the file declares it)")
    ap.add_argument("--output", default=None,
                    help="logits tensor/node name (tf/caffe; default: the "
                         "unique graph sink)")
    ap.add_argument("--out", required=True, help="output checkpoint .npz")
    ap.add_argument("--check", action="store_true",
                    help="run one integer train step before saving")
    ap.add_argument("--dw-per-channel", action="store_true",
                    help="upgrade imported depthwise layers to per-channel "
                         "weight exponents (half of the integer-MobileNet "
                         "training recipe, DIVERGENCE_r05.json; pair with "
                         "fgrad margins 0/0 when fine-tuning integer-only)")
    args = ap.parse_args()

    fmt = args.format or EXT.get(Path(args.input).suffix.lower())
    if fmt is None:
        ap.error(f"cannot infer format from {args.input!r}; pass --format")
    shape = (tuple(int(d) for d in args.input_shape.split(","))
             if args.input_shape else None)

    if fmt == "onnx":
        from mandheling_tpu.utils.onnx_model import niti_model_from_onnx

        model, params = niti_model_from_onnx(args.input, input_shape=shape)
    elif fmt == "tflite":
        from mandheling_tpu.utils.tflite_model import niti_model_from_tflite

        model, params = niti_model_from_tflite(args.input, input_shape=shape)
    elif fmt == "tf":
        from mandheling_tpu.utils.tf_model import niti_model_from_graphdef

        model, params = niti_model_from_graphdef(
            args.input, input_shape=shape, output=args.output)
    else:
        from mandheling_tpu.utils.caffe_model import niti_model_from_caffemodel

        model, params = niti_model_from_caffemodel(
            args.input, input_shape=shape, output=args.output)

    if args.dw_per_channel:
        from mandheling_tpu.nn.transform import dw_to_per_channel

        model, params = dw_to_per_channel(model, params)
        n_pc = sum(getattr(l, "per_channel", False) for l in model.layers)
        print(f"dw-per-channel: upgraded {n_pc} depthwise layers")

    kinds = [type(l).__name__ for l in model.layers]
    print(f"imported {len(kinds)} NITI layers: {kinds}")

    if args.check:
        import jax
        import jax.numpy as jnp
        import numpy as np

        from mandheling_tpu.data import onehot_padded
        from mandheling_tpu.train import make_train_step

        if shape is None:
            raise SystemExit("--check needs --input-shape")
        if fmt in ("onnx", "caffe"):  # NCHW spec -> NHWC batch
            _, c, h, w = shape
        else:
            _, h, w, c = shape
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(0, 1, (8, h, w, c)), jnp.float32)
        # probe the logit width from a forward pass
        from mandheling_tpu.ops.qtensor import QTensor
        from mandheling_tpu.train.train_step import quantize_batch

        d, e = quantize_batch(x)
        logits, _ = model.fwd(params, QTensor(d, e))
        nlog = logits.data.shape[-1]
        oh = jnp.asarray(onehot_padded(
            rng.integers(0, min(10, nlog), 8), min(10, nlog), nlog))
        step = jax.jit(make_train_step(model))
        _, loss = step(params, x, oh)
        print(f"check: one integer train step OK, loss {float(loss):.4f}")

    from mandheling_tpu.utils.checkpoint import save_checkpoint

    save_checkpoint(args.out, list(params), step=0,
                    extra={"source_format": fmt, "layers": kinds})
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
