"""Model converter CLI — import PyTorch / ONNX / TFLite models.

The analog of the reference's `tools/converter` (MNNConvert: external
framework model -> .mnn) followed by `transformer.out` turn-trainable
(SURVEY.md sections 2.9, 2.3). Converts a torch .pt/.pth state_dict, an
.onnx file, or a .tflite file of an architecture-matched model into this
framework's fp32 params and saves a checkpoint; `--quantize` additionally
emits the NITI int8 QTensor tree (the turnModelToTrainable analog,
utils/checkpoint.py).

    python tools/convert.py model.pt --arch lenet_fp32 --out lenet.npz
    python tools/convert.py model.onnx --arch lenet_fp32 --out lenet.npz
    python tools/convert.py model.tflite --arch lenet_fp32 --out lenet.npz
    python tools/convert.py mbv2.pth --arch mobilenet_v2_fp32 \
        --out mbv2.npz --quantize
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("input",
                    help="torch .pt/.pth (state_dict or module), .onnx, "
                         "or .tflite")
    ap.add_argument("--arch", required=True,
                    choices=["lenet_fp32", "mobilenet_v1_fp32",
                             "mobilenet_v2_fp32"])
    ap.add_argument("--out", required=True, help="output checkpoint .npz")
    ap.add_argument("--num-classes", type=int, default=10)
    ap.add_argument("--quantize", action="store_true",
                    help="also save <out>.niti.npz with int8 QTensor weights")
    args = ap.parse_args()

    from mandheling_tpu.models.lenet import LeNetFP32
    from mandheling_tpu.models.mobilenet_fp32 import (
        MobileNetV1FP32,
        MobileNetV2FP32,
    )
    from mandheling_tpu.utils.checkpoint import (
        quantize_params_tree,
        save_checkpoint,
    )
    from mandheling_tpu.utils.convert import (
        lenet_fp32_from_modules,
        load_torch_file,
        mobilenet_fp32_from_modules,
        modules_from_state_dict,
    )

    if args.input.endswith(".onnx"):
        from mandheling_tpu.utils.onnx_io import modules_from_onnx

        modules = modules_from_onnx(args.input)
    elif args.input.endswith(".tflite"):
        from mandheling_tpu.utils.tflite_model import modules_from_tflite

        modules = modules_from_tflite(args.input)
    else:
        modules = modules_from_state_dict(load_torch_file(args.input))
    if args.arch == "lenet_fp32":
        params = lenet_fp32_from_modules(modules)
    else:
        model_cls = (MobileNetV1FP32 if args.arch == "mobilenet_v1_fp32"
                     else MobileNetV2FP32)
        params = mobilenet_fp32_from_modules(
            modules, model_cls(num_classes=args.num_classes)
        )

    save_checkpoint(args.out, params)
    n = sum(x.size for x in __import__("jax").tree.leaves(params))
    print(f"converted {args.input} ({args.arch}, {n} params) -> {args.out}")

    if args.quantize:
        qpath = args.out.removesuffix(".npz") + ".niti.npz"
        save_checkpoint(qpath, quantize_params_tree(params))
        print(f"NITI int8 tree -> {qpath}")


if __name__ == "__main__":
    main()
