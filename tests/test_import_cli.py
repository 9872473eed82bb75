"""tools/import_model.py CLI: graph file -> trainable NITI checkpoint
(the MNNConvert + transformer.out pipeline in one command)."""

import os
import subprocess
import sys

import numpy as np
import pytest


@pytest.mark.slow
def test_import_model_cli_onnx_residual(tmp_path):
    from mandheling_tpu.utils import onnx_io

    rng = np.random.default_rng(0)
    path = str(tmp_path / "res.onnx")
    onnx_io.build_onnx_graph(
        [
            ("Conv", ["input"], ["c"],
             {"w": rng.normal(0, 0.2, (8, 3, 3, 3)).astype(np.float32),
              "pads": (1, 1, 1, 1)}),
            ("Relu", ["c"], ["r"], {}),
            ("Conv", ["r"], ["b"],
             {"w": rng.normal(0, 0.2, (8, 8, 3, 3)).astype(np.float32),
              "pads": (1, 1, 1, 1)}),
            ("Add", ["b", "r"], ["out"], {}),
        ],
        (1, 3, 16, 16), output="out", path=path,
    )
    out = str(tmp_path / "res_niti.npz")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, PYTHONPATH="", JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "import_model.py"),
         path, "--input-shape", "1,3,16,16", "--check", "--out", out],
        capture_output=True, text=True, timeout=300, cwd=repo, env=env,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "ResidualBlock" in proc.stdout
    assert "train step OK" in proc.stdout
    assert os.path.exists(out)

    import json

    with np.load(out, allow_pickle=False) as data:
        meta = json.loads(str(data["__meta__"]))
    assert meta["extra"]["source_format"] == "onnx"
