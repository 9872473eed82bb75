"""Device mesh construction for data/model-parallel NITI training.

The reference is strictly single-device (SURVEY.md section 2.10); the only
"parallelism" it has is the CPU||DSP gradient thread. On TPU, scale-out is a
`jax.sharding.Mesh` with explicit collectives — this module is the rebuild's
*new* distributed layer (SURVEY.md sections 5.8, 7 step 4).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """(data, model) mesh over the available devices.

    Data parallelism rides the outer axis (across hosts / DCN-adjacent),
    model parallelism the inner (ICI-adjacent neighbors) — collectives for
    the model axis are the latency-sensitive ones."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model <= len(devices), (
        f"need {n_data}x{n_model} devices, have {len(devices)}"
    )
    grid = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def data_mesh(n: Optional[int] = None) -> Mesh:
    """Pure data-parallel mesh."""
    devices = jax.devices()
    n = n or len(devices)
    return Mesh(np.asarray(devices[:n]).reshape(n, 1), (DATA_AXIS, MODEL_AXIS))
