from . import mesh, sharded_step
from .mesh import DATA_AXIS, MODEL_AXIS, data_mesh, make_mesh
from . import tp
from .sharded_step import (
    make_dp_eval_step,
    make_dp_train_step,
    replicate,
    shard_batch,
)

__all__ = [
    "mesh",
    "sharded_step",
    "DATA_AXIS",
    "MODEL_AXIS",
    "data_mesh",
    "make_mesh",
    "make_dp_eval_step",
    "make_dp_train_step",
    "replicate",
    "shard_batch",
]
