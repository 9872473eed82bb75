from . import mesh, pp, sharded_step
from .mesh import DATA_AXIS, MODEL_AXIS, data_mesh, make_mesh
from . import tp
from .pp import (
    PIPE_AXIS,
    init_pp_params,
    make_pp_train_step,
    pipe_mesh,
    quantize_microbatches,
    shard_pp_params,
)
from .sharded_step import (
    make_dp_eval_step,
    make_dp_train_step,
    replicate,
    shard_batch,
)

__all__ = [
    "mesh",
    "pp",
    "sharded_step",
    "DATA_AXIS",
    "MODEL_AXIS",
    "PIPE_AXIS",
    "data_mesh",
    "make_mesh",
    "make_dp_eval_step",
    "make_dp_train_step",
    "make_pp_train_step",
    "init_pp_params",
    "pipe_mesh",
    "quantize_microbatches",
    "shard_pp_params",
    "replicate",
    "shard_batch",
]
