from . import mesh, pp, pp_general, sharded_step
from .mesh import DATA_AXIS, MODEL_AXIS, data_mesh, make_mesh
from . import tp
from .pp import (
    PIPE_AXIS,
    homogeneous_blocks,
    pipe_mesh,
    quantize_microbatches,
)
from .pp_general import GPipePlan, make_gpipe_train_step, shard_packed_params
from .sharded_step import (
    make_dp_eval_step,
    make_dp_train_step,
    replicate,
    shard_batch,
)

__all__ = [
    "mesh",
    "pp",
    "pp_general",
    "sharded_step",
    "DATA_AXIS",
    "MODEL_AXIS",
    "PIPE_AXIS",
    "data_mesh",
    "make_mesh",
    "make_dp_eval_step",
    "make_dp_train_step",
    "GPipePlan",
    "make_gpipe_train_step",
    "shard_packed_params",
    "homogeneous_blocks",
    "pipe_mesh",
    "quantize_microbatches",
    "replicate",
    "shard_batch",
]
