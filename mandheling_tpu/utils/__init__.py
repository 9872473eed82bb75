from . import checkpoint, profiler
from .checkpoint import load_checkpoint, quantize_params_tree, save_checkpoint
from .profiler import StepTimer, xla_trace

__all__ = [
    "checkpoint",
    "profiler",
    "load_checkpoint",
    "quantize_params_tree",
    "save_checkpoint",
    "StepTimer",
    "xla_trace",
]
