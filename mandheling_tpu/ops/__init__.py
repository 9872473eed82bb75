from . import conv, eltwise, loss, matmul, numerics, pool, relu
from .qtensor import QTensor, quantize_input, quantize_weights

__all__ = [
    "conv",
    "eltwise",
    "loss",
    "matmul",
    "numerics",
    "pool",
    "relu",
    "QTensor",
    "quantize_input",
    "quantize_weights",
]
