from . import loader, mnist
from .loader import DataLoader, onehot_padded, shard_for_host
from .mnist import load_mnist, load_or_synthesize, synthetic_mnist

__all__ = [
    "loader",
    "mnist",
    "DataLoader",
    "onehot_padded",
    "shard_for_host",
    "load_mnist",
    "load_or_synthesize",
    "synthetic_mnist",
]
