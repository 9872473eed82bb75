from . import dispatch
from .dispatch import get_backend, set_backend, use_backend

__all__ = ["dispatch", "get_backend", "set_backend", "use_backend"]
