"""Test configuration: force CPU platform with a virtual 8-device mesh.

Must run before jax initializes its backends. Fastest invocation on this
machine (skips the axon TPU bootstrap in sitecustomize):

    PYTHONPATH= JAX_PLATFORMS=cpu python -m pytest tests/ -x -q
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "backend_optimization_level" not in flags:
    # integer numerics are exact at any optimization level; the suite is
    # compile-time dominated on CPU
    flags = flags + " --xla_backend_optimization_level=1"
os.environ["XLA_FLAGS"] = flags

# Persistent compilation cache: the suite is dominated by CPU jit compiles
# of the big model train steps; repeat runs hit the cache and drop from
# minutes to seconds.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/mandheling_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pytest_configure(config):
    """Fail fast if jax grabbed a non-CPU platform or <8 devices.

    On this box a plain `python -m pytest tests` lets the axon sitecustomize
    bootstrap the remote TPU before this conftest runs: the 8-device
    fixtures error out and everything else crawls through the relay
    (25+ min vs 2-3 min). Refuse to start instead of limping."""
    import jax

    backend = jax.default_backend()
    ndev = jax.device_count()
    if backend != "cpu" or ndev < 8:
        raise RuntimeError(
            f"test suite needs the virtual 8-device CPU mesh, got "
            f"backend={backend!r} with {ndev} device(s) — jax was "
            f"initialized before conftest.py could set JAX_PLATFORMS "
            f"(usually the axon sitecustomize via PYTHONPATH). Run:\n\n"
            f"    PYTHONPATH= JAX_PLATFORMS=cpu python -m pytest tests/ -x -q\n"
        )
