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
