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
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
