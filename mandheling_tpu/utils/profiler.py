"""Step timing, throughput counters, and optional XLA trace capture.

Reference: AUTOTIME scoped timers (`include/MNN/AutoTime.hpp`) and the
express per-op profiler (`Executor::Profiler`, express/Executor.cpp:34-77).
Per-op detail on TPU comes free from the XLA profiler; what we build is the
epoch/step timing + samples/s counters the training loops print
(MnistUtils.cpp:128-147) plus a jax.profiler trace hook.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional


class StepTimer:
    """Accumulates step wall-times; reports ms/step and samples/s."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._times = []
        self._samples = 0

    @contextlib.contextmanager
    def step(self, n_samples: int):
        t0 = time.perf_counter()
        yield
        self._times.append(time.perf_counter() - t0)
        self._samples += n_samples

    @property
    def total_s(self) -> float:
        return sum(self._times)

    @property
    def ms_per_step(self) -> float:
        return 1000.0 * self.total_s / max(len(self._times), 1)

    @property
    def samples_per_sec(self) -> float:
        return self._samples / self.total_s if self.total_s else 0.0

    def summary(self) -> str:
        return (
            f"{len(self._times)} steps, {self.ms_per_step:.2f} ms/step, "
            f"{self.samples_per_sec:.0f} samples/s"
        )


@contextlib.contextmanager
def xla_trace(logdir: Optional[str]):
    """Capture an XLA profiler trace (view with tensorboard/xprof)."""
    if not logdir:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def cost_analysis(fn, *example_args):
    """Compiled-program cost analysis — the analog of the reference's
    per-OpType flops accounting (Executor::Profiler, express/Executor.cpp:
    34-77, dumped per epoch by MnistUtils.cpp:184). Returns the XLA cost
    model's dict for the whole jitted program: {'flops': ..., 'bytes
    accessed': ..., ...} (keys vary by backend)."""
    import jax

    compiled = jax.jit(fn).lower(*example_args).compile()
    costs = compiled.cost_analysis()
    if isinstance(costs, list):  # older jax returns one dict per device
        costs = costs[0] if costs else {}
    return dict(costs) if costs else {}


def flops_per_step(fn, *example_args) -> float:
    """Total XLA-estimated flops for one call of `fn(*example_args)`."""
    return float(cost_analysis(fn, *example_args).get("flops", 0.0))


def trace_device_planes(fn, *example_args, iters: int = 3,
                        logdir: Optional[str] = None):
    """Trace `iters` executions of a jitted callable and return the parsed
    device XPlanes (utils/xplane.py). Compile happens outside the trace."""
    import shutil
    import tempfile

    import jax

    from . import xplane

    own_dir = logdir is None
    logdir = logdir or tempfile.mkdtemp(prefix="mandheling_prof_")
    try:
        jitted = jax.jit(fn) if not hasattr(fn, "lower") else fn
        out = jitted(*example_args)  # compile outside the trace
        jax.block_until_ready(out)
        jax.profiler.start_trace(logdir)
        try:
            for _ in range(iters):
                out = jitted(*example_args)
            jax.block_until_ready(out)
        finally:
            jax.profiler.stop_trace()
        files = xplane.find_xplane_files(logdir)
        planes = []
        for f in files:
            planes.extend(xplane.parse_xspace(f))
        return xplane.device_planes(planes)
    finally:
        if own_dir:
            shutil.rmtree(logdir, ignore_errors=True)


def per_op_profile(fn, *example_args, iters: int = 3, logdir: Optional[str] = None):
    """Per-op device-time table for a jitted callable — the full analog of
    the reference's Executor::Profiler per-OpType dump
    (express/Executor.cpp:34-77, printed per epoch by MnistUtils.cpp:184).

    Traces `iters` executions with jax.profiler, parses the XSpace protobuf
    (utils/xplane.py), and returns (per_op_rows, per_category_rows); each
    row carries occurrences, total device microseconds, and — on TPU —
    the profiler's flops / bytes_accessed per op.

    Times are summed over all `iters` runs; divide by `iters` for per-step.
    """
    from . import xplane

    planes = trace_device_planes(fn, *example_args, iters=iters,
                                 logdir=logdir)
    rows = xplane.per_op_rows(planes)
    return rows, xplane.by_category(rows)
