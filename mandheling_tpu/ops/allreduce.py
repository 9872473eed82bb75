"""Cross-replica gradient allreduce strategies for data parallelism.

Two ways to combine per-replica NITI weight-gradient accumulators
(SURVEY.md section 7 hard-part 5; EQuARX, PAPERS.md):

- "int32" (default, exact): psum the int32 accumulators BEFORE the single
  global range-estimate + pseudo-stochastic shift. Bit-identical to
  single-chip training (integer addition is exactly associative); costs
  4 bytes/element on the wire.
- "int8" (approximate, 4x cheaper): align every replica to a common
  power-of-two exponent first — bw_g = pmax(local bw) plus a ceil(log2 N)
  headroom so the sum of N aligned int8 values cannot exceed int8 range —
  psto-shift locally to int8, psum the *int8* tensors, then apply the
  normal gradient requant to the summed counts. The extra pre-sum
  quantization adds rounding noise (the accuracy gate still passes — see
  tests/test_parallel.py) but the allreduce moves 1 byte/element.

The reference has no distributed layer; the analog is its gradient /16
readback rescale at the FastRPC boundary (`CPUBackend.cpp:226-231`), which
also trades gradient precision for transfer width.
"""

from __future__ import annotations

import contextlib
import math

import jax
import jax.numpy as jnp

from . import numerics

_MODE = "int32"
_VALID = ("int32", "int8")


def set_grad_allreduce(mode: str) -> None:
    global _MODE
    if mode not in _VALID:
        raise ValueError(f"mode must be one of {_VALID}, got {mode!r}")
    _MODE = mode


def get_grad_allreduce() -> str:
    return _MODE


@contextlib.contextmanager
def use_grad_allreduce(mode: str):
    global _MODE
    prev = _MODE
    set_grad_allreduce(mode)
    try:
        yield
    finally:
        _MODE = prev


def grad_allreduce_requant(acc: jax.Array, axis_name, margin: int,
                           pc_shift: jax.Array = None) -> jax.Array:
    """Combine per-replica int32 gradient accumulators across `axis_name`
    and requantize to the int8 NITI gradient (shift = bw - margin).

    With axis_name None this is just the local requant.

    `pc_shift` (the per-channel depthwise alignment, a broadcastable
    int32 array of right-shift amounts) is applied AFTER the
    cross-replica sum: truncating division does not commute with
    addition, so shifting each replica's partial accumulator locally
    would break the bit-identity-to-single-chip contract (found by
    tests/test_parallel.py::test_dp_bit_identical_mnv2_recipe, r5)."""

    def _shift(a):
        return a if pc_shift is None else numerics.trunc_shift_div(a, pc_shift)

    if axis_name is None:
        acc = _shift(acc)
        bw = numerics.range_estimate(acc)
        return numerics.requant_grad_from_bw(acc, bw, margin)
    if _MODE == "int32":
        acc = _shift(jax.lax.psum(acc, axis_name))
        bw = numerics.range_estimate(acc)
        return numerics.requant_grad_from_bw(acc, bw, margin)
    # int8: exponent-align, quantize, sum narrow
    n = jax.lax.axis_size(axis_name)
    log2n = max(1, math.ceil(math.log2(n))) if n > 1 else 0
    bw_l = numerics.range_estimate(acc)
    bw_g = jax.lax.pmax(bw_l, axis_name)
    # |psto(acc, bw_g + log2n - 7)| <= 2^(7 - log2n), so the N-replica sum
    # stays within int8 range — the wire dtype really is int8
    aligned = numerics.psto_shift_int8(acc, bw_g + log2n - 7)
    s = _shift(jax.lax.psum(aligned, axis_name).astype(jnp.int32))
    bw_s = numerics.range_estimate(s)
    return numerics.requant_grad_from_bw(s, bw_s, margin)
