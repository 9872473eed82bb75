"""Kernel backend dispatch: XLA vs Pallas vs Pallas-interpret.

The reference switches compute paths through mode files in the cwd
(`DSP.txt` 0/1/2, `parallel.txt` — SURVEY.md section 5.6). TPU-native, that
state machine collapses to an explicit backend selector:

- "xla"              — lax.conv_general_dilated / dot_general, int8 -> int32
                        (XLA already tiles these onto the MXU)
- "pallas"           — hand-written Pallas MXU kernels (ops/kernels/*.py)
- "pallas_interpret" — same kernels in interpreter mode (the analog of the
                        reference's MNN_HEXAGON_DSP_SIMU CPU simulation of
                        DSP numerics, SURVEY.md section 4)

All backends produce the *same int32 accumulator*, so the NITI requant
logic above them is backend-independent and numerics are identical.
"""

from __future__ import annotations

import contextlib
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

_BACKEND = "xla"
_VALID = ("xla", "pallas", "pallas_interpret")


def set_backend(name: str) -> None:
    global _BACKEND
    if name not in _VALID:
        raise ValueError(f"backend must be one of {_VALID}, got {name!r}")
    _BACKEND = name


def get_backend() -> str:
    return _BACKEND


@contextlib.contextmanager
def use_backend(name: str):
    global _BACKEND
    prev = _BACKEND
    set_backend(name)
    try:
        yield
    finally:
        _BACKEND = prev


def _xla_conv_acc(x, w, strides, padding, lhs_dilation, rhs_dilation):
    return jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=strides,
        padding=padding,
        lhs_dilation=lhs_dilation,
        rhs_dilation=rhs_dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )


def conv_acc(
    x: jax.Array,
    w: jax.Array,
    strides: Tuple[int, int],
    padding: Tuple[Tuple[int, int], Tuple[int, int]],
    lhs_dilation: Optional[Tuple[int, int]] = None,
    rhs_dilation: Optional[Tuple[int, int]] = None,
) -> jax.Array:
    """int8 NHWC conv with int32 accumulation on the selected backend.

    Non-int8 lhs (the int16 linear-projection outputs of the MNv2
    bottleneck extension, ops/numerics.requant_forward out_bits=15) always
    takes the XLA path with dtype-matched operands — the Pallas kernels
    are int8-tile-specific."""
    lhs_dilation = lhs_dilation or (1, 1)
    rhs_dilation = rhs_dilation or (1, 1)
    if x.dtype != jnp.int8 or w.dtype != jnp.int8:
        common = jnp.promote_types(x.dtype, w.dtype)
        return _xla_conv_acc(x.astype(common), w.astype(common), strides,
                             padding, lhs_dilation, rhs_dilation)
    if _BACKEND != "xla":
        from . import conv_int8  # deferred: pallas import is optional

        out = conv_int8.conv_acc_pallas(
            x, w, strides, padding, lhs_dilation, rhs_dilation,
            interpret=(_BACKEND == "pallas_interpret"),
        )
        if out is not None:
            return out
    return _xla_conv_acc(x, w, strides, padding, lhs_dilation, rhs_dilation)


def matmul_acc(a: jax.Array, b: jax.Array) -> jax.Array:
    """int8 (M,K) x int8 (K,N) -> int32 (M,N) on the selected backend."""
    if a.dtype != jnp.int8 or b.dtype != jnp.int8:
        common = jnp.promote_types(a.dtype, b.dtype)
        return jax.lax.dot_general(
            a.astype(common), b.astype(common),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
    if _BACKEND != "xla":
        from . import matmul_int8

        out = matmul_int8.matmul_acc_pallas(
            a, b, interpret=(_BACKEND == "pallas_interpret")
        )
        if out is not None:
            return out
    return jax.lax.dot_general(
        a,
        b,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
