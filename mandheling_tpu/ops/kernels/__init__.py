"""Hand-written Pallas kernels — the SIMU/verification layer (re-scoped
round 3 after the measured retirement; see README "Kernel-backend
finding").

Role: the analog of the reference's MNN_HEXAGON_DSP_SIMU CPU simulation +
hexagon `_ref` op pairs (SURVEY.md section 4): every kernel is bit-exact
against the jnp/XLA lowering (interpret-mode + on-device parity tests,
tests/test_pallas_kernels.py), strided-capable, and selectable via
`use_backend("pallas"/"pallas_interpret")` — but the measured default
everywhere is `xla`:
the exact-NITI requant needs the global max|acc| first, so two-phase
on-chip-accumulator kernels pay 2x compute, which loses on compute-bound
shapes to XLA's compute-once + spilled-accumulator form (measured r2+r3,
numbers in tools/roofline.py / ROOFLINE_r03.json and README).
"""

from . import dispatch
from .dispatch import get_backend, set_backend, use_backend

__all__ = ["dispatch", "get_backend", "set_backend", "use_backend"]
