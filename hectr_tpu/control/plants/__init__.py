"""Plant / demo models.

The closed-loop simulators take plants as pure functions (ode, jacobian)
plus steady-state offsets -- the same plugin shape as the reference,
which passes `ode`/`jacobian` function pointers into the simulate loop
(src/hectr.h:106-107,115-116).
"""

from hectr_tpu.control.plants.cstr import (
    CSTR_STEADY_STATE,
    cstr_jacobian,
    cstr_linearize,
    cstr_ode,
)

__all__ = [
    "CSTR_STEADY_STATE",
    "cstr_ode",
    "cstr_jacobian",
    "cstr_linearize",
]
