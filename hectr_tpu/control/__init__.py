"""Plaintext control toolbox: integrators, linear-systems numerics,
QP, condensed MPC, estimator/selector stages, closed-loop simulation.

Reference capability map (all reimplemented, none translated):
  src/ode.c       -> hectr_tpu.control.ode
  src/matrices.c  -> hectr_tpu.control.linalg
  src/dare.c      -> hectr_tpu.control.riccati.dare
  src/dlqr.c      -> hectr_tpu.control.riccati.dlqr
  src/dlqe.c      -> hectr_tpu.control.riccati.dlqe
  src/quadprog.c  -> hectr_tpu.control.qp.quadprog
  src/mpc.c       -> hectr_tpu.control.mpc
  src/ctr.c       -> hectr_tpu.control.stages + hectr_tpu.control.simulate
  src/cstr.c      -> hectr_tpu.control.plants.cstr
"""

from hectr_tpu.control.ode import rk4_step, stiff_step
from hectr_tpu.control.linalg import expm, c2d, pinv_cutoff
from hectr_tpu.control.riccati import dare, dlqr, dlqe
from hectr_tpu.control.qp import quadprog
from hectr_tpu.control.mpc import (
    horizon_matrices, mpc_gains, ctr_mpc, MPCBounds,
)
from hectr_tpu.control.stages import (
    weighting_matrices, estimator_gains, selector_matrix,
    measure, measure_forward, select_target, estimate_forward, actuate,
)
from hectr_tpu.control.simulate import LinearModel, Plant, simulate

__all__ = [
    "rk4_step", "stiff_step", "expm", "c2d", "pinv_cutoff",
    "dare", "dlqr", "dlqe", "quadprog",
    "horizon_matrices", "mpc_gains", "ctr_mpc", "MPCBounds",
    "weighting_matrices", "estimator_gains", "selector_matrix",
    "measure", "measure_forward", "select_target", "estimate_forward",
    "actuate", "LinearModel", "Plant", "simulate",
]
