"""Closed-loop simulation: estimator -> target selector -> regulator ->
plant, as a single jitted lax.scan.

Capability of reference src/ctr.c `ctr_simulate` (src/ctr.c:363-443) and
`hectr_simulate` (src/ctr.c:500-618).  The two reference loops are
structurally identical; only the regulator differs (plaintext MPC vs
enc -> encrypted MPC -> dec).  Here that twin structure is explicit: the
regulator is a pluggable function, and the encrypted closed loop
(hectr_tpu.hempc) reuses this same scan with an encrypted regulator --
the differential plaintext-vs-encrypted test compares the two.

TPU-first design notes:
  * All per-step state updates are small dense mat-vecs with static
    shapes; the whole N-step loop is one `lax.scan` under `jit` -- no
    per-step Python dispatch, no recompilation across steps.
  * The MPC gains (K_A, K_B) are precomputed once at setup
    (hectr_tpu.control.mpc.mpc_gains), fixing the reference's per-step
    Hessian-inverse recompute (src/hempc.c:232-238 called from the loop
    at src/ctr.c:589).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from hectr_tpu.control.mpc import mpc_gains
from hectr_tpu.control.stages import (
    actuate,
    estimate_forward,
    estimator_gains,
    measure,
    measure_forward,
    select_target,
    selector_matrix,
    weighting_matrices,
)


@dataclasses.dataclass(frozen=True)
class LinearModel:
    """Discrete-time linear controller model + disturbance model +
    setpoint selector (reference ctr_simulate signature,
    src/hectr.h:109-126)."""

    A: np.ndarray    # [nx, nx]
    B: np.ndarray    # [nx, nu]
    C: np.ndarray    # [ny, nx]
    Bd: np.ndarray   # [nx, nd]
    Cd: np.ndarray   # [ny, nd]
    Hr: np.ndarray   # [nu, ny]


@dataclasses.dataclass(frozen=True)
class Plant:
    """Nonlinear plant callbacks + steady-state offsets (deviation <->
    positional conversion happens in `actuate`)."""

    ode: Callable        # (x, u, p) -> xdot
    jacobian: Callable   # (x, u, p) -> d(xdot)/dx
    xs: np.ndarray
    us: np.ndarray
    ps: np.ndarray


# A regulator maps (state, xhat, uhat, xr, ur) -> (u, state).  `state`
# threads through the scan carry (e.g. a PRNG key for the encrypted
# regulator); the plaintext regulator is stateless (state=None).
Regulator = Callable[[Any, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray],
                     tuple[jnp.ndarray, Any]]


def make_mpc_regulator(model: LinearModel, plant: Plant, horizon: int) -> Regulator:
    """The plaintext unconstrained-MPC regulator with precomputed gains.

    u = uhat + du[0:nu], du = -(K_A (xhat-xr) + K_B (uhat-ur)).
    Equivalent to reference ctr_mpc in the closed loop (src/ctr.c:425
    with no bounds -> src/mpc.c:412-418).
    """
    ny, nx = np.shape(model.C)
    nu = np.shape(model.B)[1]
    Q, R = weighting_matrices(plant.xs, plant.us)
    K_A, K_B = mpc_gains(ny, nx, nu, horizon, model.A, model.B, model.C, Q, R)
    K_A = jnp.asarray(K_A[:nu])   # only the first input block is applied
    K_B = jnp.asarray(K_B[:nu])

    def regulator(state, xhat, uhat, xr, ur):
        du = -(K_A @ (xhat - xr) + K_B @ (uhat - ur))
        return uhat + du, state

    return regulator


def make_lqr_regulator(model: LinearModel, plant: Plant) -> Regulator:
    """LQR regulator plug-in: u = -G (xhat - xr) + ur with the DLQR
    gain (reference ctr_control, src/ctr.c:282-292 -- present but
    commented out of the loop at src/ctr.c:423; its golden artifacts
    cstr-lqr.{txt,bin} are reproduced by this plug-in)."""
    from hectr_tpu.control.riccati import dlqr
    from hectr_tpu.control.stages import lqr_control

    Q, R = weighting_matrices(plant.xs, plant.us)
    G, _ = dlqr(model.A, model.B, Q, R)
    Gj = jnp.asarray(G, jnp.float64)

    def regulator(state, xhat, uhat, xr, ur):
        return lqr_control(Gj, xhat, xr, ur), state

    return regulator


def simulate(
    model: LinearModel,
    plant: Plant,
    p_seq: np.ndarray,
    dt: float,
    N: int,
    regulator: Regulator | None = None,
    regulator_state: Any = None,
    horizon: int | None = None,
    rsp: np.ndarray | None = None,
    return_state: bool = False,
):
    """Run the closed loop N steps; returns positional (x [N+1, nx],
    u [N, nu]), plus the final regulator state if `return_state` (the
    encrypted regulator threads a noise canary through it -- parity
    with the reference's per-decode assert, src/ctr.c:493-494).

    Parity: reference ctr_simulate (src/ctr.c:363-443) /
    hectr_simulate (src/ctr.c:500-618):
      * horizon defaults to N // 10 (src/ctr.c:373,510),
      * x0 = xhatm0 = dhatm0 = 0 (deviation variables),
      * per step: measure -> Kalman measurement update -> target
        selector -> regulator (uhat = previous u; at k=0, uhat = ur) ->
        actuate nonlinear plant -> Kalman time update,
      * outputs converted to positional units via (xs, us).
    """
    horizon = N // 10 if horizon is None else horizon
    if regulator is None:
        regulator = make_mpc_regulator(model, plant, horizon)

    ny, nx = np.shape(model.C)
    nu = np.shape(model.B)[1]

    Lx, Ld = estimator_gains(model.A, model.B, model.C, model.Bd, model.Cd,
                             plant.xs)
    Ginv = selector_matrix(model.A, model.B, model.C, model.Hr)

    f64 = jnp.float64
    A, B, C = (jnp.asarray(m, f64) for m in (model.A, model.B, model.C))
    Bd, Cd, Hr = (jnp.asarray(m, f64) for m in (model.Bd, model.Cd, model.Hr))
    Lx, Ld, Ginv = (jnp.asarray(m, f64) for m in (Lx, Ld, Ginv))
    xs, us, ps = (jnp.asarray(v, f64) for v in
                  (plant.xs, plant.us, plant.ps))
    rsp_v = jnp.zeros(nu, f64) if rsp is None else jnp.asarray(rsp, f64)
    p_seq = jnp.asarray(p_seq, f64).reshape(N, -1)
    nd = model.Bd.shape[1]

    def step(carry, inp):
        x, xhatm, dhatm, u_prev, reg_state = carry
        k, p_k = inp
        y = measure(C, x)
        xhat, dhat = measure_forward(C, Cd, Lx, Ld, y, xhatm, dhatm)
        xr, ur = select_target(Bd, Cd, Hr, Ginv, dhat, rsp_v)
        uhat = jnp.where(k == 0, ur, u_prev)
        u, reg_state = regulator(reg_state, xhat, uhat, xr, ur)
        x_next = actuate(plant.ode, plant.jacobian, x, u, p_k, xs, us, ps, dt)
        xhatm_n, dhatm_n = estimate_forward(A, B, Bd, xhat, dhat, u)
        return (x_next, xhatm_n, dhatm_n, u, reg_state), (x, u)

    init = (
        jnp.zeros(nx, f64),
        jnp.zeros(nx, f64),
        jnp.zeros(nd, f64),
        jnp.zeros(nu, f64),
        regulator_state,
    )
    ks = jnp.arange(N)
    carry, (x_traj, u_traj) = jax.lax.scan(step, init, (ks, p_seq))
    x_final = carry[0]

    x_all = jnp.vstack([x_traj, x_final[None, :]]) + xs[None, :]
    u_all = u_traj + us[None, :]
    if return_state:
        return np.asarray(x_all), np.asarray(u_all), carry[4]
    return np.asarray(x_all), np.asarray(u_all)
