"""Fixed-step ODE integrators (jittable JAX).

Capabilities of reference src/ode.c: `ode45` is a classic fixed-step
RK4 (src/ode.c:25-63); `ode15s` is a one-step linearly-implicit
(Rosenbrock-style) stiff update x' = x + dt*(I - dt*J)^-1 f(x)
(src/ode.c:65-95).  We keep those exact numerical schemes -- the golden
trajectories depend on them -- but expose them as pure functions over
`f(x, u, p)` so they jit/vmap/scan cleanly.
"""

from __future__ import annotations

import jax.numpy as jnp


def rk4_step(f, x, u, p, dt):
    """One classic 4th-order Runge-Kutta step of x' = f(x, u, p).

    Parity: reference `ode45` (src/ode.c:25-63) -- despite the name it
    is plain fixed-step RK4, not Dormand-Prince.
    """
    k1 = dt * f(x, u, p)
    k2 = dt * f(x + k1 / 2, u, p)
    k3 = dt * f(x + k2 / 2, u, p)
    k4 = dt * f(x + k3, u, p)
    return x + (k1 + 2 * k2 + 2 * k3 + k4) / 6


def stiff_step(f, jac, x, u, p, dt):
    """One linearly-implicit stiff step: x + dt * (I - dt*J)^-1 f(x).

    Parity: reference `ode15s` (src/ode.c:65-95) -- a single
    semi-implicit Euler / Rosenbrock stage using the analytic Jacobian,
    not MATLAB's variable-order NDF solver.  The closed-loop goldens
    integrate the CSTR plant with two of these substeps at dt/2
    (src/ctr.c:334-354).
    """
    n = x.shape[-1]
    J = jac(x, u, p)
    A = jnp.eye(n, dtype=x.dtype) - dt * J
    return x + dt * jnp.linalg.solve(A, f(x, u, p))
