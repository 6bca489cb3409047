"""Fixed-step ODE integrators (jittable JAX).

Capabilities of reference src/ode.c: `ode45` is a classic fixed-step
RK4 (src/ode.c:25-63); `ode15s` is a one-step linearly-implicit
(Rosenbrock-style) stiff update x' = x + dt*(I - dt*J)^-1 f(x)
(src/ode.c:65-95).  We keep those exact numerical schemes -- the golden
trajectories depend on them -- but expose them as pure functions over
`f(x, u, p)` so they jit/vmap/scan cleanly.
"""

from __future__ import annotations

import jax
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
    return x + dt * solve_dense(A, f(x, u, p))


def solve_dense(A, b):
    """Jittable dense solve via Gauss-Jordan with partial pivoting.

    jnp.linalg.solve lowers to an LuDecomposition custom call that the
    TPU backend only implements for f32/c64 -- the f64 control math
    (required for the 1e-10 differential bar, DESIGN.md §3) fails to
    compile on-chip.  Gauss-Jordan is pure elementwise/gather work,
    which XLA's emulated f64 handles on every backend; on the
    well-conditioned small systems of the control stack (nx <= 4 here)
    it matches the LAPACK path to ~1e-14 relative."""
    n = A.shape[0]
    M = jnp.concatenate([A, b.reshape(n, -1).astype(A.dtype)], axis=1)

    def body(k, M):
        col = jnp.abs(M[:, k])
        col = jnp.where(jnp.arange(n) < k, -jnp.inf, col)  # pivot below k
        piv = jnp.argmax(col)
        rk, rp = M[k], M[piv]
        M = M.at[k].set(rp).at[piv].set(rk)
        rowk = M[k] / M[k, k]
        M = M.at[k].set(rowk)
        factors = M[:, k].at[k].set(0.0)
        return M - factors[:, None] * rowk[None, :]

    M = jax.lax.fori_loop(0, n, body, M)
    return M[:, n:].reshape(b.shape)
