"""CSTR plant + closed-loop golden-parity tests.

  * cstr-ode.txt: open-loop RK4 vs stiff integrator, 5 steps at dt=1
    (writer: reference tests/hectr.c:530-556, printed %9.6f -> 1e-5 bar).
  * cstr-mpc.bin: the plaintext MPC closed loop, 41 steps (writer:
    reference tests/hectr.c:743-757; full-precision doubles).
"""

import jax.numpy as jnp
import numpy as np

from hectr_tpu.control.ode import rk4_step, stiff_step
from hectr_tpu.control.plants.cstr import (
    CSTR_STEADY_STATE,
    cstr_jacobian,
    cstr_linearize,
    cstr_ode,
)
from hectr_tpu.control.simulate import LinearModel, Plant, simulate
from tests.conftest import load_golden_traj_bin, load_golden_txt


def test_cstr_ode_golden():
    xs = CSTR_STEADY_STATE["xs"]
    u = jnp.array([290.0, 0.1])   # open-loop step change (tests/hectr.c:536-538)
    p = jnp.array([0.1])
    x45 = jnp.asarray(xs)
    x15 = jnp.asarray(xs)
    rows = [[0.0, float(x45[0]), float(x45[1]), float(x15[0]), float(x15[1])]]
    for i in range(1, 6):
        x45 = rk4_step(cstr_ode, x45, u, p, 1.0)
        x15 = stiff_step(cstr_ode, cstr_jacobian, x15, u, p, 1.0)
        rows.append([float(i), float(x45[0]), float(x45[1]),
                     float(x15[0]), float(x15[1])])
    golden = load_golden_txt("cstr-ode.txt")
    np.testing.assert_allclose(np.array(rows), golden, atol=2e-6)


def make_cstr_setup():
    """The cstr-mpc/cstr-hempc test configuration
    (reference tests/hectr.c:699-744)."""
    ss = CSTR_STEADY_STATE
    dt = 1.0
    A, B, Bp = cstr_linearize(ss["xs"], ss["us"], ss["ps"], dt)
    nx, nu, nd = 3, 2, 2
    model = LinearModel(
        A=A, B=B, C=np.eye(nx),
        Bd=np.zeros((nx, nd)),
        Cd=np.array([[1.0, 0.0], [0.0, 0.0], [0.0, 1.0]]),
        Hr=np.array([[1.0, 0, 0], [0, 0, 1.0]]),
    )
    plant = Plant(ode=cstr_ode, jacobian=cstr_jacobian,
                  xs=ss["xs"], us=ss["us"], ps=ss["ps"])
    N = 40
    p_seq = np.zeros((N, 1))
    p_seq[9:, 0] = 0.1 * ss["ps"][0]   # +10% inlet-flow disturbance from k=9
    return model, plant, p_seq, dt, N


def test_cstr_linearize_sane():
    ss = CSTR_STEADY_STATE
    A, B, Bp = cstr_linearize(ss["xs"], ss["us"], ss["ps"], 1.0)
    assert A.shape == (3, 3) and B.shape == (3, 2) and Bp.shape == (3, 1)
    # Discretised plant must be stable at the steady state
    assert np.all(np.abs(np.linalg.eigvals(A)) < 1.0 + 1e-9)


def test_cstr_mpc_closed_loop_golden():
    model, plant, p_seq, dt, N = make_cstr_setup()
    x, u = simulate(model, plant, p_seq, dt, N)
    golden = load_golden_traj_bin("cstr-mpc.bin")          # [41, 5]
    ours = np.hstack([x, np.vstack([u, u[-1:]])])          # [41, 5]
    # Channel scales differ wildly (c ~ 0.9, T ~ 320); assert per-channel
    # absolute deviation well inside the %13g print precision.
    err = np.max(np.abs(ours - golden), axis=0)
    scale = np.max(np.abs(golden), axis=0)
    assert np.all(err / scale < 1e-6), (err, scale, err / scale)


def test_cstr_lqr_closed_loop_golden():
    """LQR regulator plug-in vs the reference's committed cstr-lqr
    artifacts (their generator ctr_control is commented out at
    src/ctr.c:423 -- the goldens are from an earlier LQR-based variant,
    and this loop reproduces them at txt print precision)."""
    from hectr_tpu.control.simulate import make_lqr_regulator
    from tests.conftest import GOLDEN_DIR

    model, plant, p_seq, dt, N = make_cstr_setup()
    reg = make_lqr_regulator(model, plant)
    x, u = simulate(model, plant, p_seq, dt, N, regulator=reg)
    golden = np.loadtxt(GOLDEN_DIR / "cstr-lqr.txt")[:, 1:]  # drop k col
    ours = np.hstack([x, np.vstack([u, u[-1:]])])
    err = np.max(np.abs(ours - golden), axis=0)
    scale = np.max(np.abs(golden), axis=0)
    assert np.all(err / scale < 5e-6), (err, err / scale)
