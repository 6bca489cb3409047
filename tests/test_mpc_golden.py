"""MPC golden-parity tests against the reference's committed artifacts.

Reproduces tests/golden/mpc-tracking-{5..9,11,12}.txt (writer: reference
tests/hectr.c:614-694, mirroring PyAdvancedControl mpc_tracking.py) and
inverted-pendulum-mpc-control.txt (tests/hectr.c:861-931).  Golden files
print with %12.8f, so parity is asserted at 1e-6.
"""

import numpy as np
import pytest

from hectr_tpu.control.linalg import c2d
from hectr_tpu.control.mpc import MPCBounds, ctr_mpc
from tests.conftest import load_golden_txt

# 2-state tracking system (reference tests/hectr.c:583-612)
A = np.array([[0.8, 1.0], [0.0, 0.9]])
B = np.array([[-1.0], [2.0]])
C = np.eye(2)
Q = np.eye(2)
R = np.eye(1)
X0 = np.array([0.0, -1.0])
U0 = np.array([-0.1])
N = 30
R_SP1 = np.array([1.0, 0.25])   # tests 5-7 setpoint
R_SP0 = np.zeros(2)             # tests 8-12 setpoint


def propagate(A, B, x0, u):
    """Open-loop rollout (reference calc_xnew, tests/hectr.c:558-578)."""
    x = [np.asarray(x0, float)]
    for k in range(u.shape[0]):
        x.append(A @ x[-1] + B @ u[k])
    return np.array(x)


TRACKING = {
    5: (R_SP1, MPCBounds()),
    6: (R_SP1, MPCBounds(dumin=[-0.5], dumax=[0.5])),
    7: (R_SP1, MPCBounds(dumin=[-0.3], dumax=[0.2])),
    8: (R_SP0, MPCBounds(dumin=[-0.3], dumax=[0.2])),
    9: (R_SP0, MPCBounds(umin=[-0.3], umax=[0.1])),
    11: (R_SP0, MPCBounds(xmin=[-1.5, -2.5], xmax=[0.5, 0.2])),
    12: (R_SP0, MPCBounds(dumin=[-0.5], dumax=[0.5],
                          xmin=[-1.5, -2.5], xmax=[0.5, 0.2])),
}


@pytest.mark.parametrize("case", sorted(TRACKING))
def test_mpc_tracking_golden(case):
    # Golden provenance: the committed artifacts were generated with
    # ur=0 (the current reference test passes ur=u0,
    # tests/hectr.c:615, but its committed outputs only reproduce --
    # to print precision ~5e-9 -- with ur=0; verified by solving the
    # golden du sequence's KKT optimality conditions).  We match the
    # artifacts, which are the regression target.
    rsp, bounds = TRACKING[case]
    u = ctr_mpc(2, 2, 1, N, A, B, C, Q, R,
                xhat=X0, uhat=U0, xr=rsp, ur=np.zeros(1), bounds=bounds)
    y = propagate(A, B, X0, u)
    golden = load_golden_txt(f"mpc-tracking-{case}.txt")  # k, u, y0, y1
    u_col = np.append(u[:, 0], u[-1, 0])  # golden repeats u[N-1] at k=N
    np.testing.assert_allclose(u_col, golden[:, 1], atol=1e-6)
    np.testing.assert_allclose(y[:, 0], golden[:, 2], atol=1e-6)
    np.testing.assert_allclose(y[:, 1], golden[:, 3], atol=1e-6)


def test_inverted_pendulum_golden():
    # Inverted pendulum on a cart (reference tests/hectr.c:861-931)
    l_bar, mcar, mball, g = 2.0, 1.0, 0.3, 9.8
    n, m, l, Np, dt = 4, 1, 2, 30, 0.1
    Ac = np.array([
        [0, 1, 0, 0],
        [0, 0, mball * g / mcar, 0],
        [0, 0, 0, 1],
        [0, 0, g * (mcar + mball) / (l_bar * mcar), 0],
    ])
    Bc = np.array([[0.0], [1 / mcar], [0.0], [1 / (l_bar * mcar)]])
    Ad, Bint = c2d(Ac, dt)
    Bd = Bint @ Bc
    Cp = np.array([[0, 1, 0, 0], [0, 0, 1, 0]], dtype=float)
    Qp = np.eye(2)
    Rp = np.array([[0.01]])
    x0 = np.array([0, 0, 0.3, 0.0])
    u0 = np.zeros(1)
    u = ctr_mpc(l, n, m, Np, Ad, Bd, Cp, Qp, Rp,
                xhat=x0, uhat=u0, xr=np.zeros(4), ur=u0)
    x = propagate(Ad, Bd, x0, u)
    golden = load_golden_txt("inverted-pendulum-mpc-control.txt")
    # Golden provenance -- PROVEN, not assumed (see the companion test
    # below, which reproduces the artifact to 1e-6 by emulating two
    # reference defects this framework intentionally does not carry):
    #   1. the reference dexpm's ~1e-4 eigendecomposition error on the
    #      eps-filled augmented matrix (src/matrices.c:93-122 via
    #      src/ctr.c:28-48) perturbs Bd[0] by 8.7e-5;
    #   2. calc_horizon_matrices writes CC's k=0 block with row stride
    #      l(N+1) while CC's true row stride is n(N+1)
    #      (src/mpc.c:59 vs :93) -- invisible whenever l == n (all
    #      other goldens), corrupting the first measurement block here
    #      (l=2, n=4).
    # Our u is therefore asserted as the exact optimum of the correctly
    # built cost, plus coarse proximity to the artifact.
    u_col = np.append(u[:, 0], u[-1, 0])
    assert np.max(np.abs(u_col - golden[:, 1])) < 0.6
    assert np.max(np.abs(x - golden[:, 2:6])) < 0.15
    # our solution regulates the penalised outputs (velocity, angle)
    # toward zero, like the golden (cart position is unpenalised and
    # drifts in both)
    assert abs(x[-1, 1]) < 0.01      # velocity -> 0
    assert abs(x[-1, 2]) < 0.15      # angle small


def test_inverted_pendulum_golden_provenance_reproduced():
    """Constructive provenance proof for the committed pendulum golden:
    recover the (Ad, Bd) it was generated with from its own trajectory
    (pure least squares on x_{k+1} = Ad x_k + Bd u_k; residual ~1e-8 =
    print precision; the recovered Bd[0] differs from the true matrix
    exponential by 8.7e-5 -- the reference dexpm's error), then rebuild
    the reference's horizon matrices INCLUDING its CC stride bug
    (src/mpc.c:59 writes the k=0 block of the l(N+1) x n(N+1) matrix
    CC with row stride l(N+1) instead of n(N+1)) and solve the
    unconstrained MPC.  The result matches the committed artifact to
    1.3e-7 -- closing the round-1 open question: the 0.6-atol gap in
    the test above is entirely these two reference defects."""
    golden = load_golden_txt("inverted-pendulum-mpc-control.txt")
    X = golden[:, 2:6]
    l, n, m, N = 2, 4, 1, 30
    # recover the generating model from the trajectory
    Phi = np.hstack([X[:-1], golden[:-1, 1][:, None]])
    Th, *_ = np.linalg.lstsq(Phi, X[1:], rcond=None)
    Ad, Bd = Th[:4].T, Th[4:].T.reshape(4, 1)
    assert np.max(np.abs(Phi @ Th - X[1:])) < 1e-7  # exact propagation
    C = np.array([[0, 1, 0, 0], [0, 0, 1, 0]], float)
    Q = np.eye(2)
    R = np.array([[0.01]])
    lNp1, nNp1, mN = l * (N + 1), n * (N + 1), m * N
    AA = np.zeros((nNp1, n))
    BB = np.zeros((nNp1, m))
    Theta = np.zeros((nNp1, mN))
    CC = np.zeros(lNp1 * nNp1)
    QQ = np.zeros((lNp1, lNp1))
    RR = np.zeros((mN, mN))
    An = np.eye(n)
    AA[:n] = An
    QQ[:l, :l] = Q
    RR[:m, :m] = R
    for j in range(l * n):  # the k=0 stride bug, verbatim
        CC[(j // n) * lNp1 + j % n] = C.ravel()[j]
    for k in range(1, N + 1):
        BB[k * n:(k + 1) * n] = BB[(k - 1) * n:k * n] + An @ Bd
        An = An @ Ad
        AA[k * n:(k + 1) * n] = An
        for i in range(k, N + 1):
            Theta[i * n:(i + 1) * n,
                  (i - k) * m:(i - k + 1) * m] = BB[k * n:(k + 1) * n]
        QQ[k * l:(k + 1) * l, k * l:(k + 1) * l] = Q
        if k < N:
            RR[k * m:(k + 1) * m, k * m:(k + 1) * m] = R
        for j in range(l * n):  # k >= 1 uses the CORRECT stride
            CC[(k * l + j // n) * nNp1 + k * n + j % n] = C.ravel()[j]
    CC = CC.reshape(lNp1, nNp1)
    x0 = np.array([0, 0, 0.3, 0.0])
    e = -CC @ (AA @ x0)                      # uhat = ur = 0, r = 0
    H = Theta.T @ CC.T @ QQ @ CC @ Theta + RR
    c = Theta.T @ CC.T @ QQ @ e
    du = np.linalg.solve(H, c)
    u = np.cumsum(du)
    u_col = np.append(u, u[-1])
    assert np.max(np.abs(u_col - golden[:, 1])) < 1e-6
