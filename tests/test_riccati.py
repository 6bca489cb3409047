"""Riccati / LQR / LQE solver tests (cross-checked against scipy)."""

import numpy as np
import scipy.linalg

from hectr_tpu.control.riccati import dare, dlqe, dlqr

A = np.array([[0.8, 1.0], [0.0, 0.9]])
B = np.array([[-1.0], [2.0]])
Q = np.eye(2)
R = np.eye(1)


def test_dare_fixed_point_matches_scipy():
    X = dare(A, B, Q, R)
    X_ref = scipy.linalg.solve_discrete_are(A, B, Q, R)
    np.testing.assert_allclose(X, X_ref, rtol=1e-8)
    # Riccati residual
    res = A.T @ X @ A - X \
        - A.T @ X @ B @ np.linalg.inv(R + B.T @ X @ B) @ B.T @ X @ A + Q
    assert np.max(np.abs(res)) < 1e-8


def test_dlqr_stabilizes():
    G, X = dlqr(A, B, Q, R)
    eig = np.linalg.eigvals(A - B @ G)
    assert np.all(np.abs(eig) < 1.0)
    # G formula parity
    np.testing.assert_allclose(
        G, np.linalg.inv(B.T @ X @ B + R) @ (B.T @ X @ A), rtol=1e-10)


def test_dlqe_dual_of_dlqr():
    C = np.array([[1.0, 0.0]])
    Qw = np.eye(2) * 1e-5
    Rv = np.eye(1) * 1e-5
    L = dlqe(A, C, Qw, Rv)
    # Estimator error dynamics stable
    eig = np.linalg.eigvals(A - L @ C @ A)
    assert np.all(np.abs(eig) < 1.0)
    X = scipy.linalg.solve_discrete_are(A.T, C.T, Qw, Rv)
    L_ref = X @ C.T @ np.linalg.inv(C @ X @ C.T + Rv)
    np.testing.assert_allclose(L, L_ref, rtol=1e-7)
