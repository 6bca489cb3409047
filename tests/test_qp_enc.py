"""Encrypted box-constrained QP (projected gradient over ciphertext).

Capability beyond the reference: its encrypted path is unconstrained
only (src/hempc.c:216-266); constrained MPC exists only in plaintext
via quadprog (src/mpc.c:411).  BASELINE.json's north star names
"encrypted QP iterations" explicitly.

Validation is layered (SURVEY.md §4 differential-twin style):
  1. plaintext PGD mirror -> exact active-set quadprog (algorithmic
     convergence, float64, no crypto),
  2. encrypted PGD -> plaintext PGD mirror (CKKS fidelity of the same
     fixed iteration),
  3. constrained encrypted regulator -> plaintext mirror of the full
     regulator update (single closed-loop step).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hectr_tpu.config import CKKSPreset
from hectr_tpu.ckks import scheme as S
from hectr_tpu.ckks.context import make_context
from hectr_tpu.ckks.keyswitch import gen_relin_key, gen_rotation_keys
from hectr_tpu.control.mpc import MPCBounds, mpc_gains, mpc_hessian
from hectr_tpu.control.qp import quadprog
from hectr_tpu.control.stages import weighting_matrices
from hectr_tpu.hempc.qp_enc import (
    clip_poly_coeffs, make_encrypted_pgd, pgd_reference)

# Small ring, deep chain: the PGD needs 6 + 8*iters limbs of budget
# (clip = 3 rescale pairs, each iteration = gemv pair + clip's 3 pairs).
DEEP = CKKSPreset(name="deep-qp-test", logn=10, slots=16, scale_bits=50,
                  limb_bits=25, mult_depth=12)


@pytest.fixture(scope="module")
def crypto():
    ctx = make_context(DEEP)
    keys = S.keygen(ctx, jax.random.PRNGKey(100))
    relin = gen_relin_key(ctx, keys, jax.random.PRNGKey(101))
    rot = gen_rotation_keys(ctx, keys, jax.random.PRNGKey(102))
    return ctx, keys, relin, rot


def _problem(seed=3, d=8):
    rng = np.random.default_rng(seed)
    H = rng.standard_normal((d, d))
    H = H @ H.T + d * np.eye(d)
    lb = np.full(d, -0.5)
    ub = np.full(d, 0.7)
    du_unc = rng.standard_normal(d) * 0.8
    return H, lb, ub, du_unc


def test_pgd_reference_converges_to_quadprog():
    """Plaintext mirror with true clipping -> exact active-set optimum
    (min 1/2 z'Hz + c'z, c = -H du_unc, box bounds)."""
    H, lb, ub, du_unc = _problem()
    d = H.shape[0]
    c = -H @ du_unc
    w_exact = quadprog(H, c, lb=lb, ub=ub, w0=np.zeros(d))
    z = pgd_reference(H, du_unc, lb, ub, iters=200,
                      eta=2.0 / np.sum(np.linalg.eigvalsh(H)[[0, -1]]),
                      poly_clip=False)
    assert np.max(np.abs(z - np.asarray(w_exact))) < 1e-8


def test_poly_clip_accuracy():
    """Degree-3 clip surrogate stays within ~7% of the hard projection
    on its fit domain (drives the iterate toward the box even if not
    exactly onto it)."""
    c1, c3 = clip_poly_coeffs(2.0)
    w = np.linspace(-2.0, 2.0, 401)
    err = np.abs(c1 * w + c3 * w**3 - np.clip(w, -1, 1))
    assert np.max(err) < 0.07


def test_encrypted_pgd_matches_plaintext_mirror(crypto):
    ctx, keys, relin, rot = crypto
    H, lb, ub, du_unc = _problem()
    d = H.shape[0]
    iters = 2
    k_in = ctx.max_limbs - 2
    solve, eta = make_encrypted_pgd(ctx, relin, rot, H, lb, ub,
                                    k_in=k_in, iters=iters)
    z = np.zeros(ctx.slots)
    z[:d] = du_unc
    pt = S.encode(ctx, (jnp.asarray(z), jnp.zeros(ctx.slots)), k_in)
    ct = S.encrypt(ctx, keys, pt, jax.random.PRNGKey(104))
    re, im = S.decode_ri(ctx, S.decrypt(ctx, keys, solve(ct)))
    got = np.asarray(re[:d])
    want = pgd_reference(H, du_unc, lb, ub, iters, eta)
    assert np.max(np.abs(got - want)) < 1e-4, np.abs(got - want)
    assert np.max(np.abs(np.asarray(im))) < 1e-5  # src/ctr.c:493-494 canary


def test_constrained_encrypted_regulator_single_step(crypto):
    """Full regulator with bounds: encrypted output == plaintext mirror
    of (gemv pair -> PGD -> uhat + du)."""
    from hectr_tpu.control.plants import CSTR_STEADY_STATE, cstr_linearize
    from hectr_tpu.control.simulate import LinearModel, Plant
    from hectr_tpu.control.plants import cstr_jacobian, cstr_ode
    from hectr_tpu.hempc import make_hempc_regulator

    ctx, keys, relin, rot = crypto
    ss = CSTR_STEADY_STATE
    A, B, _ = cstr_linearize(ss["xs"], ss["us"], ss["ps"], 1.0)
    model = LinearModel(
        A=A, B=B, C=np.eye(3), Bd=np.zeros((3, 2)),
        Cd=np.array([[1.0, 0.0], [0.0, 0.0], [0.0, 1.0]]),
        Hr=np.array([[1.0, 0, 0], [0, 0, 1.0]]))
    plant = Plant(ode=cstr_ode, jacobian=cstr_jacobian,
                  xs=ss["xs"], us=ss["us"], ps=ss["ps"])
    horizon, nu, ny, nx = 4, 2, 3, 3
    bounds = MPCBounds(dumin=np.array([-0.02, -0.005]),
                       dumax=np.array([0.02, 0.005]))
    iters = 2
    reg = make_hempc_regulator(ctx, keys, rot, model, plant, horizon,
                               bounds=bounds, relin_key=relin,
                               qp_iters=iters)

    xhat = np.array([0.01, -0.5, 0.004])
    uhat = np.array([0.3, 0.001])
    xr = np.array([0.005, -0.2, 0.002])
    ur = np.array([0.1, 0.0005])
    u, _ = reg(jax.random.PRNGKey(105), jnp.asarray(xhat),
               jnp.asarray(uhat), jnp.asarray(xr), jnp.asarray(ur))

    # plaintext mirror
    Q, R = weighting_matrices(plant.xs, plant.us)
    K_A, K_B = mpc_gains(ny, nx, nu, horizon, model.A, model.B, model.C,
                         Q, R)
    H = mpc_hessian(ny, nx, nu, horizon, model.A, model.B, model.C, Q, R)
    s = ctx.slots
    xd = np.zeros(s); xd[:nx] = xhat - xr
    ud = np.zeros(s); ud[:nu] = uhat - ur
    KAz = np.zeros((s, s)); KAz[:K_A.shape[0], :K_A.shape[1]] = K_A
    KBz = np.zeros((s, s)); KBz[:K_B.shape[0], :K_B.shape[1]] = K_B
    du_unc = -(KAz @ xd + KBz @ ud)
    d = nu * horizon
    lb = np.tile(bounds.dumin, horizon)
    ub = np.tile(bounds.dumax, horizon)
    _, eta = make_encrypted_pgd(ctx, relin, rot, H, lb, ub,
                                k_in=ctx.max_limbs - 2, iters=iters)
    z = pgd_reference(H, du_unc[:d], lb, ub, iters, eta)
    u_want = uhat + z[:nu]
    assert np.max(np.abs(np.asarray(u) - u_want)) < 1e-4, (u, u_want)
    # the clipped step must actually respect the (slightly relaxed) box
    assert np.all(np.asarray(u) - uhat <= np.asarray(bounds.dumax) * 1.1 + 1e-9)
    assert np.all(np.asarray(u) - uhat >= np.asarray(bounds.dumin) * 1.1 - 1e-9)
