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
     regulator update (single closed-loop step), with the box honored
     to CKKS noise (the capped minimax clip cannot overshoot).
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
    clip_poly_coeffs, eta_for_domain, make_encrypted_pgd, pgd_domains,
    pgd_eta, pgd_reference, poly_clip_np)

# Small ring, deep chain: deg-7 clip = 4 rescale pairs, so the PGD
# needs (2 if input_kind="du" else 0) + 8 + iters*(2 + 8) data limbs of
# budget below k_in.
DEEP = CKKSPreset(name="deep-qp-test", logn=10, slots=16, scale_bits=50,
                  limb_bits=25, mult_depth=16, special_limbs=2,
                  digit_width=2)


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
    """Degree-7 minimax surrogate: < 5% of the hard projection on the
    fit domain; the capped variant never exceeds the box (this is what
    bounds constraint violation in the encrypted regulator)."""
    w = np.linspace(-2.0, 2.0, 4001)

    def ev(cs):
        return sum(c * w**e for c, e in zip(cs, range(1, 2 * len(cs), 2)))

    raw = clip_poly_coeffs(2.0, degree=7, cap=False)
    assert np.max(np.abs(ev(raw) - np.clip(w, -1, 1))) < 0.05
    capped = clip_poly_coeffs(2.0, degree=7, cap=True)
    p = ev(capped)
    assert np.max(np.abs(p)) <= 1.0 + 1e-12          # zero overshoot
    assert np.max(np.abs(p - np.clip(w, -1, 1))) < 0.10
    # tighter iteration domain -> tighter fit
    w = np.linspace(-1.5, 1.5, 4001)
    it = clip_poly_coeffs(1.5, degree=7, cap=False)
    assert np.max(np.abs(ev(it) - np.clip(w, -1, 1))) < 0.03
    # the legacy degree-3 fit really is ~12% (the round-1 test asserted
    # < 0.07 against a 0.117 truth -- keep the honest number on record)
    d3 = clip_poly_coeffs(2.0, degree=3, cap=False)
    assert 0.05 < np.max(np.abs(sum(
        c * w_**e for c, e, w_ in zip(
            d3, (1, 3), (np.linspace(-2, 2, 4001),) * 2))
        - np.clip(np.linspace(-2, 2, 4001), -1, 1))) < 0.12


def test_poly_clip_np_respects_box():
    """The per-slot folded evaluation honors heterogeneous boxes."""
    lb = np.array([-0.5, -0.02])
    ub = np.array([0.7, 0.005])
    mid, hw = (lb + ub) / 2, (ub - lb) / 2
    rng = np.random.default_rng(0)
    y = mid + hw * rng.uniform(-2, 2, size=(1000, 2))
    z = poly_clip_np(y, mid, hw, clip_poly_coeffs(2.0, degree=7))
    # capping holds exactly on the fit grid; off-grid excursions are
    # O(1e-8) relative (the polynomial between grid points)
    assert np.all(z <= ub + 1e-6) and np.all(z >= lb - 1e-6)


def test_pgd_domains_are_worst_case_bounds():
    """The per-slot fit domains really do bound every clip input: run
    the polynomial iteration on many random in-bound inputs and check
    no clip argument ever leaves its fit domain (this is the global-
    stability certificate -- outside the domain a degree-7 polynomial
    diverges, which is exactly the round-1 failure mode)."""
    from hectr_tpu.hempc.qp_enc import clip_coeffs_per_slot

    H, lb, ub, _ = _problem()
    mid, hw = (lb + ub) / 2, (ub - lb) / 2
    B0 = 3.0
    eta = min(2.0 / np.sum(np.linalg.eigvalsh(H)[[0, -1]]),
              eta_for_domain(H, lb, ub, B0, max_iter_domain=3.0))
    b0, b_it = pgd_domains(H, lb, ub, eta, B0)
    assert np.max(b_it) <= 3.0 + 1e-12
    cs0 = clip_coeffs_per_slot(b0, 7)
    cs_it = clip_coeffs_per_slot(b_it, 7)
    rng = np.random.default_rng(1)
    for _ in range(50):
        du = mid + hw * B0 * rng.uniform(-1, 1, lb.shape[0])
        z = poly_clip_np(du, mid, hw, cs0)
        assert np.all(np.abs(z - mid) <= hw * (1 + 1e-9))
        for _ in range(5):
            y = z - eta * (H @ (z - du))
            assert np.all(np.abs(y - mid) <= hw * b_it * (1 + 1e-9))
            z = poly_clip_np(y, mid, hw, cs_it)
            assert np.all(np.abs(z - mid) <= hw * (1 + 1e-9))


@pytest.mark.slow
def test_encrypted_pgd_matches_plaintext_mirror(crypto):
    ctx, keys, relin, rot = crypto
    H, lb, ub, du_unc = _problem()
    d = H.shape[0]
    iters = 2
    k_in = ctx.max_limbs - 2
    # a-priori input certificate for THIS problem instance
    mid, hw = (lb + ub) / 2, (ub - lb) / 2
    B0 = float(np.ceil(np.max(np.abs(du_unc - mid) / hw)))
    solve, eta = make_encrypted_pgd(ctx, relin, rot, H, lb, ub,
                                    k_in=k_in, iters=iters,
                                    degree=7, input_bound=B0)
    z = np.zeros(ctx.slots)
    z[:d] = du_unc
    pt = S.encode(ctx, (jnp.asarray(z), jnp.zeros(ctx.slots)), k_in)
    ct = S.encrypt(ctx, keys, pt, jax.random.PRNGKey(104))
    re, im = S.decode_ri(ctx, S.decrypt(ctx, keys, solve(ct)))
    got = np.asarray(re[:d])
    want = pgd_reference(H, du_unc, lb, ub, iters, eta,
                         degree=7, input_bound=B0)
    assert np.max(np.abs(got - want)) < 1e-4, np.abs(got - want)
    # the capped clip means the encrypted result honors the box
    assert np.all(got <= ub + 1e-5) and np.all(got >= lb - 1e-5)
    assert np.max(np.abs(np.asarray(im))) < 1e-5  # src/ctr.c:493-494 canary


@pytest.mark.slow
def test_constrained_encrypted_regulator_single_step(crypto):
    """Full regulator with bounds: encrypted output == plaintext mirror
    of (gemv pair -> PGD -> uhat + du), and the box is honored to CKKS
    noise (no 10% slack: the capped clip cannot overshoot)."""
    from hectr_tpu.control.plants import CSTR_STEADY_STATE, cstr_linearize
    from hectr_tpu.control.simulate import LinearModel, Plant
    from hectr_tpu.control.plants import cstr_jacobian, cstr_ode
    from hectr_tpu.hempc import hempc_init_state, make_hempc_regulator

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

    # deviations sized so the unconstrained optimum stays within the
    # design envelope (B0 ~ 4 halfwidths): polynomial HE is a bounded-
    # domain technique -- the envelope is the offline design contract,
    # and both accuracy and noise degrade ~B^{deg-1} beyond it
    xr = np.array([0.005, -0.2, 0.002])
    ur = np.array([0.1, 0.0005])
    xhat = xr + np.array([0.00125, -0.075, 0.0005])
    uhat = ur + np.array([0.05, 0.000125])

    # plaintext mirror quantities first (they also give the input
    # certificate B0 for this state)
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
    mid, hw = (lb + ub) / 2, (ub - lb) / 2
    B0 = float(np.ceil(np.max(np.abs(du_unc[:d] - mid) / hw)))

    reg = make_hempc_regulator(ctx, keys, rot, model, plant, horizon,
                               bounds=bounds, relin_key=relin,
                               qp_iters=iters, qp_input_bound=B0)
    u, (_, canary) = reg(hempc_init_state(jax.random.PRNGKey(105)),
                         jnp.asarray(xhat), jnp.asarray(uhat),
                         jnp.asarray(xr), jnp.asarray(ur))
    assert float(canary) < 1e-5, float(canary)

    eta = pgd_eta(H, lb, ub, B0)
    z = pgd_reference(H, du_unc[:d], lb, ub, iters, eta,
                      degree=7, input_bound=B0)
    u_want = uhat + z[:nu]
    assert np.max(np.abs(np.asarray(u) - u_want)) < 1e-4, (u, u_want)
    # the box is honored to CKKS noise -- capped clip, no relaxation
    assert np.all(np.asarray(u) - uhat <= np.asarray(bounds.dumax) + 1e-6)
    assert np.all(np.asarray(u) - uhat >= np.asarray(bounds.dumin) - 1e-6)


@pytest.mark.slow
def test_pgd_split_mats_as_jit_args(crypto):
    """The split API (make_encrypted_pgd_split) with the materials
    pytree threaded through jit ARGUMENTS is bit-identical to the
    closure-capture path -- this is the remote-TPU calling convention
    (the flagship-QP runner, scripts/run_flagship_qp_tpu.py)."""
    from hectr_tpu.hempc.qp_enc import make_encrypted_pgd_split

    ctx, keys, relin, rot = crypto
    H, lb, ub, du_unc = _problem()
    d = H.shape[0]
    mid, hw = (lb + ub) / 2, (ub - lb) / 2
    B0 = float(np.ceil(np.max(np.abs(du_unc - mid) / hw)))
    k_in = 18   # need = 2 (norm) + 6 (clip0) + 1*(2+6) = 16 <= 18 - 2
    mats, apply, eta = make_encrypted_pgd_split(
        ctx, relin, rot, H, lb, ub, k_in=k_in, iters=1, degree=3,
        input_bound=B0)
    solve, eta2 = make_encrypted_pgd(ctx, relin, rot, H, lb, ub,
                                     k_in=18, iters=1, degree=3,
                                     input_bound=B0)
    assert eta == eta2
    z = np.zeros(ctx.slots)
    z[:d] = du_unc
    pt = S.encode(ctx, (jnp.asarray(z), jnp.zeros(ctx.slots)), k_in)
    ct = S.encrypt(ctx, keys, pt, jax.random.PRNGKey(120))

    f = jax.jit(lambda data, m: apply(
        S.Ciphertext(data=data, scale=ctx.delta), m).data)
    got = np.asarray(f(ct.data, mats))
    want = np.asarray(solve(ct).data)
    assert np.array_equal(got, want)
