"""Constrained encrypted MPC at FLAGSHIP scale (logN=15, L=20).

VERDICT r2 #3: the north-star "encrypted QP iterations" at the
north-star parameters, previously verified only separately (encrypted
QP at a logn=10 test preset; flagship loop unconstrained).  Here the
full closed loop runs with ACTIVE du box constraints solved over
ciphertext by the fixed-iteration projected-gradient solver, at the
flagship chain.

Depth ledger (hempc.qp_enc.pgd_limbs_required, DESIGN.md §2.2): the
gemv pair leaves k_in = 20 data limbs; deg-7 clips at 1 PGD iteration
consume exactly 18, landing on the 2 base limbs.  (The deg-7/2-iter
default needs 28 -- that is what the FLAGSHIP_QP preset's 5 extra
rescale levels are for; its ledger is asserted here without paying for
a second logN=15 loop.)

The differential twin is the PLAINTEXT MIRROR of the same control law
(make_pgd_mirror_regulator: same fixed iteration, same per-slot
minimax clip polynomials on the same certified domains) -- polynomial
PGD at fixed iteration count is its own deterministic control law, and
the encrypted loop must reproduce it to CKKS noise.  The mirror also
threads the input-certificate residual through the scan, so the test
proves the offline envelope (input_bound) actually covered every step.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hectr_tpu.config import FLAGSHIP, FLAGSHIP_QP
from hectr_tpu.ckks import scheme as S
from hectr_tpu.ckks.context import make_context
from hectr_tpu.ckks.keyswitch import gen_relin_key, gen_rotation_keys
from hectr_tpu.control.mpc import MPCBounds
from hectr_tpu.control.simulate import simulate
from hectr_tpu.hempc import hempc_init_state, make_hempc_regulator
from hectr_tpu.hempc.qp_enc import (
    make_pgd_mirror_regulator,
    pgd_limbs_required,
)
from tests.test_cstr import make_cstr_setup

# du bounds chosen to BIND during the disturbance transient (the
# unconstrained loop moves Tc by up to 0.35/step and F by 0.0048/step)
BOUNDS = MPCBounds(dumin=np.array([-0.25, -0.004]),
                   dumax=np.array([0.25, 0.004]))
B0 = 4.0          # offline input-envelope certificate (verified below;
                  # the F channel's tight box reaches |du_unc|/hw ~ 3.7)
ITERS = 1         # FLAGSHIP ledger: deg-7/1-iter = 18 limbs, exact fit
DEGREE = 7


def test_depth_ledger_fits_presets():
    """The documented ledger arithmetic for both flagship presets."""
    # FLAGSHIP: 22 data limbs, gemv pair -> k_in=20, base=2
    assert pgd_limbs_required(7, 1, "w_scaled") == 18 == 20 - 2
    # FLAGSHIP_QP: 32 data limbs -> k_in=30
    assert pgd_limbs_required(7, 2, "w_scaled") == 28 == 30 - 2
    assert FLAGSHIP.mult_depth * 2 + 2 == 22
    assert FLAGSHIP_QP.mult_depth * 2 + 2 == 32
    # the 2-iter default does NOT fit FLAGSHIP (this is why the test
    # below runs 1 iteration there)
    assert 20 - pgd_limbs_required(7, 2, "w_scaled") < 2


def _setup(N=6):
    model, plant, p_seq, dt, _ = make_cstr_setup()
    p_seq = p_seq[:N].copy()
    p_seq[:, 0] = 0.0
    p_seq[2:, 0] = 0.1 * plant.ps[0]     # +10% inlet flow from k=2
    return model, plant, p_seq, dt


def test_mirror_loop_binds_and_certifies():
    """Fast plaintext half: the mirror control law actually hits the
    box during the transient, honors it by construction, and the
    input-envelope certificate holds on every step."""
    model, plant, p_seq, dt = _setup()
    N = p_seq.shape[0]
    mirror = make_pgd_mirror_regulator(model, plant, 4, BOUNDS,
                                       iters=ITERS, degree=DEGREE,
                                       input_bound=B0)
    x_m, u_m, cert = simulate(
        model, plant, p_seq, dt, N, regulator=mirror, horizon=4,
        regulator_state=jnp.zeros((), jnp.float64), return_state=True)
    assert float(cert) <= B0, float(cert)      # envelope covered the loop
    du = np.diff(np.asarray(u_m), axis=0)
    assert np.all(du <= np.asarray(BOUNDS.dumax) + 1e-9)
    assert np.all(du >= np.asarray(BOUNDS.dumin) - 1e-9)
    # the constraint is ACTIVE (near-saturated) somewhere in the loop
    assert np.max(np.abs(du[:, 0])) > 0.8 * BOUNDS.dumax[0]


@pytest.mark.slow
def test_flagship_constrained_encrypted_vs_mirror():
    model, plant, p_seq, dt = _setup()
    N = p_seq.shape[0]
    horizon = 4

    mirror = make_pgd_mirror_regulator(model, plant, horizon, BOUNDS,
                                       iters=ITERS, degree=DEGREE,
                                       input_bound=B0)
    x_m, u_m, cert = simulate(
        model, plant, p_seq, dt, N, regulator=mirror, horizon=horizon,
        regulator_state=jnp.zeros((), jnp.float64), return_state=True)
    assert float(cert) <= B0, float(cert)

    ctx = make_context(FLAGSHIP)
    keys = S.keygen(ctx, jax.random.PRNGKey(31))
    relin = gen_relin_key(ctx, keys, jax.random.PRNGKey(32))
    rot_keys = gen_rotation_keys(ctx, keys, jax.random.PRNGKey(33))
    reg = make_hempc_regulator(ctx, keys, rot_keys, model, plant, horizon,
                               bounds=BOUNDS, relin_key=relin,
                               qp_iters=ITERS, qp_degree=DEGREE,
                               qp_input_bound=B0)
    x_he, u_he, (_, canary) = simulate(
        model, plant, p_seq, dt, N, regulator=reg, horizon=horizon,
        regulator_state=hempc_init_state(jax.random.PRNGKey(34)),
        return_state=True)

    xdiff = np.max(np.abs(np.asarray(x_m) - np.asarray(x_he)), axis=0)
    udiff = np.max(np.abs(np.asarray(u_m) - np.asarray(u_he)), axis=0)
    print("flagship-qp max |x_m - x_he| per channel:", xdiff)
    print("flagship-qp max |u_m - u_he| per channel:", udiff)
    assert np.all(xdiff < 1e-4), xdiff
    assert np.all(udiff < 1e-4), udiff
    # box honored over ciphertext (capped clip: no overshoot beyond
    # CKKS noise)
    du = np.diff(np.asarray(u_he), axis=0)
    assert np.all(du <= np.asarray(BOUNDS.dumax) + 1e-4)
    assert np.all(du >= np.asarray(BOUNDS.dumin) - 1e-4)
    assert np.max(np.abs(du[:, 0])) > 0.8 * BOUNDS.dumax[0]  # still active
    # per-decode imaginary-residue canary (src/ctr.c:493-494 parity)
    assert float(canary) < 1e-5, float(canary)
