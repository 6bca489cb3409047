"""THE acceptance test: encrypted vs plaintext CSTR MPC closed loop.

Differential twin structure of the reference (SURVEY.md §4.3): run the
identical 41-step closed loop twice -- plaintext regulator vs encrypted
regulator -- and compare per-step trajectories.  Reference bar
(tests/results/cstr-cmp.bin): max deviation <= 9.7e-11 per channel at
CKKS parameters logn=12, Delta=2^50, slots=16.
"""

import jax
import numpy as np
import pytest

from hectr_tpu.config import REFERENCE_HEMPC
from hectr_tpu.ckks import scheme as S
from hectr_tpu.ckks.context import make_context
from hectr_tpu.ckks.keyswitch import gen_rotation_keys
from hectr_tpu.control.simulate import simulate
from hectr_tpu.hempc import hempc_init_state, make_hempc_regulator
from tests.conftest import load_golden_traj_bin
from tests.test_cstr import make_cstr_setup

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def crypto():
    ctx = make_context(REFERENCE_HEMPC)
    keys = S.keygen(ctx, jax.random.PRNGKey(2024))
    rot_keys = gen_rotation_keys(ctx, keys, jax.random.PRNGKey(2025))
    return ctx, keys, rot_keys


def test_encrypted_vs_plaintext_closed_loop(crypto):
    ctx, keys, rot_keys = crypto
    model, plant, p_seq, dt, N = make_cstr_setup()
    horizon = N // 10

    x_pt, u_pt = simulate(model, plant, p_seq, dt, N)

    reg = make_hempc_regulator(ctx, keys, rot_keys, model, plant, horizon)
    x_he, u_he, (_, canary) = simulate(
        model, plant, p_seq, dt, N, regulator=reg,
        regulator_state=hempc_init_state(jax.random.PRNGKey(7)),
        return_state=True)

    xdiff = np.max(np.abs(x_pt - x_he), axis=0)
    udiff = np.max(np.abs(u_pt - u_he), axis=0)
    print("max |x_pt - x_he| per channel:", xdiff)
    print("max |u_pt - u_he| per channel:", udiff)
    # reference achieved <= 9.7e-11; we require the same order
    assert np.all(xdiff < 5e-10), xdiff
    assert np.all(udiff < 5e-10), udiff
    # per-step imaginary-residue noise canary (src/ctr.c:493-494): the
    # max across ALL 40 decodes must clear the reference's bound
    assert float(canary) < 1e-5, float(canary)


def test_encrypted_loop_matches_reference_golden(crypto):
    """The encrypted trajectory must also match the reference's own
    committed cstr-hempc.bin within the plaintext-parity bar."""
    ctx, keys, rot_keys = crypto
    model, plant, p_seq, dt, N = make_cstr_setup()
    reg = make_hempc_regulator(ctx, keys, rot_keys, model, plant, N // 10)
    x_he, u_he = simulate(
        model, plant, p_seq, dt, N, regulator=reg,
        regulator_state=hempc_init_state(jax.random.PRNGKey(11)))
    golden = load_golden_traj_bin("cstr-hempc.bin")
    ours = np.hstack([x_he, np.vstack([u_he, u_he[-1:]])])
    err = np.max(np.abs(ours - golden), axis=0)
    scale = np.max(np.abs(golden), axis=0)
    assert np.all(err / scale < 1e-6), (err, err / scale)
