"""Fused single-ciphertext regulator: differential acceptance.

The fused protocol (hempc.fused) computes u = (S-K) v1 + K v2 with ONE
packed encryption and ONE hoisted gemv per step -- algebraically
identical to the reference-shaped 4-ct pipeline (src/hempc.c:253-266),
so the closed loop must match the plaintext twin to the same bar the
reference's own artifact sets (<= 9.7e-11 per channel at logn=12,
tests/results/cstr-cmp.bin; we allow 5e-10 like test_hempc)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hectr_tpu.config import REFERENCE_HEMPC
from hectr_tpu.ckks import scheme as S
from hectr_tpu.ckks.context import make_context
from hectr_tpu.ckks.gemv import bsgs_rotations
from hectr_tpu.ckks.keyswitch import gen_rotation_keys
from hectr_tpu.control.simulate import simulate
from hectr_tpu.hempc import hempc_init_state
from hectr_tpu.hempc.fused import (
    enc_pack,
    fused_u_matrix,
    make_fused_materials,
    make_fused_regulator,
)
from tests.test_cstr import make_cstr_setup


def test_fused_matrix_algebra():
    """(S-K) v1 + K v2 == uhat + du for random operands (pure numpy:
    the packing algebra independent of any crypto)."""
    model, plant, _, _, _ = make_cstr_setup()
    from hectr_tpu.hempc.regulator import regulator_gains

    K_A, K_B = regulator_gains(model, plant, 4)
    M = fused_u_matrix(model, plant, 4, 16)
    rng = np.random.default_rng(0)
    for _ in range(5):
        xhat, uhat = rng.normal(size=3), rng.normal(size=2)
        xr, ur = rng.normal(size=3), rng.normal(size=2)
        w = np.zeros(16)
        w[:3], w[3:5] = xhat, uhat
        w[8:11], w[11:13] = xr, ur
        du = -(K_A @ (xhat - xr) + K_B @ (uhat - ur))
        np.testing.assert_allclose((M @ w)[:2], uhat + du[:2],
                                   rtol=0, atol=1e-12)


@pytest.mark.slow
def test_fused_closed_loop_differential():
    ctx = make_context(REFERENCE_HEMPC)
    keys = S.keygen(ctx, jax.random.PRNGKey(2024))
    rot_keys = gen_rotation_keys(ctx, keys, jax.random.PRNGKey(2025),
                                 rotations=bsgs_rotations(ctx.slots))
    model, plant, p_seq, dt, N = make_cstr_setup()

    x_pt, u_pt = simulate(model, plant, p_seq, dt, N)

    mats = make_fused_materials(ctx, rot_keys, model, plant, N // 10)
    reg = make_fused_regulator(ctx, keys, model, plant, N // 10, mats)
    x_he, u_he, (_, canary) = simulate(
        model, plant, p_seq, dt, N, regulator=reg,
        regulator_state=hempc_init_state(jax.random.PRNGKey(7)),
        return_state=True)

    xdiff = np.max(np.abs(x_pt - x_he), axis=0)
    udiff = np.max(np.abs(u_pt - u_he), axis=0)
    assert np.all(xdiff < 5e-10), xdiff
    assert np.all(udiff < 5e-10), udiff
    assert float(canary) < 1e-5, float(canary)


@pytest.mark.slow
def test_fused_single_step_matches_linear_law():
    """One fused encrypted step == the plaintext linear law, to CKKS
    noise (one enc/gemv/dec round; slow: ~2 min of keygen + eager
    crypto on a small host -- the fast gate keeps the pure-algebra and
    enc_pack layout tests, the slow gate adds this and the closed
    loop)."""
    ctx = make_context(REFERENCE_HEMPC)
    keys = S.keygen(ctx, jax.random.PRNGKey(3))
    rot_keys = gen_rotation_keys(ctx, keys, jax.random.PRNGKey(4),
                                 rotations=bsgs_rotations(ctx.slots))
    model, plant, _, _, _ = make_cstr_setup()
    mats = make_fused_materials(ctx, rot_keys, model, plant, 4)
    reg = make_fused_regulator(ctx, keys, model, plant, 4, mats)

    from hectr_tpu.control.simulate import make_mpc_regulator

    reg_pt = make_mpc_regulator(model, plant, 4)
    rng = np.random.default_rng(1)
    xhat = jnp.asarray(rng.normal(size=3) * 1e-2)
    uhat = jnp.asarray(rng.normal(size=2) * 1e-2)
    xr, ur = jnp.zeros(3), jnp.zeros(2)
    u_he, (_, canary) = reg(hempc_init_state(jax.random.PRNGKey(5)),
                            xhat, uhat, xr, ur)
    u_pt, _ = reg_pt(None, xhat, uhat, xr, ur)
    np.testing.assert_allclose(np.asarray(u_he), np.asarray(u_pt),
                               rtol=0, atol=1e-10)
    assert float(canary) < 1e-5


def test_enc_pack_layout():
    """enc_pack round-trips the packed slot layout."""
    ctx = make_context(REFERENCE_HEMPC)
    keys = S.keygen(ctx, jax.random.PRNGKey(9))
    xhat = jnp.asarray([1.0, 2.0, 3.0])
    uhat = jnp.asarray([4.0, 5.0])
    xr = jnp.asarray([6.0, 7.0, 8.0])
    ur = jnp.asarray([9.0, 10.0])
    ct = enc_pack(ctx, keys, xhat, uhat, xr, ur, jax.random.PRNGKey(10))
    re, im = S.decode_ri(ctx, S.decrypt(ctx, keys, ct))
    got = np.asarray(re)
    want = np.zeros(16)
    want[:5] = [1, 2, 3, 4, 5]
    want[8:13] = [6, 7, 8, 9, 10]
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-8)
    assert float(jnp.max(jnp.abs(im))) < 1e-5
