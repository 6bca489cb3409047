"""The encrypted MPC regulator, pluggable into the closed-loop scan.

Mirrors the reference flow exactly (src/ctr.c:587-590 per step):
  hectr_enc_states: d2z-embed + encode + pk-encrypt (xhat, uhat, xr, ur)
  ctr_hempc:        2x he_sub, 2x he_gemv, he_add, he_neg,
                    he_copy+he_moddown, he_add     (src/hempc.c:253-266)
  hectr_dec_state:  decrypt + decode, take first nu slots
                    (src/ctr.c:483-498)

Everything is jittable: the whole 40-step encrypted closed loop
compiles into a single lax.scan via hectr_tpu.control.simulate with
this regulator plugged in -- the TPU-native analogue of the reference's
per-step GPQHE calls, with no per-step host round-trips.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from hectr_tpu.ckks import scheme as S
from hectr_tpu.ckks.context import CKKSContext
from hectr_tpu.ckks.gemv import make_gemv
from hectr_tpu.ckks.scheme import KeySet
from hectr_tpu.control.mpc import mpc_gains
from hectr_tpu.control.simulate import LinearModel, Plant
from hectr_tpu.control.stages import weighting_matrices


def make_hempc_regulator(ctx: CKKSContext, keys: KeySet, rot_keys: dict,
                         model: LinearModel, plant: Plant, horizon: int):
    """Build the encrypted regulator closure.  The regulator state is a
    jax PRNG key (fresh encryption randomness every step)."""
    ny, nx = np.shape(model.C)
    nu = np.shape(model.B)[1]
    assert ctx.slots >= nu * horizon, (ctx.slots, nu * horizon)
    Q, R = weighting_matrices(plant.xs, plant.us)
    K_A, K_B = mpc_gains(ny, nx, nu, horizon, model.A, model.B, model.C, Q, R)
    # d2z_matrix zero-embedding into the slots x slots layout
    # (src/hempc.c:187,195 via src/matrices.c:133-141); the gemv
    # closures precompute diagonal plaintexts + stacked keys eagerly
    k_top = ctx.max_limbs
    gemv_A = make_gemv(ctx, K_A, k_top, rot_keys)
    gemv_B = make_gemv(ctx, K_B, k_top, rot_keys)

    def enc_vec(v, key):
        # d2z_vector parity (src/matrices.c:124-131): zero-extend the
        # real vector into the slot space; real-pair encode (no
        # complex dtypes -- TPU has no complex128)
        zre = jnp.zeros(ctx.slots, dtype=jnp.float64).at[: v.shape[0]].set(v)
        zim = jnp.zeros(ctx.slots, dtype=jnp.float64)
        return S.encrypt(ctx, keys, S.encode(ctx, (zre, zim), k_top), key)

    def regulator(state, xhat, uhat, xr, ur):
        key = state
        key, k1, k2, k3, k4 = jax.random.split(key, 5)
        ct_xhat = enc_vec(xhat, k1)
        ct_uhat = enc_vec(uhat, k2)
        ct_xr = enc_vec(xr, k3)
        ct_ur = enc_vec(ur, k4)
        # --- encrypted regulator (server side) -----------------------
        xdiff = S.sub(ctx, ct_xhat, ct_xr)
        udiff = S.sub(ctx, ct_uhat, ct_ur)
        gA = gemv_A(xdiff)
        gB = gemv_B(udiff)
        du = S.neg(ctx, S.add(ctx, gA, gB))
        ct_u = S.add(ctx, S.mod_down_pair(ctx, ct_uhat), du)
        # --- back across the trust boundary --------------------------
        re, _ = S.decode_ri(ctx, S.decrypt(ctx, keys, ct_u))
        u = re[:nu]
        return u, key

    return regulator
