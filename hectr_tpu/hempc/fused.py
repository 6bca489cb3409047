"""Fused single-ciphertext encrypted regulator: the TPU-first redesign
of the per-step protocol.

The reference's per-step encrypted dataflow (src/ctr.c:587-590 +
src/hempc.c:253-266) moves FOUR ciphertexts across the trust boundary
and runs 2 he_sub + 2 he_gemv + he_add/he_neg/he_moddown/he_add on the
server.  That shape is preserved in hempc.regulator for parity -- but
it is a CPU-library shape, not a law of the protocol.  Algebra:

    u = uhat + du,  du = -(K_A (xhat-xr) + K_B (uhat-ur))
      = (S - K) v1 + K v2

with v1 = [xhat; uhat], v2 = [xr; ur], K = [K_A | K_B] (first nu rows;
only u[:nu] is ever decoded, src/ctr.c:483-498), and S the selector
picking uhat out of v1.  So the whole step is ONE plaintext matrix
acting on ONE packed slot vector:

    w  = [v1 at slots 0..d-1 | v2 at slots s/2..s/2+d-1],   d = nx+nu
    M[:nu, 0:d] = S - K,   M[:nu, s/2:s/2+d] = K
    u  = (M w)[:nu]

One encrypt, one hoisted gemv (single digit decomposition shared by
every baby rotation), one decrypt -- instead of 4 encrypts, 2 gemvs
(2 hoists), and the add/neg/moddown glue.  At the flagship scale this
halves the key-switch work and quarters the encryption work per step
(VERDICT r4 #8).  Depth, scales and the noise canary are unchanged:
the only new noise term is uhat passing through a pt-ct multiply by an
encoded 1 instead of riding an unmultiplied moddown -- O(Delta^-1),
far below the closed-loop parity bar (proven by the differential test).

The constrained (QP) variant packs the same w but computes the FULL
du vector in w-scaled units (rows 0..m*horizon), feeds the encrypted
projected-gradient solver (hempc.qp_enc), and returns du; the client
-- which knows uhat, it sent it -- adds u = uhat + du[:nu] after
decryption.  Same information crosses the boundary; one fewer
ciphertext-alignment rotation on the server.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from hectr_tpu.ckks import scheme as S
from hectr_tpu.ckks.context import CKKSContext
from hectr_tpu.ckks.gemv import gemv_apply, gemv_materials
from hectr_tpu.ckks.scheme import KeySet
from hectr_tpu.hempc.regulator import regulator_gains


def pack_offset(slots: int, d: int) -> int:
    """Slot offset of v2 in the packed vector (v1 at 0..d-1, v2 at
    off..off+d-1).  s/2 keeps the two halves disjoint and the active
    gemv diagonals in two contiguous runs."""
    off = slots // 2
    assert off >= d, (
        f"packing needs slots >= 2*(nx+nu): slots={slots}, d={d}")
    return off


def fused_u_matrix(model, plant, horizon: int, slots: int) -> np.ndarray:
    """The single packed-gemv matrix for the UNCONSTRAINED regulator:
    rows 0..nu-1 compute u = uhat + du directly (see module docstring)."""
    K_A, K_B = regulator_gains(model, plant, horizon)
    nx = K_A.shape[1]
    nu = K_B.shape[1]
    d = nx + nu
    off = pack_offset(slots, d)
    K = np.hstack([K_A, K_B])[:nu]          # [nu, d]
    Ssel = np.zeros((nu, d))
    Ssel[:, nx:] = np.eye(nu)               # uhat selector out of v1
    M = np.zeros((slots, slots))
    M[:nu, :d] = Ssel - K
    M[:nu, off:off + d] = K
    return M


def fused_du_matrix(model, plant, horizon: int, slots: int,
                    gain_scale=None) -> np.ndarray:
    """The packed-gemv matrix for the CONSTRAINED path: rows
    0..m*horizon-1 compute du_unc = -K (v1 - v2) (optionally with the
    QP's per-row w-space normalization diag(gain_scale) folded in --
    free, it is plaintext)."""
    K_A, K_B = regulator_gains(model, plant, horizon)
    d = K_A.shape[1] + K_B.shape[1]
    mN = K_A.shape[0]
    off = pack_offset(slots, d)
    K = np.hstack([K_A, K_B])               # [mN, d]
    if gain_scale is not None:
        K = np.asarray(gain_scale)[:, None] * K
    M = np.zeros((slots, slots))
    M[:mN, :d] = -K
    M[:mN, off:off + d] = K
    return M


def make_fused_materials(ctx: CKKSContext, rot_keys: dict, model, plant,
                         horizon: int, method: str = "auto"):
    """Gemv materials (device-array pytree, thread through jit args)
    for the fused unconstrained regulator matrix."""
    M = fused_u_matrix(model, plant, horizon, ctx.slots)
    return gemv_materials(ctx, M, ctx.max_limbs, rot_keys, method=method)


def enc_pack(ctx: CKKSContext, keys: KeySet, xhat, uhat, xr, ur, key,
             k: int | None = None) -> S.Ciphertext:
    """ONE encryption of the packed vector w = [xhat,uhat | xr,ur]
    (the fused protocol's entire per-step upload)."""
    k = ctx.max_limbs if k is None else k
    nx = xhat.shape[0]
    nu = uhat.shape[0]
    d = nx + nu
    off = pack_offset(ctx.slots, d)
    z = (jnp.zeros(ctx.slots, jnp.float64)
         .at[:nx].set(xhat).at[nx:d].set(uhat)
         .at[off:off + nx].set(xr).at[off + nx:off + d].set(ur))
    zim = jnp.zeros(ctx.slots, jnp.float64)
    return S.encrypt(ctx, keys, S.encode(ctx, (z, zim), k), key)


def make_fused_regulator(ctx: CKKSContext, keys: KeySet, model, plant,
                         horizon: int, gemv_mats) -> "Regulator":
    """Fused unconstrained encrypted regulator, plug-compatible with
    control.simulate (state = (PRNG key, noise canary), same as
    hempc.regulator).  Per step: enc_pack -> one gemv -> decrypt;
    u = (M w)[:nu] directly."""
    nu = np.shape(model.B)[1]

    def regulator(state, xhat, uhat, xr, ur):
        key, canary = state
        key, k1 = jax.random.split(key)
        ct = enc_pack(ctx, keys, xhat, uhat, xr, ur, k1)
        ct_u = gemv_apply(ctx, gemv_mats, ct)
        re, im = S.decode_ri(ctx, S.decrypt(ctx, keys, ct_u))
        u = re[:nu]
        canary = jnp.maximum(canary, jnp.max(jnp.abs(im)))
        return u, (key, canary)

    return regulator
