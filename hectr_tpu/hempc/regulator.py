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
from hectr_tpu.ckks.gemv import gemv_apply, gemv_materials, make_gemv
from hectr_tpu.ckks.scheme import KeySet
from hectr_tpu.control.mpc import mpc_gains
from hectr_tpu.control.simulate import LinearModel, Plant
from hectr_tpu.control.stages import weighting_matrices


def regulator_gains(model: LinearModel, plant: Plant, horizon: int):
    """(K_A, K_B): the two plaintext controller gain matrices of the
    encrypted update du = -(K_A (xhat-xr) + K_B (uhat-ur))
    (src/hempc.c:117-196 calc_coeff, computed once, not per step)."""
    ny, nx = np.shape(model.C)
    nu = np.shape(model.B)[1]
    Q, R = weighting_matrices(plant.xs, plant.us)
    return mpc_gains(ny, nx, nu, horizon, model.A, model.B, model.C, Q, R)


def make_hempc_gemv_materials(ctx: CKKSContext, rot_keys: dict,
                              model: LinearModel, plant: Plant,
                              horizon: int, method: str = "auto"):
    """(mat_A, mat_B): the unconstrained regulator's gemv materials as
    device-array pytrees, built EAGERLY.  Thread these through jit
    arguments (make_hempc_regulator(..., gemv_mats=...)): closure
    capture lowers them as HLO literals, which both bloats the remote
    compile request and hands XLA's constant folder the encode/slice
    subgraphs to execute at compile time -- the dominant cost of the
    monolithic flagship compile (observed: constant-folding warnings,
    >40 min remote compiles)."""
    K_A, K_B = regulator_gains(model, plant, horizon)
    k_top = ctx.max_limbs
    return (gemv_materials(ctx, K_A, k_top, rot_keys, method=method),
            gemv_materials(ctx, K_B, k_top, rot_keys, method=method))


def hempc_init_state(key):
    """Initial regulator state: (PRNG key, imaginary-residue canary).

    The canary accumulates max |Im(decode)| across the loop -- the
    reference asserts it < 1e-5 on EVERY decode (src/ctr.c:493-494);
    here it is carried through the scan jit-compatibly and asserted by
    the caller after the loop."""
    return (key, jnp.zeros((), jnp.float64))


def make_hempc_regulator(ctx: CKKSContext, keys: KeySet, rot_keys: dict,
                         model: LinearModel, plant: Plant, horizon: int,
                         bounds=None, relin_key=None, qp_iters: int = 2,
                         qp_degree: int = 7, qp_input_bound=3.0,
                         gemv_mats=None):
    """Build the encrypted regulator closure.  The regulator state is a
    jax PRNG key (fresh encryption randomness every step).

    With `bounds` (an MPCBounds carrying dumin/dumax) and a relin_key,
    the regulator solves the box-constrained QP over ciphertext via
    fixed-iteration projected gradient (hectr_tpu.hempc.qp_enc) --
    capability beyond the reference, whose encrypted path is
    unconstrained-only (src/hempc.c:216-266).

    `gemv_mats` (from make_hempc_gemv_materials, unconstrained path
    only): precomputed gemv material pytrees, passed through jit
    arguments by the caller -- keeps the multi-hundred-MB key/plaintext
    stacks out of the compiled graph's literals (see the materials
    builder's docstring)."""
    ny, nx = np.shape(model.C)
    nu = np.shape(model.B)[1]
    assert ctx.slots >= nu * horizon, (ctx.slots, nu * horizon)
    Q, R = weighting_matrices(plant.xs, plant.us)
    K_A, K_B = mpc_gains(ny, nx, nu, horizon, model.A, model.B, model.C, Q, R)

    qp_solve = None
    gain_scale = None
    if bounds is not None and bounds.dumin is not None:
        from hectr_tpu.control.mpc import mpc_hessian
        from hectr_tpu.hempc.qp_enc import make_encrypted_pgd

        assert relin_key is not None, "encrypted QP needs a relin key"
        H = mpc_hessian(ny, nx, nu, horizon,
                        model.A, model.B, model.C, Q, R)
        lb = np.tile(np.asarray(bounds.dumin, dtype=np.float64), horizon)
        ub = np.tile(np.asarray(bounds.dumax, dtype=np.float64), horizon)
        # fold the QP's w-space normalization diag(1/hw) into the gain
        # matrices (free: plaintext) -- input_kind="w_scaled" saves a
        # rescale pair vs normalizing inside the solver
        gain_scale = 2.0 / (ub - lb)
        qp_solve, _ = make_encrypted_pgd(
            ctx, relin_key, rot_keys, H, lb, ub,
            k_in=ctx.max_limbs - 2, iters=qp_iters,
            degree=qp_degree, input_bound=qp_input_bound,
            input_kind="w_scaled")
    # d2z_matrix zero-embedding into the slots x slots layout
    # (src/hempc.c:187,195 via src/matrices.c:133-141); the gemv
    # closures precompute diagonal plaintexts + stacked keys eagerly
    k_top = ctx.max_limbs
    if gain_scale is not None:
        K_A = gain_scale[:, None] * K_A
        K_B = gain_scale[:, None] * K_B
    if gemv_mats is not None:
        assert gain_scale is None, \
            "gemv_mats covers the unconstrained path only"
        mat_A, mat_B = gemv_mats
        gemv_A = lambda ct: gemv_apply(ctx, mat_A, ct)   # noqa: E731
        gemv_B = lambda ct: gemv_apply(ctx, mat_B, ct)   # noqa: E731
    else:
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
        key, canary = state
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
        if qp_solve is not None:
            du = qp_solve(du)                 # encrypted box projection
        uhat_low = S.Ciphertext(
            data=ct_uhat.data[..., : du.limbs, :], scale=ct_uhat.scale)
        ct_u = S.add(ctx, uhat_low, du)
        # --- back across the trust boundary --------------------------
        re, im = S.decode_ri(ctx, S.decrypt(ctx, keys, ct_u))
        u = re[:nu]
        # imaginary-residue noise canary (src/ctr.c:493-494 parity)
        canary = jnp.maximum(canary, jnp.max(jnp.abs(im)))
        return u, (key, canary)

    return regulator
