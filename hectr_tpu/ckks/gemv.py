"""Encrypted matrix-vector products: plaintext matrix x ciphertext
vector.

Capability of GPQHE's `he_gemv` (call sites src/hempc.c:257-259): the
reference's ONLY multiplicative primitive -- M is a real matrix
zero-embedded into a slots x slots complex layout (d2z_matrix,
src/matrices.c:133-141), v is an encrypted slot vector, and the product
consumes one multiplicative level (partnered with he_moddown on the
un-multiplied operand).

Algorithm: the rotation/diagonal method
    M v = sum_r diag_r(M) * rot_r(v),   diag_r[i] = M[i, (i+r) mod s]
with
  * exact skipping of zero diagonals (the controller's gain matrices
    are small blocks inside the slot layout, so most diagonals vanish),
  * hoisting: ONE digit decomposition of the input shared by every
    rotation amount,
  * diagonal plaintexts precomputed eagerly at closure-build time (they
    are static per matrix/level -- encoding them inside the traced step
    bloated both the graph and the runtime),
  * a lax.scan over rotation amounts (stacked keys/permutations), which
    keeps the compiled graph one-body-sized instead of unrolling all
    `slots` rotations -- the remote-TPU compile of the fully unrolled
    encrypted-MPC step took minutes,
  * one rescale at the end; output scale == input scale (diagonals are
    encoded at the trailing-pair scale).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from hectr_tpu.ckks.context import CKKSContext
from hectr_tpu.ckks.keyswitch import (
    _inner_product,
    _mod_down_special,
    decompose_digits,
    eval_permutation,
    galois_element,
    slice_key,
)
from hectr_tpu.ckks.modmath import add_mod, mul_mod
from hectr_tpu.ckks.scheme import Ciphertext, encode, mul_pt, rescale_pair


@functools.partial(jax.jit, static_argnums=(0, 2, 3))
def _encode_batch(ctx: CKKSContext, vri: jnp.ndarray, k: int, scale):
    """Encode a batch of slot vectors ([R, 2, s] real pairs) into
    plaintext residue arrays [R, k, N] in ONE compiled graph (the eager
    per-diagonal path dominated gemv closure-build time)."""
    return jax.vmap(
        lambda vr, vi: encode(ctx, (vr, vi), k, scale=scale).data
    )(vri[:, 0], vri[:, 1])


def diagonals(M: np.ndarray, slots: int) -> np.ndarray:
    """Generalized diagonals of the slots x slots (zero-padded) matrix:
    diag[r, i] = M[i, (i+r) mod slots]."""
    Mz = np.zeros((slots, slots), dtype=np.complex128)
    Mz[:M.shape[0], :M.shape[1]] = M
    return np.stack([Mz[np.arange(slots), (np.arange(slots) + r) % slots]
                     for r in range(slots)])


def make_gemv(ctx: CKKSContext, M: np.ndarray, k: int, rot_keys: dict):
    """Build an encrypted-gemv closure for a fixed matrix at a fixed
    level (k input limbs).  All static material -- diagonal plaintexts,
    evaluation permutations, stacked level-sliced switching keys -- is
    materialised eagerly here, outside any trace."""
    s = ctx.slots
    diags = diagonals(np.asarray(M), s)
    active = [r for r in range(s) if np.max(np.abs(diags[r])) > 0.0]
    if not active:
        active = [0]
    pair = ctx.pair_scale(k)
    vri = jnp.asarray(np.stack([
        np.stack([diags[r].real, diags[r].imag]) for r in active]))
    pt_batch = _encode_batch(ctx, vri, k, pair)           # [R, k, N]
    from hectr_tpu.ckks.scheme import Plaintext
    pts = {r: Plaintext(data=pt_batch[i], scale=pair)
           for i, r in enumerate(active)}
    rot_active = [r for r in active if r % s != 0]

    if rot_active:
        perms = jnp.asarray(np.stack([
            eval_permutation(ctx.n, galois_element(r, ctx.n))
            for r in rot_active]))
        ksk_stack = jnp.stack([slice_key(ctx, rot_keys[r], k)
                               for r in rot_active])   # [R, dnum, 2, k+S, N]
        pt_stack = jnp.stack([pts[r].data for r in rot_active])  # [R, k, N]
    t = ctx.tables(k)

    def apply(ct: Ciphertext) -> Ciphertext:
        assert ct.limbs == k, (ct.limbs, k)
        if 0 in pts:
            acc = mul_pt(ctx, ct, pts[0]).data
        else:
            acc = jnp.zeros_like(ct.data)
        if rot_active:
            digits = decompose_digits(ctx, ct.data[1])      # hoisted
            c0 = ct.data[0]

            def body(carry, inp):
                perm, pt_data, ksk = inp
                dig_r = digits[..., perm]
                ks_ext = _inner_product(ctx, dig_r, ksk, k, sliced=True)
                ks = _mod_down_special(ctx, ks_ext, k)      # [2, k, N]
                c0r = c0[..., perm]
                term0 = mul_mod(add_mod(c0r, ks[0], t.p), pt_data,
                                t.p, t.mu, t.k)
                term1 = mul_mod(ks[1], pt_data, t.p, t.mu, t.k)
                carry = add_mod(carry, jnp.stack([term0, term1]), t.p)
                return carry, None

            acc, _ = jax.lax.scan(body, acc, (perms, pt_stack, ksk_stack))
        out = Ciphertext(data=acc, scale=ct.scale * pair)
        return rescale_pair(ctx, out)

    return apply


def gemv(ctx: CKKSContext, M: np.ndarray, ct: Ciphertext,
         rot_keys: dict) -> Ciphertext:
    """Encrypted M @ v.  Consumes one level; output scale == input
    scale.  (One-shot convenience; loops should build `make_gemv` once.)"""
    return make_gemv(ctx, M, ct.limbs, rot_keys)(ct)
