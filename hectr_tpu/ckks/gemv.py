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
with all `slots` rotations hoisted (single digit decomposition of the
input, hectr_tpu.ckks.keyswitch.hoisted_rotations), each rotated
ciphertext multiplied by its diagonal encoded at the trailing-pair
scale, accumulated, and rescaled once -- so the output scale is exactly
the input scale (scale-neutral gemv).

Zero diagonals are skipped at trace time: the controller's gain
matrices are [mN x n] blocks inside the slot layout (n=3, m=2 -> most
of the 16 diagonals vanish), so skipping is a big constant win and is
exact (not an approximation).
"""

from __future__ import annotations

import numpy as np

from hectr_tpu.ckks.context import CKKSContext
from hectr_tpu.ckks.keyswitch import hoisted_rotations
from hectr_tpu.ckks.scheme import Ciphertext, add, encode, mul_pt, rescale_pair


def diagonals(M: np.ndarray, slots: int) -> np.ndarray:
    """Generalized diagonals of the slots x slots (zero-padded) matrix:
    diag[r, i] = M[i, (i+r) mod slots]."""
    Mz = np.zeros((slots, slots), dtype=np.complex128)
    Mz[:M.shape[0], :M.shape[1]] = M
    idx = (np.arange(slots)[None, :] + np.arange(slots)[:, None]) % slots
    # diag[r, i] = Mz[i, (i+r) % s]
    return np.stack([Mz[np.arange(slots), (np.arange(slots) + r) % slots]
                     for r in range(slots)])


def gemv(ctx: CKKSContext, M: np.ndarray, ct: Ciphertext,
         rot_keys: dict, tol: float = 0.0) -> Ciphertext:
    """Encrypted M @ v.  Consumes one level (rescales by the trailing
    prime pair); output scale == input scale."""
    s = ctx.slots
    k = ct.limbs
    diags = diagonals(np.asarray(M), s)
    active = [r for r in range(s) if np.max(np.abs(diags[r])) > tol]
    if not active:
        active = [0]
    pair = ctx.pair_scale(k)
    rots = hoisted_rotations(ctx, ct, active, rot_keys)
    acc = None
    for r, ct_r in zip(active, rots):
        pt = encode(ctx, diags[r], k, scale=pair)
        term = mul_pt(ctx, ct_r, pt)
        acc = term if acc is None else add(ctx, acc, term)
    return rescale_pair(ctx, acc)
