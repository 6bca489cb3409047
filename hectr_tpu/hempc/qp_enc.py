"""Encrypted QP: box-constrained MPC solved OVER CIPHERTEXT.

The reference supports constrained MPC only in plaintext (quadprog,
src/mpc.c:411) -- its encrypted controller is the unconstrained linear
update only (src/hempc.c:216-266; "only *unconstrained* MPC exists
under encryption", SURVEY.md §2.1).  This module goes beyond the
reference (BASELINE.json north star: "encrypted QP iterations"): a
fixed-iteration projected-gradient method on the MPC box QP

    min 1/2 du' H du + c' du   s.t.  lb <= du <= ub

evaluated entirely on CKKS ciphertexts:

    z_0     = clip(du_unc)                 (du_unc = -H^{-1} c, the
                                            unconstrained optimum the
                                            hempc gemv pipeline already
                                            computes encrypted)
    z_{t+1} = clip(z_t - eta H (z_t - du_unc))

  * eta H (z - du_unc) is one encrypted gemv (plaintext matrix eta*H,
    hoisted-rotation diagonal method) -- the gradient, since
    H z + c = H (z - du_unc).
  * clip is a per-slot degree-3 odd polynomial approximation of the
    box projection: z = mid + hw * p((y - mid)/hw) with
    p(w) = c1 w + c3 w^3 minimax-fit to clamp(w, -1, 1) on [-B, B].
    Per-slot mid/halfwidth handle heterogeneous bounds; slots beyond
    the m*N du entries get (mid=0, hw=1) and stay ~0.

Level budget per iteration: 1 pair (gemv) + 3 pairs (square, c3-mult,
final mult) = 4 rescale pairs; plus 1 pair for the initial du_unc gemv
and 3 for the initial clip.  Scales are scheduled EXACTLY: every
iteration re-enters at the context scale Delta by encoding the
polynomial coefficients at the compensating pair products (exact
Fractions), so no approximate "scale drift" accumulates.

Differential validation: the same fixed-iteration algorithm runs in
plaintext (pgd_reference) -- encrypted-vs-plaintext must agree to CKKS
noise; closeness to the exact active-set QP is bounded by the
polynomial clip error and iteration count (tested separately).
"""

from __future__ import annotations

import functools

import numpy as np

import jax.numpy as jnp

from hectr_tpu.ckks import scheme as S
from hectr_tpu.ckks.context import CKKSContext
from hectr_tpu.ckks.gemv import make_gemv
from hectr_tpu.ckks.keyswitch import mul_ct
from hectr_tpu.ckks.scheme import Ciphertext


@functools.lru_cache(maxsize=None)
def clip_poly_coeffs(domain: float = 2.0, grid: int = 2001) -> tuple[float, float]:
    """Least-squares degree-3 odd fit of clamp(w,-1,1) on [-domain, domain].

    (c1, c3): p(w) = c1 w + c3 w^3.  Odd symmetry halves the system.
    """
    w = np.linspace(-domain, domain, grid)
    target = np.clip(w, -1.0, 1.0)
    A = np.stack([w, w**3], axis=1)
    coef, *_ = np.linalg.lstsq(A, target, rcond=None)
    return float(coef[0]), float(coef[1])


def pgd_reference(H: np.ndarray, du_unc: np.ndarray, lb: np.ndarray,
                  ub: np.ndarray, iters: int, eta: float,
                  poly_clip: bool = True, domain: float = 2.0) -> np.ndarray:
    """Plaintext mirror of the encrypted iteration (float64)."""
    mid = (lb + ub) / 2.0
    hw = (ub - lb) / 2.0
    c1, c3 = clip_poly_coeffs(domain)

    def clip(y):
        w = (y - mid) / hw
        if poly_clip:
            return mid + hw * (c1 * w + c3 * w**3)
        return mid + hw * np.clip(w, -1.0, 1.0)

    z = clip(du_unc)
    for _ in range(iters):
        z = clip(z - eta * (H @ (z - du_unc)))
    return z


def _const_pt(ctx: CKKSContext, v: np.ndarray, k: int, scale):
    """Encode a real per-slot constant vector at (k limbs, scale)."""
    z = np.zeros(ctx.slots)
    z[: v.shape[0]] = v
    return S.encode(ctx, (jnp.asarray(z), jnp.zeros(ctx.slots)), k,
                    scale=scale)


def make_encrypted_clip(ctx: CKKSContext, relin_key, lb: np.ndarray,
                        ub: np.ndarray, k: int, domain: float = 2.0):
    """Degree-3 polynomial box projection on a ciphertext at k limbs
    and scale Delta.  Costs 3 rescale pairs; output at k-6 limbs,
    scale Delta exactly."""
    delta = ctx.delta
    s = ctx.slots
    mid = np.zeros(s)
    hw = np.ones(s)
    mid[: lb.shape[0]] = (lb + ub) / 2.0
    hw[: lb.shape[0]] = (ub - lb) / 2.0
    c1, c3 = clip_poly_coeffs(domain)

    # exact pair products dropped at each of the three rescales
    P1 = ctx.pair_scale(k)           # square:      k   -> k-2
    P2 = ctx.pair_scale(k - 2)       # c3 multiply: k-2 -> k-4
    P3 = ctx.pair_scale(k - 4)       # final mult:  k-4 -> k-6
    # d = (y - mid) / hw at scale Delta: fold 1/hw into a pt multiply?
    # Cheaper: keep d in ORIGINAL units and fold hw into the
    # coefficients:  z = mid + q1 d + q3 d^3,
    #   q1 = c1, q3 = c3 / hw^2   (since p(w) = c1 w + c3 w^3, w = d/hw,
    #   output mid + hw p(w) = mid + c1 d + (c3/hw^2) d^3).
    q1 = np.full(s, c1)
    q3 = np.zeros(s)
    q3[: lb.shape[0]] = c3 / hw[: lb.shape[0]] ** 2
    q3_full = np.full(s, c3)         # pad slots: hw=1
    q3_full[: lb.shape[0]] = q3[: lb.shape[0]]

    # scale schedule: d at Delta [k]; t = d^2 -> Delta^2/P1 [k-2];
    # s3 = q3*t at scale P3 => encode q3 at P1*P2*P3/Delta^2; q1 at P3.
    sc_q3 = P1 * P2 * P3 / (delta * delta)
    pt_q3 = _const_pt(ctx, q3_full, k - 2, sc_q3)
    pt_q1 = _const_pt(ctx, q1, k - 4, P3)
    pt_mid = _const_pt(ctx, mid, k - 6, delta)
    neg_mid = _const_pt(ctx, -mid, k, delta)

    def clip(y: Ciphertext) -> Ciphertext:
        assert y.limbs == k and y.scale == delta, (y.limbs, y.scale)
        d = S.add_pt(ctx, y, neg_mid)                       # Delta, k
        t = S.rescale_pair(ctx, mul_ct(ctx, d, d, relin_key))
        s3 = S.rescale_pair(ctx, S.mul_pt(ctx, t, pt_q3))   # P3, k-4
        s3 = S.add_pt(ctx, s3, pt_q1)                       # q1 + q3 d^2
        d_low = Ciphertext(data=d.data[..., : k - 4, :], scale=d.scale)
        z = S.rescale_pair(ctx, mul_ct(ctx, d_low, s3, relin_key))
        return S.add_pt(ctx, z, pt_mid)                     # Delta, k-6

    return clip


def make_encrypted_pgd(ctx: CKKSContext, relin_key, rot_keys,
                       H: np.ndarray, lb: np.ndarray, ub: np.ndarray,
                       k_in: int, iters: int,
                       eta: float | None = None, domain: float = 2.0):
    """Build the encrypted projected-gradient solver closure.

    Input: du_unc ciphertext at k_in limbs, scale Delta (the output of
    the hempc gemv pair).  Output: clipped du at
    k_in - 6 - 8*iters limbs, scale Delta.
    Requires k_in - 6 - 8*iters >= len(ctx.base_primes).
    """
    if eta is None:
        ev = np.linalg.eigvalsh((H + H.T) / 2.0)
        eta = 2.0 / (float(ev[0]) + float(ev[-1]))
    need = 6 + 8 * iters
    assert k_in - need >= len(ctx.base_primes), (
        f"depth: need {need} limbs below k_in={k_in}, "
        f"base={len(ctx.base_primes)}")

    clip0 = make_encrypted_clip(ctx, relin_key, lb, ub, k_in, domain)
    steps = []
    k = k_in - 6
    for _ in range(iters):
        gemv_g = make_gemv(ctx, eta * np.asarray(H), k, rot_keys)
        clip_t = make_encrypted_clip(ctx, relin_key, lb, ub, k - 2, domain)
        steps.append((gemv_g, clip_t, k))
        k = k - 8

    def solve(du_unc: Ciphertext) -> Ciphertext:
        z = clip0(du_unc)
        for gemv_g, clip_t, kc in steps:
            unc = Ciphertext(data=du_unc.data[..., :kc, :],
                             scale=du_unc.scale)
            g = gemv_g(S.sub(ctx, z, unc))                  # Delta, kc-2
            z_low = Ciphertext(data=z.data[..., : kc - 2, :], scale=z.scale)
            y = S.sub(ctx, z_low, g)
            z = clip_t(y)
        return z

    return solve, eta
