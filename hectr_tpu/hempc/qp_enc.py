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
  * clip is a per-slot odd-polynomial surrogate of the box projection,
    z = mid + hw * p((y - mid)/hw): minimax (Lawson-iterated) degree
    3/5/7 fit of clamp(w,-1,1) on [-B, B], post-scaled so max|p| <= 1
    on the fit domain -- the box is then honored *by construction* (up
    to CKKS noise), at the cost of ~2x the minimax error inside the
    box (deg-7 on B=2: 4.5% minimax -> <=9% interior, ZERO overshoot).
    Per-slot mid/halfwidth handle heterogeneous bounds; slots beyond
    the m*N du entries get (mid=0, hw=1) and stay ~0.
  * Degree-7 evaluation is a balanced power tree (d2; d3,d4; d5,d7;
    combine): 4 ct-ct mults / 4 rescale pairs.  Degree-3 costs 3 pairs.

Level budget: initial clip = C pairs (C = 4 for deg 7, 3 for deg 3);
each iteration = 1 (gemv) + C pairs.  Scales are scheduled EXACTLY:
every stage re-enters at the context scale Delta by encoding constants
at the compensating pair products (exact Fractions), so no approximate
"scale drift" accumulates.

Differential validation: the same fixed-iteration algorithm runs in
plaintext (pgd_reference) -- encrypted-vs-plaintext must agree to CKKS
noise; closeness to the exact active-set QP is bounded by the
polynomial clip error and iteration count (tested separately).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from hectr_tpu.ckks import scheme as S
from hectr_tpu.ckks.context import CKKSContext
from hectr_tpu.ckks.keyswitch import mul_ct
from hectr_tpu.ckks.scheme import Ciphertext, mod_down_to


@functools.lru_cache(maxsize=None)
def clip_poly_coeffs(domain: float = 2.0, degree: int = 7,
                     cap: bool = True, grid: int | None = None
                     ) -> tuple[float, ...]:
    """Odd-polynomial surrogate of clamp(w,-1,1) on [-domain, domain].

    Returns (c1, c3, ..., c_degree): p(w) = sum c_e w^e, odd e.
    Minimax via Lawson's iteratively-reweighted least squares; with
    cap=True the coefficients are scaled by 1/max|p| so the surrogate
    never exceeds the box on the fit domain (zero overshoot).

    THE polynomial is only valid on [-domain, domain]: outside it a
    degree-7 odd polynomial diverges like w^7, so callers must
    guarantee the input bound (see pgd_domains).
    """
    assert degree in (3, 5, 7), degree
    if grid is None:
        grid = max(8001, 2 * int(2000 * domain) + 1)
    w = np.linspace(-domain, domain, grid)
    t = np.clip(w, -1.0, 1.0)
    A = np.stack([w**e for e in range(1, degree + 1, 2)], axis=1)
    wts = np.ones_like(w)
    c = None
    for _ in range(300):
        Aw = A * wts[:, None]
        c, *_ = np.linalg.lstsq(Aw, t * wts, rcond=None)
        err = np.abs(A @ c - t)
        wts = wts * np.sqrt(err + 1e-14)
        wts /= wts.max()
    if cap:
        c = c / np.max(np.abs(A @ c))
    return tuple(float(x) for x in c)


def _quantize_domain(domain) -> np.ndarray:
    """Round fit domains UP to a 0.25 grid (>= 1.5): per-slot fits stay
    safe (fit domain >= true bound) and the coefficient cache stays
    small."""
    d = np.maximum(np.ceil(np.asarray(domain, dtype=np.float64) / 0.25)
                   * 0.25, 1.5)
    return d


def clip_coeffs_per_slot(domains: np.ndarray, degree: int,
                         cap: bool = True) -> np.ndarray:
    """[d] fit domains -> [d, nterms] per-slot clip coefficients.
    Heterogeneous bounds mean heterogeneous input ranges; fitting each
    slot on ITS domain (instead of one fit on the max) keeps tight
    slots accurate.  Domains are quantized up (cache-bounded, safe)."""
    dq = _quantize_domain(domains)
    return np.stack([np.asarray(clip_poly_coeffs(float(b), degree, cap))
                     for b in dq])


def poly_clip_np(y: np.ndarray, mid: np.ndarray, hw: np.ndarray,
                 coeffs) -> np.ndarray:
    """Plaintext evaluation of the clip surrogate (float64).
    coeffs: [nterms] shared, or [d, nterms] per-slot."""
    cs = np.asarray(coeffs, dtype=np.float64)
    if cs.ndim == 1:
        cs = np.broadcast_to(cs, (np.shape(y)[-1], cs.shape[0]))
    wv = (y - mid) / hw
    acc = np.zeros_like(wv)
    for i in range(cs.shape[1]):
        acc = acc + cs[..., :, i] * wv ** (2 * i + 1)
    return mid + hw * acc


def pgd_domains(H: np.ndarray, lb: np.ndarray, ub: np.ndarray,
                eta: float, input_bound) -> tuple[np.ndarray, np.ndarray]:
    """Worst-case per-slot clip input domains (in halfwidth units).

    input_bound B0 (scalar or [d]): a-priori bound on
    |du_unc - mid| / hw -- the caller's certificate on the
    unconstrained optimum's range (offline-computable in MPC from the
    reachable set; the encrypted evaluation cannot check it).

    The first clip sees du_unc: domain B0.  Iteration clips see
    y = z - eta H (z - du_unc) with z box-capped, so
        |y_i - mid_i|/hw_i <= 1 + eta (|H| (hw (1+B0)))_i / hw_i.
    These are EXACT worst-case bounds: with capped fits on these
    domains nothing can leave the fit region and the polynomial
    iteration is globally stable.
    """
    mid = (lb + ub) / 2.0
    hw = (ub - lb) / 2.0
    B0 = np.broadcast_to(np.asarray(input_bound, dtype=np.float64),
                         lb.shape).copy()
    amp = np.abs(H) @ (hw * (1.0 + B0))
    B_it = 1.0 + eta * amp / hw
    return B0, B_it


def eta_for_domain(H: np.ndarray, lb: np.ndarray, ub: np.ndarray,
                   input_bound, max_iter_domain: float = 3.0) -> float:
    """Largest step size keeping every iteration-clip domain below
    max_iter_domain (the domain grows linearly in eta)."""
    hw = (ub - lb) / 2.0
    B0 = np.broadcast_to(np.asarray(input_bound, dtype=np.float64), lb.shape)
    amp = np.abs(H) @ (hw * (1.0 + B0))
    return float((max_iter_domain - 1.0) / np.max(amp / hw))


def pgd_reference(H: np.ndarray, du_unc: np.ndarray, lb: np.ndarray,
                  ub: np.ndarray, iters: int, eta: float,
                  poly_clip: bool = True, degree: int = 7,
                  input_bound=3.0) -> np.ndarray:
    """Plaintext mirror of the encrypted iteration (float64)."""
    mid = (lb + ub) / 2.0
    hw = (ub - lb) / 2.0
    B0, B_it = pgd_domains(H, lb, ub, eta, input_bound)

    def clip(y, doms):
        if poly_clip:
            return poly_clip_np(y, mid, hw,
                                clip_coeffs_per_slot(doms, degree))
        return np.clip(y, lb, ub)

    z = clip(du_unc, B0)
    for _ in range(iters):
        z = clip(z - eta * (H @ (z - du_unc)), B_it)
    return z


def _const_pt(ctx: CKKSContext, v: np.ndarray, k: int, scale):
    """Encode a real per-slot constant vector at (k limbs, scale)
    through the jitted batch encoder (eager encode dominates
    closure-build time on deep chains)."""
    from hectr_tpu.ckks.gemv import _encode_batch
    from hectr_tpu.ckks.scheme import Plaintext

    z = np.zeros((1, 2, ctx.slots))
    z[0, 0, : v.shape[0]] = v
    return Plaintext(data=_encode_batch(ctx, jnp.asarray(z), k, scale)[0],
                     scale=scale)


def clip_pairs(degree: int) -> int:
    """Rescale pairs consumed by one encrypted clip of this degree."""
    return {3: 3, 7: 4}[degree]


def pgd_limbs_required(degree: int, iters: int,
                       input_kind: str = "w_scaled") -> int:
    """THE DEPTH LEDGER: data limbs consumed below k_in by the
    encrypted PGD (documented in DESIGN.md §2.2).

    One clip burns C = 2*clip_pairs(degree) limbs (4 rescale pairs for
    deg 7, 3 for deg 3); each iteration burns 2 (its gemv) + C; the
    "du" input kind burns 2 more for the w-space normalization
    (folded into the caller's gains when "w_scaled").  The solver's
    constructor asserts k_in - pgd_limbs_required(...) >= base limbs.

      FLAGSHIP    (22 limbs, k_in=20): deg7/iters=1 -> 18 (exact fit)
      FLAGSHIP_QP (32 limbs, k_in=30): deg7/iters=2 -> 28 (exact fit)
    """
    C = 2 * clip_pairs(degree)
    norm = 2 if input_kind == "du" else 0
    return norm + C + iters * (2 + C)


def _clip_build(ctx: CKKSContext, lb: np.ndarray, ub: np.ndarray,
                k: int, domain, degree: int, denormalize: bool):
    """Split form of the encrypted clip: returns (pts, apply) where
    `pts` is a dict of encoded-plaintext DEVICE ARRAYS (thread through
    jit arguments -- closure capture lowers them as HLO literals, which
    bloats the remote compile request at the flagship scale) and
    `apply(w_ct, pts, relin_key)` is the traceable evaluation.  The
    exact Fraction scale schedule stays STATIC in the closure."""
    from hectr_tpu.ckks.scheme import Plaintext

    delta = ctx.delta
    s = ctx.slots
    d_cons = lb.shape[0]
    mid = np.zeros(s)
    hw = np.ones(s)
    mid[:d_cons] = (lb + ub) / 2.0
    hw[:d_cons] = (ub - lb) / 2.0
    doms = np.full(s, 1.5)
    doms[:d_cons] = np.broadcast_to(np.asarray(domain, np.float64),
                                    (d_cons,))
    cs_slot = clip_coeffs_per_slot(doms, degree)          # [s, nterms]
    out_gain = hw if denormalize else np.ones(s)
    q = {e: cs_slot[:, i] * out_gain
         for i, e in enumerate(range(1, degree + 1, 2))}
    out_mid = mid if denormalize else np.zeros(s)

    if degree == 3:
        # schedule: w2=w^2 (pair1), s3=q3*w2 (pair2), z=w*(q1+s3) (pair3)
        P1, P2, P3 = (ctx.pair_scale(k - 2 * i) for i in range(3))
        sc = {"q3": P1 * P2 * P3 / delta**2, "q1": P3, "mid": delta}
        pts = {"q3": _const_pt(ctx, q[3], k - 2, sc["q3"]).data,
               "q1": _const_pt(ctx, q[1], k - 4, sc["q1"]).data,
               "mid": _const_pt(ctx, out_mid, k - 6, sc["mid"]).data}

        def apply(w: Ciphertext, m, relin_key) -> Ciphertext:
            assert w.limbs == k and w.scale == delta, (w.limbs, w.scale)
            pt = lambda n: Plaintext(data=m[n], scale=sc[n])  # noqa: E731
            t = S.rescale_pair(ctx, mul_ct(ctx, w, w, relin_key))
            s3 = S.rescale_pair(ctx, S.mul_pt(ctx, t, pt("q3")))
            s3 = S.add_pt(ctx, s3, pt("q1"))
            z = S.rescale_pair(ctx, mul_ct(ctx, mod_down_to(ctx, w, k - 4),
                                           s3, relin_key))
            return S.add_pt(ctx, z, pt("mid"))               # Delta, k-6

        return pts, apply

    # degree 7, balanced power tree: 4 ct-ct mults, 4 rescale pairs
    P1, P2, P3, P4 = (ctx.pair_scale(k - 2 * i) for i in range(4))
    s_y = delta**2 / P1                         # w2 = w^2     at k-2
    s_d3 = delta * s_y / P2                     # w3 = w*w2    at k-4
    s_d4 = s_y**2 / P2                          # w4 = w2^2    at k-4
    s_d5 = s_d3 * s_y / P3                      # w5 = w3*w2   at k-6
    s_d7 = s_d3 * s_d4 / P3                     # w7 = w3*w4   at k-6
    sc = {"q1": P4 * delta / delta, "q3": P4 * delta / s_d3,
          "q5": P4 * delta / s_d5, "q7": P4 * delta / s_d7,
          "mid": delta}
    pts = {"q1": _const_pt(ctx, q[1], k - 6, sc["q1"]).data,
           "q3": _const_pt(ctx, q[3], k - 6, sc["q3"]).data,
           "q5": _const_pt(ctx, q[5], k - 6, sc["q5"]).data,
           "q7": _const_pt(ctx, q[7], k - 6, sc["q7"]).data,
           "mid": _const_pt(ctx, out_mid, k - 8, sc["mid"]).data}

    def apply(w: Ciphertext, m, relin_key) -> Ciphertext:
        assert w.limbs == k and w.scale == delta, (w.limbs, w.scale)
        pt = lambda n: Plaintext(data=m[n], scale=sc[n])  # noqa: E731
        w2 = S.rescale_pair(ctx, mul_ct(ctx, w, w, relin_key))  # s_y, k-2
        w3 = S.rescale_pair(ctx, mul_ct(ctx, mod_down_to(ctx, w, k - 2),
                                        w2, relin_key))          # s_d3, k-4
        w4 = S.rescale_pair(ctx, mul_ct(ctx, w2, w2, relin_key))  # s_d4
        w5 = S.rescale_pair(ctx, mul_ct(ctx, w3, mod_down_to(ctx, w2, k - 4),
                                        relin_key))              # s_d5, k-6
        w7 = S.rescale_pair(ctx, mul_ct(ctx, w3, w4, relin_key))  # s_d7
        acc = S.mul_pt(ctx, mod_down_to(ctx, w, k - 6), pt("q1"))
        acc = S.add(ctx, acc, S.mul_pt(ctx, mod_down_to(ctx, w3, k - 6),
                                       pt("q3")))
        acc = S.add(ctx, acc, S.mul_pt(ctx, w5, pt("q5")))
        acc = S.add(ctx, acc, S.mul_pt(ctx, w7, pt("q7")))
        z = S.rescale_pair(ctx, acc)                             # Delta, k-8
        return S.add_pt(ctx, z, pt("mid"))

    return pts, apply


def make_encrypted_clip(ctx: CKKSContext, relin_key, lb: np.ndarray,
                        ub: np.ndarray, k: int, domain=2.0,
                        degree: int = 7, denormalize: bool = False):
    """Polynomial box projection in NORMALIZED units on a ciphertext at
    k limbs and scale Delta.  Output at k - 2*clip_pairs(degree) limbs,
    scale Delta exactly.

    The ciphertext carries w = (y - mid) / hw (centered, halfwidth
    units), and the clip returns p(w) -- also normalized -- unless
    `denormalize`, in which case the output is hw * p(w) + mid in
    original units (the scaling is folded into the combine-stage
    coefficients: zero extra depth).

    WHY normalized: evaluating in original units needs plaintext
    coefficients c_e / hw^{e-1}; with tight boxes (hw ~ 5e-3, e = 7)
    that is a ~1e13 plaintext multiplier which amplifies the ABSOLUTE
    CKKS noise of the monomial ciphertexts catastrophically (observed:
    imag residue ~1e3).  In w-space every plaintext coefficient is
    O(1) and noise grows only with the domain bound (~B^6 for deg 7).

    `domain`: scalar or per-entry [d] fit domain (halfwidth units) --
    the clip is only valid for inputs within it (see pgd_domains).
    Padding slots (beyond len(lb)) get the minimum domain: they carry
    ~0 and must stay ~0 through p()."""
    pts, apply = _clip_build(ctx, lb, ub, k, domain, degree, denormalize)
    return lambda w: apply(w, pts, relin_key)


def pgd_eta(H: np.ndarray, lb: np.ndarray, ub: np.ndarray,
            input_bound, max_iter_domain: float = 3.0) -> float:
    """The default PGD step size: min of the classical optimal step
    2/(l_min + l_max) and the largest step keeping every iteration-clip
    domain below max_iter_domain -- wide domains cost clip accuracy
    (and noise: monomial amplification ~B^{deg-1}) faster than small
    steps cost convergence at fixed iteration count."""
    ev = np.linalg.eigvalsh((H + H.T) / 2.0)
    return min(2.0 / (float(ev[0]) + float(ev[-1])),
               eta_for_domain(H, lb, ub, input_bound, max_iter_domain))


def make_encrypted_pgd(ctx: CKKSContext, relin_key, rot_keys,
                       H: np.ndarray, lb: np.ndarray, ub: np.ndarray,
                       k_in: int, iters: int,
                       eta: float | None = None, degree: int = 7,
                       input_bound=3.0, max_iter_domain: float = 3.0,
                       input_kind: str = "du"):
    """Build the encrypted projected-gradient solver closure.

    input_kind:
      * "du": input is du_unc at k_in limbs, scale Delta (the hempc
        gemv-pair output); normalization to w-space costs 1 extra
        rescale pair.
      * "w_scaled": input is ALREADY diag(1/hw) * du_unc (the caller
        folded the normalization into its gemv gains -- free); only the
        centering add happens here.

    Internally everything runs in normalized w-space (see
    make_encrypted_clip: O(1) plaintext coefficients, noise growth
    bounded by the fit domain, not by 1/hw).  The final clip folds the
    de-normalization hw * p(w) + mid into its coefficients, so the
    output is du in ORIGINAL units at
    k_in - norm - 2*C - iters*(2 + 2*C) limbs (C = clip_pairs(degree)),
    scale Delta.

    `input_bound`: a-priori certificate max|du_unc - mid|/hw <= B0
    (scalar or [d]) -- every clip polynomial is fit on the EXACT
    worst-case domain this implies (pgd_domains), so the iteration is
    globally stable and the box is honored by construction.  The
    certificate is an offline design envelope (reachable-set bound in
    MPC); keep it small: clip accuracy AND noise degrade with it.
    """
    mats, apply, eta = make_encrypted_pgd_split(
        ctx, relin_key, rot_keys, H, lb, ub, k_in, iters, eta=eta,
        degree=degree, input_bound=input_bound,
        max_iter_domain=max_iter_domain, input_kind=input_kind)
    # one compiled graph for the whole fixed iteration (the eager path
    # pays per-op dispatch x hundreds of modular ops on a deep chain).
    # The materials ride as closure captures here -- fine on CPU/local
    # backends; remote-TPU callers should use the split form directly
    # and thread `mats` through jit arguments.
    return jax.jit(lambda du: apply(du, mats)), eta


def make_encrypted_pgd_split(ctx: CKKSContext, relin_key, rot_keys,
                             H: np.ndarray, lb: np.ndarray,
                             ub: np.ndarray, k_in: int, iters: int,
                             eta: float | None = None, degree: int = 7,
                             input_bound=3.0,
                             max_iter_domain: float = 3.0,
                             input_kind: str = "du", log=None):
    """Split form of make_encrypted_pgd: returns (mats, apply, eta).

    `mats` is a pytree of DEVICE ARRAYS -- the relinearisation key, the
    encoded clip/centering plaintexts, and one gemv materials pytree
    per iteration (hectr_tpu.ckks.gemv.gemv_materials) -- meant to be
    threaded through jit ARGUMENTS; `apply(du_ct, mats)` is the
    traceable solver.  Closure capture of this material (the plain
    make_encrypted_pgd) lowers it into the compiled graph as HLO
    literals: at the FLAGSHIP_QP scale that is a multi-GB compile
    request the remote-TPU tunnel rejects (the same lesson as the
    unconstrained flagship's gemv materials, VERDICT r4 #1).  All exact
    Fraction scales and level bookkeeping stay static in the closure.

    `log` (optional callable): per-stage progress messages; when given,
    each material stage is also block_until_ready-synced -- the
    remote-TPU tunnel has wedged on host fetches issued after a large
    burst of unsynced eager allocations (observed twice at this scale),
    and stage-wise syncing keeps the async queue short.
    """
    import jax as _jax

    from hectr_tpu.ckks.gemv import gemv_apply, gemv_materials

    def _stage(name, val):
        if log is not None:
            _jax.block_until_ready(val)
            log(f"pgd materials: {name}")
        return val

    if eta is None:
        eta = pgd_eta(H, lb, ub, input_bound, max_iter_domain)
    assert input_kind in ("du", "w_scaled"), input_kind
    d_cons = lb.shape[0]
    s = ctx.slots
    mid = np.zeros(s)
    hw = np.ones(s)
    mid[:d_cons] = (lb + ub) / 2.0
    hw[:d_cons] = (ub - lb) / 2.0
    C = 2 * clip_pairs(degree)
    norm = 2 if input_kind == "du" else 0
    need = pgd_limbs_required(degree, iters, input_kind)
    assert k_in - need >= len(ctx.base_primes), (
        f"depth: need {need} limbs below k_in={k_in}, "
        f"base={len(ctx.base_primes)}")
    B0, B_it = pgd_domains(H, lb, ub, eta, input_bound)

    mats: dict = {"relin": relin_key, "pre": {}, "iters": []}
    sc_invhw = ctx.pair_scale(k_in)
    if input_kind == "du":
        mats["pre"]["invhw"] = _const_pt(ctx, 1.0 / hw, k_in,
                                         sc_invhw).data
    k0 = k_in - norm
    mats["pre"]["negmid"] = _const_pt(ctx, -mid / hw, k0, ctx.delta).data
    _stage("pre", mats["pre"])
    pts0, apply0 = _clip_build(ctx, lb, ub, k0, B0, degree,
                               denormalize=(iters == 0))
    mats["clip0"] = _stage("clip0", pts0)
    # gradient in w-space: G = eta * diag(1/hw) H diag(hw)
    Gw = eta * (np.asarray(H) * hw[None, :d_cons] / hw[:d_cons, None])
    appliers = []
    levels = []
    k = k0 - C
    for t in range(iters):
        gm = _stage(f"iter {t} gemv (k={k})",
                    gemv_materials(ctx, Gw, k, rot_keys))
        pts_t, apply_t = _clip_build(ctx, lb, ub, k - 2, B_it, degree,
                                     denormalize=(t == iters - 1))
        mats["iters"].append({"gemv": gm, "clip": _stage(f"iter {t} clip",
                                                        pts_t)})
        appliers.append(apply_t)
        levels.append(k)
        k = k - (2 + C)

    from hectr_tpu.ckks.scheme import Plaintext

    def apply(du_in: Ciphertext, m) -> Ciphertext:
        rk = m["relin"]
        if input_kind == "du":
            w = S.rescale_pair(ctx, S.mul_pt(ctx, du_in, Plaintext(
                data=m["pre"]["invhw"], scale=sc_invhw)))
        else:
            w = du_in
        w_unc = S.add_pt(ctx, w, Plaintext(data=m["pre"]["negmid"],
                                           scale=ctx.delta))
        z = apply0(w_unc, m["clip0"], rk)
        for t in range(iters):
            kc = levels[t]
            g = gemv_apply(ctx, m["iters"][t]["gemv"],
                           S.sub(ctx, z, mod_down_to(ctx, w_unc, kc)))
            y = S.sub(ctx, mod_down_to(ctx, z, kc - 2), g)
            z = appliers[t](y, m["iters"][t]["clip"], rk)
        return z

    return mats, apply, eta


def make_pgd_mirror_regulator(model, plant, horizon: int, bounds,
                              iters: int = 2, degree: int = 7,
                              input_bound=3.0):
    """Jittable PLAINTEXT mirror of the constrained encrypted regulator
    (gemv pair -> fixed-iteration polynomial PGD -> uhat + du), for
    closed-loop differential testing and for predicting the encrypted
    controller's behavior offline.  Same fixed iteration, same per-slot
    minimax clip polynomials on the same certified domains as
    make_encrypted_pgd -- the encrypted loop must match THIS to CKKS
    noise (it is NOT the exact active-set QP: PGD at fixed iteration
    count plus a polynomial projection is its own, deterministic
    control law)."""
    from hectr_tpu.control.mpc import mpc_gains, mpc_hessian
    from hectr_tpu.control.stages import weighting_matrices

    ny, nx = np.shape(model.C)
    nu = np.shape(model.B)[1]
    Q, R = weighting_matrices(plant.xs, plant.us)
    K_A, K_B = mpc_gains(ny, nx, nu, horizon, model.A, model.B, model.C,
                         Q, R)
    H = mpc_hessian(ny, nx, nu, horizon, model.A, model.B, model.C, Q, R)
    lb = np.tile(np.asarray(bounds.dumin, dtype=np.float64), horizon)
    ub = np.tile(np.asarray(bounds.dumax, dtype=np.float64), horizon)
    mid, hw = (lb + ub) / 2.0, (ub - lb) / 2.0
    eta = pgd_eta(H, lb, ub, input_bound)
    B0, B_it = pgd_domains(H, lb, ub, eta, input_bound)
    cs0 = jnp.asarray(clip_coeffs_per_slot(B0, degree))    # [d, nterms]
    cs_it = jnp.asarray(clip_coeffs_per_slot(B_it, degree))
    K_Aj, K_Bj, Hj = map(jnp.asarray, (K_A, K_B, H))
    midj, hwj = jnp.asarray(mid), jnp.asarray(hw)
    etaj = jnp.float64(eta)

    def clip(y, cs):
        w = (y - midj) / hwj
        acc = jnp.zeros_like(w)
        for i in range(cs.shape[1]):
            acc = acc + cs[:, i] * w ** (2 * i + 1)
        return midj + hwj * acc

    def regulator(state, xhat, uhat, xr, ur):
        du_unc = -(K_Aj @ (xhat - xr) + K_Bj @ (uhat - ur))
        # thread the certificate residual through the scan state: the
        # caller asserts it stayed <= input_bound after the loop (the
        # a-priori envelope the encrypted solver was built against)
        cert = jnp.max(jnp.abs(du_unc - midj) / hwj)
        state = jnp.maximum(state, cert) if state is not None else state
        z = clip(du_unc, cs0)
        for _ in range(iters):
            z = clip(z - etaj * (Hj @ (z - du_unc)), cs_it)
        return uhat + z[:nu], state

    return regulator
