"""Key switching and Galois rotations (hybrid RNS, one special prime).

Capability of GPQHE's rotation machinery: `he_genrk` generates one
evaluation key per rotation amount 0..slots-1 (src/ctr.c:521-532) and
`he_gemv` consumes them (src/hempc.c:257-259).  Also provides the
relinearisation key for ct-ct multiplication.

Design (chosen for RNS level-independence):
  * Digit decomposition: the digits of c are its own *centered per-limb
    residues* d_j = [c]_{p_j} in (-p_j/2, p_j/2].  The switching key
    for secret s' -> s has, for digit j,
        ksk_j = ( -a_j s + e_j + (P mod p_j) * s' * 1[limb = j],  a_j )
    over the extended modulus Q_max * P.  On data limb t the gadget
    contributes d_t * P = [c]_{p_t} * P, i.e. P * c * s' residue-wise --
    an identity that holds for ANY prefix of the data chain, so one key
    generated at the maximum level serves every level by slicing limb
    rows.  (The classic Q-hat CRT gadget is level-dependent; this
    diagonal form trades nothing for it at digit width 1.)
  * Key switch: extend digits to chain+special, NTT, inner-product with
    the key, then divide by P with centered rounding (approximate
    mod-down).  Noise ~ sum_j ||d_j e_j|| / P ~ 2e-13 relative to
    Delta=2^50 -- inside the reference's observed 1e-11 budget.
  * Galois automorphisms X -> X^{5^r} are applied in the *evaluation
    (NTT) domain* as a precomputed index permutation of the slot
    values' evaluation points (no iNTT round-trip, no sign fixups).

Hoisting: `hoisted_rotations` decomposes the input once and reuses the
extended NTT-domain digits for every rotation amount (the expensive
part of rotation is the per-digit base-extension + NTT; the reference's
he_gemv does `slots` rotations per call, so this is the gemv hot path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from hectr_tpu.ckks.context import CKKSContext
from hectr_tpu.ckks.modmath import add_mod, mul_mod, sub_mod
from hectr_tpu.ckks.ntt import build_ntt_tables, intt, ntt
from hectr_tpu.ckks.scheme import (
    Ciphertext,
    KeySet,
    _sample_gauss,
    _sample_uniform,
    _signed_to_residues,
)


# ---------------------------------------------------------------------------
# evaluation-domain Galois permutations
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _eval_exponents(n: int) -> np.ndarray:
    """exponent e_i such that NTT output index i holds m(psi^{e_i}).

    For the Longa-Naehrig CT forward transform the evaluation points
    come out as e_i = 2*bitreverse(i) + 1 (validated against the
    transform itself via discrete log on a probe prime).  Host-only
    numpy so it is safe to first-call from inside a trace.
    """
    from hectr_tpu.ckks.ntt import bit_reverse_indices

    return (2 * bit_reverse_indices(n) + 1) % (2 * n)


@functools.lru_cache(maxsize=None)
def eval_permutation(n: int, g: int) -> np.ndarray:
    """Permutation perm with  NTT(sigma_g(m))[i] = NTT(m)[perm[i]],
    where sigma_g: X -> X^g (g odd).  sigma_g(m)(psi^e) = m(psi^{e g})."""
    e = _eval_exponents(n)
    pos = {int(exp): i for i, exp in enumerate(e)}
    return np.array([pos[int(exp) * g % (2 * n)] for exp in e], dtype=np.int32)


def galois_element(r: int, n: int) -> int:
    """Galois element for a left-rotation by r slots: 5^r mod 2N."""
    return pow(5, r, 2 * n)


def apply_automorphism(data: jnp.ndarray, perm: jnp.ndarray) -> jnp.ndarray:
    """Apply an evaluation-domain Galois permutation to NTT-domain
    residues [..., N]."""
    return data[..., perm]


# ---------------------------------------------------------------------------
# switching keys
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=0)
def _gen_switching_key(ctx: CKKSContext, sk_full: jnp.ndarray,
                       s_prime: jnp.ndarray, key) -> jnp.ndarray:
    """Key switching s' -> s.  Returns uint32 [K, 2, K+S, N] (NTT
    domain over the full data chain + special primes); digit j rows.

    sk_full, s_prime: [K+S(+...), N] NTT-domain secrets over the full
    chain (s_prime only needs the data+special rows used here).

    Jitted with the context static: one compile serves relinearisation
    and every rotation amount (eager execution pays a per-op dispatch
    round-trip on the remote-TPU path, which made keygen minutes-slow).
    """
    kd = ctx.max_limbs
    ns = len(ctx.special_primes)
    lf = kd + ns
    chain = ctx.data_primes + ctx.special_primes
    t = ctx.tables_ks(kd)
    P = 1
    for sp in ctx.special_primes:
        P *= sp
    # gadget constant per digit j: (P mod p_j) placed on limb j only
    gad = np.zeros((kd, lf, 1), dtype=np.uint64)
    for j in range(kd):
        gad[j, j, 0] = P % ctx.data_primes[j]
    gad = jnp.asarray(gad)

    keys = jax.random.split(key, 2 * kd)
    out = []
    s_full = sk_full[:lf]
    pcol = jnp.asarray(np.array(chain, dtype=np.uint64).reshape(lf, 1))
    for j in range(kd):
        a = _sample_uniform(keys[2 * j], pcol, ctx.n)
        e = ntt(_signed_to_residues(_sample_gauss(keys[2 * j + 1], ctx.n),
                                    pcol), t)
        b = sub_mod(e, mul_mod(a, s_full, t.p, t.mu, t.k), t.p)
        gterm = mul_mod(s_prime[:lf],
                        jnp.broadcast_to(gad[j], (lf, ctx.n)).astype(jnp.uint32),
                        t.p, t.mu, t.k)
        b = add_mod(b, gterm, t.p)
        out.append(jnp.stack([b, a]))
    return jnp.stack(out)  # [K, 2, K+S, N]


def gen_relin_key(ctx: CKKSContext, keys: KeySet, key) -> jnp.ndarray:
    """Switching key for s^2 -> s (ct-ct multiplication)."""
    lf = ctx.max_limbs + len(ctx.special_primes)
    t = ctx.tables_ks(ctx.max_limbs)
    s2 = mul_mod(keys.sk[:lf], keys.sk[:lf], t.p, t.mu, t.k)
    return _gen_switching_key(ctx, keys.sk, s2, key)


def gen_rotation_keys(ctx: CKKSContext, keys: KeySet, key,
                      rotations: list[int] | None = None
                      ) -> dict[int, jnp.ndarray]:
    """One switching key per rotation amount (default 0..slots-1,
    mirroring he_genrk's rk[slots] array, src/ctr.c:521-532; r=0 needs
    no key and is skipped)."""
    rotations = list(range(ctx.slots)) if rotations is None else rotations
    out = {}
    subkeys = jax.random.split(key, max(len(rotations), 1))
    lf = ctx.max_limbs + len(ctx.special_primes)
    for i, r in enumerate(rotations):
        if r % ctx.slots == 0:
            continue
        g = galois_element(r, ctx.n)
        perm = jnp.asarray(eval_permutation(ctx.n, g))
        s_rot = apply_automorphism(keys.sk[:lf], perm)
        out[r] = _gen_switching_key(ctx, keys.sk, s_rot, subkeys[i])
    return out


# ---------------------------------------------------------------------------
# key-switch core
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _ks_constants(ctx: CKKSContext, k: int):
    """Constants for switching at k data limbs: chain primes column,
    P^-1 mod p_t (with Shoup), and the special-prime column."""
    from hectr_tpu.ckks.modmath import shoup

    ns = len(ctx.special_primes)
    P = 1
    for sp in ctx.special_primes:
        P *= sp
    pinv = np.array([pow(P % p, -1, p) for p in ctx.data_primes[:k]],
                    dtype=np.uint64).reshape(k, 1)
    pj = np.array(ctx.data_primes[:k], dtype=np.uint64).reshape(k, 1)
    chain = np.array(ctx.data_primes[:k] + ctx.special_primes,
                     dtype=np.uint64).reshape(k + ns, 1)
    # numpy, not device arrays: this cache may first fill inside a
    # trace (see hectr_tpu/ckks/ntt.py build_ntt_tables note)
    return pinv, shoup(pinv, pj), chain


def decompose_digits(ctx: CKKSContext, c1: jnp.ndarray) -> jnp.ndarray:
    """NTT-domain poly [k, N] -> extended NTT-domain digits
    [k, k+S, N]: per-limb centered residues base-extended to the
    chain+special modulus.  This is the hoistable part of rotation."""
    k = c1.shape[-2]
    t = ctx.tables(k)
    tks = ctx.tables_ks(k)
    _, _, chain = _ks_constants(ctx, k)
    coeff = intt(c1, t)                                   # [k, N]
    pcol = ctx.primes_col(k)                              # [k, 1]
    centered = jnp.where(coeff.astype(jnp.int64) > (pcol // 2).astype(jnp.int64),
                         coeff.astype(jnp.int64) - pcol.astype(jnp.int64),
                         coeff.astype(jnp.int64))         # [k, N] signed
    # extend digit j to every chain limb t: [k, k+S, N]
    ext = jnp.mod(centered[:, None, :], chain.astype(jnp.int64)[None]
                  ).astype(jnp.uint32)
    return ntt(ext, tks)


def _inner_product(ctx: CKKSContext, digits: jnp.ndarray,
                   ksk: jnp.ndarray, k: int,
                   sliced: bool = False) -> jnp.ndarray:
    """sum_j digits[j] * ksk[j] over the extended modulus.
    digits [k, k+S, N]; ksk rows sliced to this level -> [2, k+S, N].
    Pass sliced=True when ksk is already [k, 2, k+S, N] (pre-sliced at
    closure-build time, e.g. by gemv's stacked scan)."""
    ns = len(ctx.special_primes)
    tks = ctx.tables_ks(k)
    if sliced:
        ksk_l = ksk
    else:
        rows = list(range(k)) + list(range(ctx.max_limbs,
                                           ctx.max_limbs + ns))
        ksk_l = ksk[:k][:, :, jnp.asarray(rows), :]       # [k, 2, k+S, N]
    prod = mul_mod(digits[:, None, :, :], ksk_l, tks.p, tks.mu, tks.k)
    acc = prod[0]
    for j in range(1, k):
        acc = add_mod(acc, prod[j], tks.p)
    return acc                                            # [2, k+S, N]


def _mod_down_special(ctx: CKKSContext, acc: jnp.ndarray, k: int) -> jnp.ndarray:
    """Divide the extended result by P: (acc_t - [acc]_P) * P^-1 mod p_t
    with centered [acc]_P.  acc [2, k+S, N] -> [2, k, N]."""
    from hectr_tpu.ckks.modmath import mul_mod_shoup

    ns = len(ctx.special_primes)
    assert ns == 1, "multi-special-prime mod-down not yet implemented"
    pinv, pinv_sh, _ = _ks_constants(ctx, k)
    t = ctx.tables(k)
    sp = ctx.special_primes[0]
    row = ctx.tables_row(ctx.max_limbs)                   # special prime row
    last = intt(acc[:, k:, :], row)                       # [2, 1, N] coeff
    centered = jnp.where(last.astype(jnp.int64) > sp // 2,
                         last.astype(jnp.int64) - sp,
                         last.astype(jnp.int64))
    ext = jnp.mod(centered, ctx.primes_col(k).astype(jnp.int64)
                  ).astype(jnp.uint32)                    # [2, k, N]
    ext = ntt(ext, t)
    diff = sub_mod(acc[:, :k, :], ext, t.p)
    return mul_mod_shoup(diff, jnp.broadcast_to(pinv, (k, 1)),
                         jnp.broadcast_to(pinv_sh, (k, 1)), t.p)


def key_switch(ctx: CKKSContext, poly: jnp.ndarray,
               ksk: jnp.ndarray) -> jnp.ndarray:
    """Switch an NTT-domain poly [k, N] (a ct component under s') to a
    2-component ct under s: returns [2, k, N]."""
    k = poly.shape[-2]
    digits = decompose_digits(ctx, poly)
    acc = _inner_product(ctx, digits, ksk, k)
    return _mod_down_special(ctx, acc, k)


# ---------------------------------------------------------------------------
# rotation & relinearisation
# ---------------------------------------------------------------------------


def rotate(ctx: CKKSContext, ct: Ciphertext, r: int,
           rot_keys: dict[int, jnp.ndarray]) -> Ciphertext:
    """Left-rotate ciphertext slots by r."""
    r = r % ctx.slots
    if r == 0:
        return ct
    g = galois_element(r, ctx.n)
    perm = jnp.asarray(eval_permutation(ctx.n, g))
    c0r = apply_automorphism(ct.data[0], perm)
    c1r = apply_automorphism(ct.data[1], perm)
    ks = key_switch(ctx, c1r, rot_keys[r])
    t = ctx.tables(ct.limbs)
    return Ciphertext(
        data=jnp.stack([add_mod(c0r, ks[0], t.p), ks[1]]),
        scale=ct.scale)


def hoisted_rotations(ctx: CKKSContext, ct: Ciphertext, rotations: list[int],
                      rot_keys: dict[int, jnp.ndarray]) -> list[Ciphertext]:
    """All requested rotations of ct, decomposing the input only once.

    Rotation r applies sigma_r to both the c0 part and the *extended
    digits* (digit decomposition commutes with Galois automorphisms
    coefficient-wise), so the iNTT + base-extension + NTT of the digits
    -- the dominant cost -- is shared across all rotations.
    """
    k = ct.limbs
    t = ctx.tables(k)
    digits = decompose_digits(ctx, ct.data[1])            # shared
    out = []
    for r in rotations:
        r = r % ctx.slots
        if r == 0:
            out.append(ct)
            continue
        g = galois_element(r, ctx.n)
        perm = jnp.asarray(eval_permutation(ctx.n, g))
        c0r = apply_automorphism(ct.data[0], perm)
        digits_r = apply_automorphism(digits, perm)
        acc = _inner_product(ctx, digits_r, rot_keys[r], k)
        ks = _mod_down_special(ctx, acc, k)
        out.append(Ciphertext(
            data=jnp.stack([add_mod(c0r, ks[0], t.p), ks[1]]),
            scale=ct.scale))
    return out


def mul_ct(ctx: CKKSContext, a: Ciphertext, b: Ciphertext,
           relin_key: jnp.ndarray) -> Ciphertext:
    """ct-ct multiply + relinearise (scales multiply; rescale
    separately).  Not used by the encrypted controller (unconstrained
    MPC needs only ct-pt products) but part of the library capability
    (BASELINE.json config #3)."""
    assert a.limbs == b.limbs
    k = a.limbs
    t = ctx.tables(k)
    a0, a1 = a.data[0], a.data[1]
    b0, b1 = b.data[0], b.data[1]
    d0 = mul_mod(a0, b0, t.p, t.mu, t.k)
    d1 = add_mod(mul_mod(a0, b1, t.p, t.mu, t.k),
                 mul_mod(a1, b0, t.p, t.mu, t.k), t.p)
    d2 = mul_mod(a1, b1, t.p, t.mu, t.k)
    ks = key_switch(ctx, d2, relin_key)
    return Ciphertext(
        data=jnp.stack([add_mod(d0, ks[0], t.p), add_mod(d1, ks[1], t.p)]),
        scale=a.scale * b.scale)
