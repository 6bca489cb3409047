"""Key switching and Galois rotations (hybrid RNS, dnum digit grouping,
ns >= 1 special primes).

Capability of GPQHE's rotation machinery: `he_genrk` generates one
evaluation key per rotation amount 0..slots-1 (src/ctr.c:521-532) and
`he_gemv` consumes them (src/hempc.c:257-259).  Also provides the
relinearisation key for ct-ct multiplication.

Design (level-independent diagonal gadget, generalized to digit width
alpha and special-prime product P = prod of ns primes):

  * Digit decomposition: data limbs are grouped on a fixed alpha-grid;
    digit j is the *centered representative* of c modulo the group
    product Q_j = prod of group-j primes, base-extended to the full
    chain + specials (hectr_tpu.ckks.basecvt: exact centered CRT with a
    float64 correction, no bignums).  dnum = ceil(k/alpha) digits.
  * The switching key for secret s' -> s has, for digit j,
        ksk_j = ( -a_j s + e_j + gad_j * s',  a_j )   over Q_max * P,
    with gad_j[t] = (P mod p_t) for limbs t in group j, else 0.  On a
    group-j limb t the gadget contributes d_j * P = [c]_{p_t} * P
    residue-wise -- an identity that holds for ANY chain prefix (the
    last group simply truncates), so ONE key generated at the maximum
    level serves every level by slicing digit and limb rows.
  * Key switch: decompose + extend digits, NTT, inner-product with the
    key (a single uint64 sum + one Barrett pass -- dnum*p < 2^35), then
    divide by P with centered rounding: iNTT the ns special rows,
    base-convert [acc]_P to the data chain, subtract, multiply by
    P^-1 mod p_t.
  * Noise ~ sum_j ||d_j e_j|| / P with |d_j| <= Q_j/2 <= P/2 (the
    context orders primes so specials dominate every group product).
  * Galois automorphisms X -> X^{5^r} are applied in the *evaluation
    (NTT) domain* as a precomputed index permutation of the evaluation
    points (no iNTT round-trip, no sign fixups).

Hoisting lives in hectr_tpu.ckks.gemv: the digit decomposition (the
expensive part: iNTT + base extension + NTT) is computed once per input
and shared across all rotation amounts of the diagonal method.

Compile-graph discipline: key generation is fully vectorized over
digits (and vmapped over rotation amounts), so the traced graph is
one-digit-sized regardless of chain length -- the round-1 per-digit
Python loops made deep-chain keygen compile for minutes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from hectr_tpu.ckks.basecvt import (
    base_conv_constants,
    base_convert,
    grouped_conv_constants,
    grouped_convert,
)
from hectr_tpu.ckks.context import CKKSContext
from hectr_tpu.ckks.modmath import add_mod, mul_mod, sub_mod, sum_mod
from hectr_tpu.ckks.ntt import intt, ntt
from hectr_tpu.ckks.scheme import Ciphertext, KeySet


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


@functools.lru_cache(maxsize=None)
def _gadget(ctx: CKKSContext) -> np.ndarray:
    """[dnum, lf, 1] uint32: (P mod p_t) on group-j limbs of digit j."""
    kd = ctx.max_limbs
    ns = len(ctx.special_primes)
    a = ctx.alpha
    P = ctx.special_product
    gad = np.zeros((ctx.dnum(kd), kd + ns, 1), dtype=np.uint32)
    for j in range(ctx.dnum(kd)):
        for t in range(j * a, min((j + 1) * a, kd)):
            gad[j, t, 0] = P % ctx.data_primes[t]
    return gad


@functools.partial(jax.jit, static_argnums=(0, 4))
def _gen_switching_key(ctx: CKKSContext, sk_full: jnp.ndarray,
                       s_prime: jnp.ndarray, key,
                       compact: bool = False) -> jnp.ndarray:
    """Key switching s' -> s.  Returns uint32 [dnum, 4, K+S, N] (NTT
    domain over the full data chain + special primes; axis-1 rows
    0:2 = (b, a), 2:4 = their Shoup companions) -- or [dnum, 2, K+S, N]
    when `compact=True` (no stored companions: HALF the key memory, the
    inner product falls back to u64-Barrett products; MEASURED on chip
    (scripts/bench_compact_key.py, B=64 chained ct-ct at logN=14):
    580.3 vs 584.1 mult/s = +0.7% slower for 19 vs 39 MB/key -- the
    u64-Barrett cost hides under the NTT round-trips.  Pick per context
    via the `compact` kwarg of gen_relin_key / gen_rotation_keys; the
    flagship-QP on-chip run uses compact keys throughout).

    sk_full, s_prime: [K+S(+...), N] NTT-domain secrets over the full
    chain.  Vectorized over digits (no per-digit Python loop) and
    jitted with the context static: one compile serves relinearisation
    and every rotation amount.
    """
    kd = ctx.max_limbs
    ns = len(ctx.special_primes)
    lf = kd + ns
    dnum = ctx.dnum(kd)
    t = ctx.tables_ks(kd)
    gad = jnp.asarray(_gadget(ctx))
    chain = ctx.data_primes + ctx.special_primes
    pcol = np.array(chain, dtype=np.uint64).reshape(lf, 1)

    k_a, k_e = jax.random.split(key)
    s_full = sk_full[:lf]
    a = jax.random.randint(
        k_a, (dnum, lf, ctx.n), jnp.zeros((lf, 1), dtype=jnp.uint32),
        jnp.asarray(pcol.astype(np.uint32)), dtype=jnp.uint32)
    e = jnp.round(3.2 * jax.random.normal(k_e, (dnum, ctx.n),
                                          dtype=jnp.float64)
                  ).astype(jnp.int64)
    e_res = jnp.mod(e[:, None, :], pcol.astype(np.int64)).astype(jnp.uint32)
    e_ntt = ntt(e_res, t)                                 # [dnum, lf, N]
    b = sub_mod(e_ntt, mul_mod(a, s_full[None], t.p, t.mu, t.k), t.p)
    gterm = mul_mod(s_prime[None, :lf], gad, t.p, t.mu, t.k)
    b = add_mod(b, gterm, t.p)
    ba = jnp.stack([b, a], axis=1)                        # [dnum, 2, lf, N]
    if compact:
        return ba
    # Shoup companions floor(w * 2^32 / p), computed ONCE at keygen so
    # the key-switch inner product runs in pure u32 (a u64-Barrett
    # product per key element otherwise -- ~4x on 32-bit vector units).
    # Rows 2:4 of axis 1; every slice along digits/limb rows is
    # agnostic to the doubling.
    p_b = jnp.asarray(pcol)[None, None]                   # [1,1,lf,1]
    sh = ((ba.astype(jnp.uint64) << jnp.uint64(32)) // p_b
          ).astype(jnp.uint32)
    return jnp.concatenate([ba, sh], axis=1)              # [dnum, 4, lf, N]


def gen_relin_key(ctx: CKKSContext, keys: KeySet, key,
                  compact: bool = False) -> jnp.ndarray:
    """Switching key for s^2 -> s (ct-ct multiplication)."""
    lf = ctx.max_limbs + len(ctx.special_primes)
    t = ctx.tables_ks(ctx.max_limbs)
    s2 = mul_mod(keys.sk[:lf], keys.sk[:lf], t.p, t.mu, t.k)
    return _gen_switching_key(ctx, keys.sk, s2, key, compact)


def _key_bytes(ctx: CKKSContext, compact: bool = False) -> int:
    """Size of one switching key in bytes (uint32 residues; axis-1
    factor 4 = (b, a) plus their Shoup companions, 2 when compact)."""
    lf = ctx.max_limbs + len(ctx.special_primes)
    return ctx.dnum(ctx.max_limbs) * (2 if compact else 4) * lf * ctx.n * 4


def gen_rotation_keys(ctx: CKKSContext, keys: KeySet, key,
                      rotations: list[int] | None = None,
                      compact: bool = False
                      ) -> dict[int, jnp.ndarray]:
    """One switching key per rotation amount (default 0..slots-1,
    mirroring he_genrk's rk[slots] array, src/ctr.c:521-532; r=0 needs
    no key and is skipped).  All keys are generated by ONE vmapped
    executable (round 1's per-rotation jit calls re-dispatched the
    whole keygen graph per amount)."""
    if rotations is None:
        if ctx.slots > 256:
            import warnings

            from hectr_tpu.ckks.gemv import bsgs_rotations

            warnings.warn(
                f"gen_rotation_keys default materializes {ctx.slots - 1} "
                f"switching keys (~{(ctx.slots - 1) * _key_bytes(ctx) >> 20}"
                f" MB at this preset); dense gemv only needs "
                f"~2*sqrt(slots): pass rotations=bsgs_rotations(ctx.slots)"
                f" ({len(bsgs_rotations(ctx.slots))} keys)",
                stacklevel=2)
        rotations = list(range(ctx.slots))
    rotations = [r for r in rotations if r % ctx.slots != 0]
    if not rotations:
        return {}
    lf = ctx.max_limbs + len(ctx.special_primes)
    subkeys = jax.random.split(key, len(rotations))
    s_rots = jnp.stack([
        apply_automorphism(
            keys.sk[:lf],
            jnp.asarray(eval_permutation(ctx.n, galois_element(r, ctx.n))))
        for r in rotations])                              # [R, lf, N]
    ks = jax.vmap(lambda sp, k: _gen_switching_key(ctx, keys.sk, sp, k,
                                                   compact)
                  )(s_rots, subkeys)
    return {r: ks[i] for i, r in enumerate(rotations)}


# ---------------------------------------------------------------------------
# key-switch core
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _ks_constants(ctx: CKKSContext, k: int):
    """(P^-1 mod p_t, Shoup companion) for the first k data limbs."""
    from hectr_tpu.ckks.modmath import shoup

    P = ctx.special_product
    pinv = np.array([pow(P % p, -1, p) for p in ctx.data_primes[:k]],
                    dtype=np.uint64).reshape(k, 1)
    pj = np.array(ctx.data_primes[:k], dtype=np.uint64).reshape(k, 1)
    # numpy, not device arrays: this cache may first fill inside a
    # trace (see hectr_tpu/ckks/ntt.py build_ntt_tables note)
    return pinv, shoup(pinv, pj)


def slice_key(ctx: CKKSContext, ksk: jnp.ndarray, k: int) -> jnp.ndarray:
    """Slice a max-level switching key [dnum_max, 2, K_max+S, N] to a
    k-limb operand: first dnum(k) digits, data rows [0,k) + specials."""
    ns = len(ctx.special_primes)
    rows = np.concatenate([np.arange(k),
                           np.arange(ctx.max_limbs, ctx.max_limbs + ns)])
    return ksk[:ctx.dnum(k)][:, :, jnp.asarray(rows), :]


def decompose_digits(ctx: CKKSContext, c1: jnp.ndarray) -> jnp.ndarray:
    """NTT-domain poly [k, N] -> extended NTT-domain digits
    [dnum(k), k+S, N]: per-group centered residues base-extended to the
    chain+special modulus.  This is the hoistable part of rotation."""
    k = c1.shape[-2]
    tks = ctx.tables_ks(k)
    coeff = intt(c1, ctx.tables(k))                       # [k, N]
    dnum, alpha = ctx.dnum(k), ctx.alpha
    pad = dnum * alpha - k
    if pad:
        coeff = jnp.concatenate(
            [coeff, jnp.zeros((pad, ctx.n), dtype=jnp.uint32)], axis=0)
    grouped = coeff.reshape(dnum, alpha, ctx.n)
    consts = grouped_conv_constants(
        ctx.digit_groups(k), ctx.data_primes[:k] + ctx.special_primes)
    ext = grouped_convert(grouped, consts)                # [dnum, k+S, N]
    return ntt(ext, tks)


def _inner_product(ctx: CKKSContext, digits: jnp.ndarray,
                   ksk: jnp.ndarray, k: int,
                   sliced: bool = False) -> jnp.ndarray:
    """sum_j digits[j] * ksk[j] over the extended modulus.
    digits [dnum, k+S, N]; ksk sliced to this level ->
    [dnum, 4, k+S, N] (rows 0:2 key, 2:4 Shoup companions) or
    [dnum, 2, k+S, N] for a compact key.  The per-element product is
    pure-u32 Shoup when companions are stored, u64-Barrett otherwise;
    one u64 sum + Barrett pass closes the digit axis."""
    from hectr_tpu.ckks.modmath import mul_mod_shoup_u32

    tks = ctx.tables_ks(k)
    ksk_l = ksk if sliced else slice_key(ctx, ksk, k)
    if ksk_l.shape[1] == 4:
        prod = mul_mod_shoup_u32(digits[:, None, :, :], ksk_l[:, :2],
                                 ksk_l[:, 2:], tks.p32)
    else:                       # compact layout: no stored companions
        prod = mul_mod(digits[:, None, :, :], ksk_l, tks.p, tks.mu, tks.k)
    return sum_mod(prod, 0, tks.p, tks.mu, tks.k)         # [2, k+S, N]


def _mod_down_special(ctx: CKKSContext, acc: jnp.ndarray, k: int) -> jnp.ndarray:
    """Divide the extended result by P = prod(special primes):
    (acc_t - [acc]_P) * P^-1 mod p_t with centered [acc]_P.
    acc [..., k+S, N] -> [..., k, N]."""
    from hectr_tpu.ckks.modmath import mul_mod_shoup

    pinv, pinv_sh = _ks_constants(ctx, k)
    t = ctx.tables(k)
    last = intt(acc[..., k:, :], ctx.tables_special())    # [..., ns, N] coeff
    consts = base_conv_constants(ctx.special_primes, ctx.data_primes[:k])
    ext = ntt(base_convert(last, consts), t)              # [..., k, N]
    diff = sub_mod(acc[..., :k, :], ext, t.p)
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


def mul_ct(ctx: CKKSContext, a: Ciphertext, b: Ciphertext,
           relin_key: jnp.ndarray) -> Ciphertext:
    """ct-ct multiply + relinearise (scales multiply; rescale
    separately).  Not used by the unconstrained encrypted controller
    (only ct-pt products, src/hempc.c:257-265) but required by the
    encrypted QP and the library capability (BASELINE.json config #3)."""
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
