"""RNS-CKKS scheme operations (keygen, enc/dec, arithmetic, rescale).

Mirrors the observable GPQHE he_* API reconstructed in SURVEY.md §2.3:

  keygen           -> he_keypair (src/ctr.c:529)
  encode / decode  -> he_ecd / he_dcd (src/ctr.c:466-470, 489-494)
  encrypt          -> he_enc_pk (src/ctr.c:471-475)
  decrypt          -> he_dec (src/ctr.c:489)
  add / sub / neg  -> he_add / he_sub / he_neg (src/hempc.c:253-262)
  mod_down_pair    -> he_moddown (src/hempc.c:265)
  mul_pt + rescale -> the ct-pt multiply inside he_gemv (src/hempc.c:257)
  mul_ct (+relin)  -> ct-ct multiplication (not used by the controller
                      but part of the library capability)

Representation: ciphertexts/plaintexts live in the NTT (evaluation)
domain as uint32[(2,) K, N] residue arrays; rescale/mod-ops transform
only the limbs they must.  Scales are exact Fractions carried as
static pytree metadata.  Everything here jits; RNG flows through
explicit jax PRNG keys.
"""

from __future__ import annotations

import dataclasses
from fractions import Fraction

import jax
import jax.numpy as jnp
import numpy as np

from hectr_tpu.ckks import dd
from hectr_tpu.ckks.context import CKKSContext
from hectr_tpu.ckks.encoding import embed_ri, integer_residues, unembed
from hectr_tpu.ckks.modmath import add_mod, mul_mod, mul_mod_shoup, neg_mod, sub_mod
from hectr_tpu.ckks.ntt import intt, ntt

SIGMA = 3.2  # RLWE noise standard deviation (standard CKKS choice)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Plaintext:
    data: jnp.ndarray  # uint32 [K, N], NTT domain
    scale: Fraction = dataclasses.field(metadata=dict(static=True))

    @property
    def limbs(self) -> int:
        return self.data.shape[-2]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Ciphertext:
    data: jnp.ndarray  # uint32 [2, K, N], NTT domain
    scale: Fraction = dataclasses.field(metadata=dict(static=True))

    @property
    def limbs(self) -> int:
        return self.data.shape[-2]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class KeySet:
    """Secret/public keys.  sk spans the full chain (data + special) so
    key-switch material can be generated against it."""

    sk: jnp.ndarray   # uint32 [L_full, N], NTT domain
    pk: jnp.ndarray   # uint32 [2, L_data_max, N], NTT domain


# ---------------------------------------------------------------------------
# sampling helpers
# ---------------------------------------------------------------------------


def _signed_to_residues(x: jnp.ndarray, primes_col: jnp.ndarray) -> jnp.ndarray:
    """Small signed int64 coefficients [N] -> uint32 residues [K, N]."""
    return jnp.mod(x[None, :], primes_col.astype(jnp.int64)).astype(jnp.uint32)


def _sample_ternary(key, n: int) -> jnp.ndarray:
    """{-1,0,+1} with probabilities {1/4,1/2,1/4} (centered binomial)."""
    r = jax.random.randint(key, (n,), 0, 4)
    return (r == 3).astype(jnp.int64) - (r == 0).astype(jnp.int64)


def _sample_gauss(key, n: int) -> jnp.ndarray:
    return jnp.round(SIGMA * jax.random.normal(key, (n,), dtype=jnp.float64)
                     ).astype(jnp.int64)


def _sample_uniform(key, primes_col: jnp.ndarray, n: int) -> jnp.ndarray:
    k = primes_col.shape[0]
    return jax.random.randint(
        key, (k, n), jnp.zeros_like(primes_col, dtype=jnp.uint32),
        primes_col.astype(jnp.uint32), dtype=jnp.uint32)


# ---------------------------------------------------------------------------
# keygen / encrypt / decrypt
# ---------------------------------------------------------------------------


import functools as _functools


@_functools.partial(jax.jit, static_argnums=0)
def keygen(ctx: CKKSContext, key) -> KeySet:
    """Generate (sk, pk): sk ternary; pk = (-a s + e, a) mod Q_max.
    Jitted (static ctx): eager execution is pathological on the
    remote-TPU dispatch path."""
    k_s, k_a, k_e = jax.random.split(key, 3)
    lf = len(ctx.full_primes)
    pcol_full = jnp.asarray(
        np.array(ctx.full_primes, dtype=np.uint64).reshape(lf, 1))
    s = _sample_ternary(k_s, ctx.n)
    tf = ctx.tables_full()
    sk = ntt(_signed_to_residues(s, pcol_full), tf)

    kd = ctx.max_limbs
    td = ctx.tables(kd)
    a = _sample_uniform(k_a, ctx.primes_col(kd), ctx.n)  # NTT domain
    e = ntt(_signed_to_residues(_sample_gauss(k_e, ctx.n),
                                ctx.primes_col(kd)), td)
    sk_d = sk[:kd]
    b = sub_mod(e, mul_mod(a, sk_d, td.p, td.mu, td.k), td.p)
    return KeySet(sk=sk, pk=jnp.stack([b, a]))


def encrypt(ctx: CKKSContext, keys: KeySet, pt: Plaintext, key) -> Ciphertext:
    """Public-key encryption: (v pk0 + e0 + m, v pk1 + e1)."""
    k_v, k_e0, k_e1 = jax.random.split(key, 3)
    k = pt.limbs
    t = ctx.tables(k)
    pcol = ctx.primes_col(k)
    v = ntt(_signed_to_residues(_sample_ternary(k_v, ctx.n), pcol), t)
    e0 = ntt(_signed_to_residues(_sample_gauss(k_e0, ctx.n), pcol), t)
    e1 = ntt(_signed_to_residues(_sample_gauss(k_e1, ctx.n), pcol), t)
    pk0 = keys.pk[0, :k]
    pk1 = keys.pk[1, :k]
    c0 = add_mod(add_mod(mul_mod(v, pk0, t.p, t.mu, t.k), e0, t.p),
                 pt.data, t.p)
    c1 = add_mod(mul_mod(v, pk1, t.p, t.mu, t.k), e1, t.p)
    return Ciphertext(data=jnp.stack([c0, c1]), scale=pt.scale)


def decrypt(ctx: CKKSContext, keys: KeySet, ct: Ciphertext) -> Plaintext:
    """m = c0 + c1 * s; returns NTT-domain plaintext."""
    k = ct.limbs
    t = ctx.tables(k)
    m = add_mod(ct.data[0],
                mul_mod(ct.data[1], keys.sk[:k], t.p, t.mu, t.k), t.p)
    return Plaintext(data=m, scale=ct.scale)


# ---------------------------------------------------------------------------
# encode / decode
# ---------------------------------------------------------------------------


def encode(ctx: CKKSContext, v, k: int,
           scale: Fraction | None = None) -> Plaintext:
    """Slot values -> NTT-domain plaintext over the first k limbs at
    the given scale (default: the context Delta).

    v is either a complex array (host/numpy path) or an (re, im) pair
    of real f64 arrays -- the jit/TPU path, since TPU has no
    complex128 (the canonical embedding runs on real pairs either way).
    """
    scale = ctx.delta if scale is None else scale
    s = ctx.slots
    stride = ctx.n // (2 * s)
    if isinstance(v, tuple):
        vre, vim = v
    else:
        v = np.asarray(v, dtype=np.complex128)
        vre, vim = jnp.asarray(v.real), jnp.asarray(v.imag)
    m = embed_ri(vre, vim, s)                                # [2s] real
    y = jnp.round(m * float(scale))                          # integer f64
    res = integer_residues(y, ctx.primes_col(k))             # [k, 2s]
    coeffs = jnp.zeros((k, ctx.n), dtype=jnp.uint32)
    coeffs = coeffs.at[:, ::stride].set(res)
    return Plaintext(data=ntt(coeffs, ctx.tables(k)), scale=scale)


def decode_ri(ctx: CKKSContext, pt: Plaintext) -> tuple[jnp.ndarray, jnp.ndarray]:
    """NTT-domain plaintext -> slot values as an (re, im) pair of real
    f64 arrays [slots], via the double-double fractional-CRT (see
    hectr_tpu.ckks.dd).  Real-only output: the jit/TPU path.

    Decoding first drops to the base chain (limbs beyond base carry no
    information once value*scale < Q_base, which the base sizing
    guarantees -- the same ~2^9 headroom the reference leaves between
    Delta=2^50 and its post-gemv modulus 2^59, src/ctr.c:515-517).
    This keeps the fractional-CRT error at Q_base * 2^-106 ~ 2^-46
    absolute on coefficients regardless of level.
    """
    k = min(pt.limbs, len(ctx.base_primes))
    s = ctx.slots
    stride = ctx.n // (2 * s)
    coeffs = intt(pt.data[..., :k, :], ctx.tables(k))[:, ::stride]  # [k, 2s]
    dc = ctx.decode_constants(k, pt.scale)
    # digits c_i = x_i * (Q/p_i)^-1 mod p_i
    t = ctx.tables(k)
    c = _digits(coeffs, dc, t)
    # fractional sum x/Q = frac(sum c_i / p_i), in double-double
    acc_hi = jnp.zeros(coeffs.shape[-1], dtype=jnp.float64)
    acc_lo = jnp.zeros_like(acc_hi)
    for i in range(k):
        term = dd.dd_div_ff(c[i].astype(jnp.float64), dc.p_f64[i, 0])
        acc_hi, acc_lo = dd.dd_add((acc_hi, acc_lo), term)
    r = dd.dd_round((acc_hi, acc_lo))
    frac = dd.dd_add_f((acc_hi, acc_lo), -r)
    y = dd.dd_mul(frac, (jnp.float64(dc.q_over_scale_hi),
                         jnp.float64(dc.q_over_scale_lo)))
    yf = dd.dd_to_float(y)                                   # [2s] values
    return unembed(yf, s)


def decode(ctx: CKKSContext, pt: Plaintext) -> jnp.ndarray:
    """Complex-output decode (host/CPU convenience; TPU jit callers use
    decode_ri)."""
    re, im = decode_ri(ctx, pt)
    return re + 1j * im


def _digits(coeffs, dc, t):
    inv32 = dc.inv  # [K,1] u64 but values < p < 2^30
    return mul_mod(coeffs, jnp.broadcast_to(inv32.astype(jnp.uint32),
                                            coeffs.shape), t.p, t.mu, t.k)


# ---------------------------------------------------------------------------
# homomorphic arithmetic
# ---------------------------------------------------------------------------


def _common(ctx, a: Ciphertext, b: Ciphertext):
    assert a.limbs == b.limbs, (a.limbs, b.limbs)
    assert a.scale == b.scale, (a.scale, b.scale)
    return ctx.tables(a.limbs)


def add(ctx: CKKSContext, a: Ciphertext, b: Ciphertext) -> Ciphertext:
    t = _common(ctx, a, b)
    return Ciphertext(data=add_mod(a.data, b.data, t.p), scale=a.scale)


def sub(ctx: CKKSContext, a: Ciphertext, b: Ciphertext) -> Ciphertext:
    t = _common(ctx, a, b)
    return Ciphertext(data=sub_mod(a.data, b.data, t.p), scale=a.scale)


def neg(ctx: CKKSContext, a: Ciphertext) -> Ciphertext:
    t = ctx.tables(a.limbs)
    return Ciphertext(data=neg_mod(a.data, t.p), scale=a.scale)


def add_pt(ctx: CKKSContext, a: Ciphertext, pt: Plaintext) -> Ciphertext:
    assert a.limbs == pt.limbs and a.scale == pt.scale
    t = ctx.tables(a.limbs)
    return Ciphertext(
        data=a.data.at[0].set(add_mod(a.data[0], pt.data, t.p)),
        scale=a.scale)


def mul_pt(ctx: CKKSContext, a: Ciphertext, pt: Plaintext) -> Ciphertext:
    """ct x pt product; scales multiply (rescale separately)."""
    assert a.limbs == pt.limbs, (a.limbs, pt.limbs)
    t = ctx.tables(a.limbs)
    return Ciphertext(data=mul_mod(a.data, pt.data[None], t.p, t.mu, t.k),
                      scale=a.scale * pt.scale)


def _drop_one(ctx: CKKSContext, data: jnp.ndarray) -> jnp.ndarray:
    """Exact-rescale one trailing limb of NTT-domain residues
    [..., K, N] -> [..., K-1, N]: (c - [c]_{p_d}) / p_d per limb."""
    k = data.shape[-2]
    d = k - 1
    inv, inv_sh, p_d = ctx.rescale_constants(k)
    row = ctx.tables_row(d)           # single-limb tables for p_d
    t_out = ctx.tables(d)
    last = intt(data[..., d:d + 1, :], row)                   # coeff domain
    centered = jnp.where(last.astype(jnp.int64) > p_d // 2,
                         last.astype(jnp.int64) - p_d,
                         last.astype(jnp.int64))              # (-p/2, p/2]
    ext = jnp.mod(centered, ctx.primes_col(d).astype(jnp.int64)
                  ).astype(jnp.uint32)                        # [..., d?, N]
    ext = ntt(ext, t_out)
    diff = sub_mod(data[..., :d, :], ext, t_out.p)
    out = mul_mod_shoup(diff, jnp.broadcast_to(inv, (d, 1)),
                        jnp.broadcast_to(inv_sh, (d, 1)), t_out.p)
    return out


def rescale_pair(ctx: CKKSContext, a: Ciphertext) -> Ciphertext:
    """Divide by the trailing scale-prime pair (one CKKS level).
    Composite equivalent of a single ~2^50 rescale."""
    k = a.limbs
    data = _drop_one(ctx, _drop_one(ctx, a.data))
    return Ciphertext(data=data, scale=a.scale / ctx.pair_scale(k))


def mod_down_pair(ctx: CKKSContext, a: Ciphertext) -> Ciphertext:
    """Drop the trailing scale pair WITHOUT dividing -- GPQHE
    he_moddown semantics (src/hempc.c:265): level alignment only."""
    return Ciphertext(data=a.data[..., :-2, :], scale=a.scale)


def mod_down_to(ctx: CKKSContext, a: Ciphertext, k: int) -> Ciphertext:
    """Drop trailing limbs down to k without dividing (repeated
    he_moddown): level alignment for operands deeper than needed."""
    assert a.limbs >= k, (a.limbs, k)
    return Ciphertext(data=a.data[..., :k, :], scale=a.scale)
