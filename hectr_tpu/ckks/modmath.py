"""Vectorized modular arithmetic over RNS limb arrays (jittable).

Replaces GPQHE's libgcrypt big-integer coefficient arithmetic
(`poly_mpi_t`, MPI helpers at src/ctr.c:515-516) with residue
arithmetic: arrays are uint32 with one modulus per leading-axis limb,
moduli < 2^30 so a*b < 2^60 fits uint64.

Reduction strategy (designed for TPU):
  * Barrett with per-limb (mu, shift): q = ((ab >> (k-2)) * mu) >> (k+2)
    with mu = floor(4^k / p), k = bitlen(p).  All intermediates < 2^63;
    at most 2 correction subtractions (proved < 3p; tested
    exhaustively against Python ints).  DOMAIN: ab < ~4^k, i.e. both
    operands reduced mod p -- for cross-modulus products (a residue of
    a LARGER prime times a constant mod a smaller one) use
    mul_mod_shoup_wide, whose bound holds for any a < 2^32.
  * Shoup multiplication for *precomputed* constants (NTT twiddles,
    key-switch hooks): r = w*a - floor(a*w'/2^32)*p with
    w' = floor(w*2^32/p) -- one fewer wide multiply on the hot path.

uint64 on TPU is emulated with 32-bit pairs by XLA; this module is the
portable-correct path.  The Pallas kernels in hectr_tpu.ops implement
the same contracts in pure 32-bit arithmetic.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

U32 = jnp.uint32
U64 = jnp.uint64


def barrett_constants(primes: list[int]) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-limb (p, mu, k) arrays shaped [L, 1] for broadcasting over
    [L, N] residue arrays.  mu = floor(4^k / p), k = bitlen(p)."""
    ps, mus, ks = [], [], []
    for p in primes:
        assert 2 < p < (1 << 30), f"modulus {p} out of supported range"
        k = p.bit_length()
        ps.append(p)
        mus.append((1 << (2 * k)) // p)
        ks.append(k)
    shape = (len(primes), 1)
    return (np.array(ps, dtype=np.uint64).reshape(shape),
            np.array(mus, dtype=np.uint64).reshape(shape),
            np.array(ks, dtype=np.uint64).reshape(shape))


def shoup(w: np.ndarray, p: np.ndarray) -> np.ndarray:
    """Precompute Shoup companions w' = floor(w * 2^32 / p) (exact,
    host-side object ints to avoid overflow)."""
    w_obj = w.astype(object)
    p_obj = p.astype(object)
    return ((w_obj << 32) // p_obj).astype(np.uint64)


def add_mod(a, b, p):
    """(a + b) mod p elementwise; a, b already reduced."""
    s = a.astype(U64) + b.astype(U64)
    return jnp.where(s >= p, s - p, s).astype(U32)


def sub_mod(a, b, p):
    """(a - b) mod p elementwise; a, b already reduced."""
    d = a.astype(U64) + p - b.astype(U64)
    return jnp.where(d >= p, d - p, d).astype(U32)


def neg_mod(a, p):
    """(-a) mod p elementwise."""
    return jnp.where(a == 0, jnp.zeros_like(a),
                     (p - a.astype(U64)).astype(U64)).astype(U32)


def _barrett(prod, p, mu, k):
    """Reduce prod < 2^60 mod p (< 2^30) via Barrett; see module doc."""
    q = ((prod >> (k - 2)) * mu) >> (k + 2)
    r = prod - q * p
    r = jnp.where(r >= p, r - p, r)
    r = jnp.where(r >= p, r - p, r)
    return r


def mul_mod(a, b, p, mu, k):
    """(a * b) mod p elementwise via Barrett."""
    prod = a.astype(U64) * b.astype(U64)
    return _barrett(prod, p, mu, k).astype(U32)


def sum_mod(a, axis, p, mu, k):
    """Sum already-reduced residues along `axis`, then one Barrett pass.
    Valid while (axis size) * p < 2^60 -- i.e. any realistic digit
    count.  One reduction for the whole key-switch inner product instead
    of a chain of conditional-subtract adds."""
    s = jnp.sum(a.astype(U64), axis=axis)
    return _barrett(s, p, mu, k).astype(U32)


def mul_mod_shoup(a, w, w_shoup, p):
    """(a * w) mod p with precomputed w' = floor(w*2^32/p).

    r = w*a - floor(a*w'/2^32)*p, then one conditional subtract.
    Requires w < p < 2^30 and a < p.

    Evaluated on the pure-u32 path: under the contract every cast is
    exact (w < p < 2^30, w' < 2^32, a < p < 2^31), and emulated u64
    multiplies cost ~4x on TPU's 32-bit vector units.  Same residues
    bit-for-bit as the u64 formula.
    """
    return mul_mod_shoup_u32(a.astype(U32), w.astype(U32),
                             w_shoup.astype(U32), p.astype(U32))


def mul_mod_shoup_wide(a, w, w_shoup, p):
    """(a * w) mod p with w' = floor(w*2^32/p), for a < 2^31 NOT
    necessarily reduced mod p (base conversion multiplies residues of
    one prime by constants mod a *different, possibly smaller* prime --
    Barrett mul_mod is out of domain there: its bound needs ab < ~p^2).

    Error analysis: q >= a*w/p - a/2^32 - 1, so r < p*(a/2^32 + 2)
    < 3p for a < 2^32 -> two conditional subtracts suffice.

    Evaluated on the pure-u32 path (every caller passes residues of
    < 2^30 primes, within _mulhi32's a < 2^31 domain; the true
    remainder < 3p < 2^32 so wrapping-u32 arithmetic is exact).
    """
    q = _mulhi32(a.astype(U32), w_shoup.astype(U32))
    p32 = p.astype(U32)
    r = a.astype(U32) * w.astype(U32) - q * p32
    r = jnp.where(r >= p32, r - p32, r)
    return jnp.where(r >= p32, r - p32, r)


# ---------------------------------------------------------------------------
# pure-uint32 variants (no emulated uint64 on the hot path)
# ---------------------------------------------------------------------------
#
# TPUs have no native 64-bit vector units; XLA emulates uint64 with
# 32-bit pairs at a several-x cost.  The NTT butterfly only needs
# (a*w) mod p with a precomputed Shoup companion, which closes over
# pure 32-bit arithmetic:  hi32(a*w') via 16-bit partial products with
# explicit carry, then r = a*w - hi*p in wrapping uint32 (exact because
# the true remainder is < 2p < 2^31).  These are also the exact
# contracts the Pallas kernels implement.

_MASK16 = np.uint32(0xFFFF)


def _mulhi32(a, w):
    """hi 32 bits of a*w for a < 2^31, w < 2^32 (both uint32): all
    partial sums stay exact in uint32 (a1 < 2^15)."""
    a1 = a >> jnp.uint32(16)
    a0 = a & _MASK16
    w1 = w >> jnp.uint32(16)
    w0 = w & _MASK16
    lo = a0 * w0
    mid1 = a1 * w0 + (lo >> jnp.uint32(16))          # < 2^31, exact
    mid2 = a0 * w1                                    # < 2^32, exact
    s = mid1 + mid2                                   # may wrap
    # carry via select, not astype: Mosaic's bool->uint32 conversion
    # helper recurses infinitely (jax 0.9 lowering.py _convert_helper)
    carry = jnp.where(s < mid1, jnp.uint32(1 << 16), jnp.uint32(0))
    return a1 * w1 + (s >> jnp.uint32(16)) + carry


def add_mod_u32(a, b, p32):
    s = a + b                                         # < 2^32, exact
    return jnp.where(s >= p32, s - p32, s)


def sub_mod_u32(a, b, p32):
    d = a - b                                         # wrapping
    return jnp.where(a < b, d + p32, d)


def mul_mod_shoup_u32(a, w32, w_shoup32, p32):
    """(a * w) mod p with w' = floor(w*2^32/p), all uint32."""
    q = _mulhi32(a, w_shoup32)
    r = a * w32 - q * p32                             # wrapping; true r < 2p
    return jnp.where(r >= p32, r - p32, r)


# ---- lazy (redundant-representative) variants for fused kernels -----
# Values live in [0, 2p) between butterfly stages; p < 2^30 keeps every
# intermediate < 2^32.  The Shoup quotient error is <= 1 for ANY
# a < 2^32 (q - q_hat < a/2^32 + 1 < 2), so the product lands in
# [0, 2p) with ZERO correction selects -- the saving that makes the
# compute-bound NTT kernel faster.  Reduce to [0, p) once at the end
# with norm_u32.


def mul_mod_shoup_u32_lazy(a, w32, w_shoup32, p32):
    """a < 2^31 (e.g. in [0, 2p)), w < p: returns (a*w) mod p + {0,p}
    in [0, 2p), no correction."""
    q = _mulhi32(a, w_shoup32)
    return a * w32 - q * p32                          # wrapping; < 2p


def add_u32_lazy(a, b, p2_32):
    """a, b in [0, 2p) -> (a + b) mod 2p in [0, 2p) (congruent mod p)."""
    s = a + b                                         # < 4p < 2^32
    return jnp.where(s >= p2_32, s - p2_32, s)


def sub_u32_lazy(a, b, p2_32):
    """a, b in [0, 2p) -> (a - b) mod 2p in [0, 2p)."""
    d = a + p2_32 - b                                 # in (0, 4p)
    return jnp.where(d >= p2_32, d - p2_32, d)


def norm_u32(a, p32):
    """[0, 2p) -> [0, p)."""
    return jnp.where(a >= p32, a - p32, a)


def to_rns(coeffs_obj: np.ndarray, primes: list[int]) -> np.ndarray:
    """Host: exact signed big-int coefficients -> uint32[L, N] residues.
    Uses the native C++ library (hectr_tpu.native) when available."""
    from hectr_tpu import native

    if native.available():
        return native.to_rns(np.asarray(coeffs_obj, dtype=object),
                             list(primes))
    out = np.empty((len(primes), coeffs_obj.shape[0]), dtype=np.uint32)
    c = coeffs_obj.astype(object)
    for i, p in enumerate(primes):
        out[i] = (c % p).astype(np.uint32)
    return out


def from_rns(res: np.ndarray, primes: list[int]) -> np.ndarray:
    """Host: uint32[L, N] residues -> exact centered big-int coefficients
    (object array), via CRT.  Test/oracle path, not jitted.  Uses the
    native C++ library (hectr_tpu.native) when available."""
    from hectr_tpu import native

    if native.available():
        return native.crt_centered(np.asarray(res), list(primes))
    L, N = res.shape
    q = 1
    for p in primes:
        q *= p
    acc = np.zeros(N, dtype=object)
    for i, p in enumerate(primes):
        qi = q // p
        inv = pow(qi % p, -1, p)
        acc = (acc + res[i].astype(object) * inv % p * qi) % q
    return np.where(acc > q // 2, acc - q, acc)
