"""CKKS context: parameter preset -> derived constant tables.

Equivalent of GPQHE's `hectx_init(logn, q, slots, Delta)` global context
(call site src/ctr.c:514-518) -- but where GPQHE configures a single
bignum modulus q = 2^109, this context derives a full RNS machine:
the prime chain, NTT tables over every chain prefix, exact per-level
scales, CRT/rescale constants, and the encoding matrices.

Chain layout (index order = limb order in ciphertext arrays):

    [ b_0, b_1 | s_0a, s_0b | s_1a, s_1b | ... | P_0 ... ]
      base (~2^30 each)   scale pairs (~2^25 each,     special primes
      decryption headroom  product ~ Delta = 2^50)     (key switching)

A ciphertext at level l carries the first  2 + 2l  data limbs.
Rescaling drops the trailing pair (divides by ~Delta); `mod_down_pair`
drops the pair without dividing (GPQHE he_moddown, src/hempc.c:265).
Scales are tracked as exact Fractions in static metadata, so decode
divides by the true scale and composite-prime drift never accumulates.
"""

from __future__ import annotations

import dataclasses
import functools
from fractions import Fraction

import jax.numpy as jnp
import numpy as np

from hectr_tpu.config import CKKSPreset
from hectr_tpu.ckks.ntt import NTTTables, build_ntt_tables
from hectr_tpu.ckks.primes import find_ntt_primes, find_scale_prime_pairs


@dataclasses.dataclass(frozen=True)
class DecodeConstants:
    """Per-limb fractional-CRT constants for a K-limb chain prefix."""

    inv: np.ndarray       # [K, 1] uint64: (Q/p_i)^-1 mod p_i
    p_f64: np.ndarray     # [K, 1] float64: p_i
    q_over_scale_hi: float
    q_over_scale_lo: float


@dataclasses.dataclass(eq=False)
class CKKSContext:
    preset: CKKSPreset
    n: int
    slots: int
    depth: int
    base_primes: tuple[int, ...]
    scale_primes: tuple[int, ...]    # flattened pairs, drop order = reversed
    special_primes: tuple[int, ...]

    @property
    def data_primes(self) -> tuple[int, ...]:
        return self.base_primes + self.scale_primes

    @property
    def full_primes(self) -> tuple[int, ...]:
        return self.data_primes + self.special_primes

    @property
    def delta(self) -> Fraction:
        return Fraction(1 << self.preset.scale_bits)

    @property
    def max_limbs(self) -> int:
        return len(self.data_primes)

    def limbs_at_level(self, level: int) -> int:
        assert 0 <= level <= self.depth
        return len(self.base_primes) + 2 * level

    def level_of_limbs(self, k: int) -> int:
        return (k - len(self.base_primes)) // 2

    def q_at(self, k: int) -> int:
        q = 1
        for p in self.data_primes[:k]:
            q *= p
        return q

    def pair_scale(self, k: int) -> Fraction:
        """Exact product of the trailing scale pair of a K-limb chain --
        the factor a rescale at this level divides by, and the scale a
        plaintext must be encoded at for scale-neutral ct-pt products."""
        assert k > len(self.base_primes)
        return Fraction(self.data_primes[k - 1] * self.data_primes[k - 2])

    # ---- hybrid key-switch digit grouping ----------------------------

    @property
    def alpha(self) -> int:
        """Key-switch digit width (limbs per digit group, 'dnum
        grouping').  alpha=1 is the classic per-limb decomposition."""
        return getattr(self.preset, "digit_width", 1)

    def dnum(self, k: int) -> int:
        """Number of digit groups covering the first k data limbs."""
        return -(-k // self.alpha)

    @functools.cache
    def digit_groups(self, k: int) -> tuple[tuple[int, ...], ...]:
        """The prime content of each digit group at k data limbs (fixed
        alpha-grid prefixes: group j = limbs [j*alpha, (j+1)*alpha) cap k,
        so keys generated at max level slice to any level)."""
        a = self.alpha
        return tuple(tuple(self.data_primes[j * a:min((j + 1) * a, k)])
                     for j in range(self.dnum(k)))

    @property
    def special_product(self) -> int:
        P = 1
        for sp in self.special_primes:
            P *= sp
        return P

    # ---- cached derived tables -------------------------------------

    @functools.cache
    def tables(self, k: int) -> NTTTables:
        """NTT tables over the first k data limbs."""
        return build_ntt_tables(self.n, self.data_primes[:k])

    @functools.cache
    def tables_row(self, idx: int) -> NTTTables:
        """NTT tables for a single chain limb (data then special)."""
        return build_ntt_tables(self.n, (self.full_primes[idx],))

    @functools.cache
    def tables_full(self) -> NTTTables:
        return build_ntt_tables(self.n, self.full_primes)

    @functools.cache
    def tables_ks(self, k: int) -> NTTTables:
        """Tables over first k data limbs + the special primes (the
        extended modulus used inside key switching)."""
        return build_ntt_tables(self.n, self.data_primes[:k] + self.special_primes)

    @functools.cache
    def tables_special(self) -> NTTTables:
        """Tables over the special primes only (mod-down input rows)."""
        return build_ntt_tables(self.n, self.special_primes)

    @functools.cache
    def primes_col(self, k: int) -> np.ndarray:
        # numpy, not device arrays: cached values may be created inside
        # a trace (see hectr_tpu/ckks/ntt.py build_ntt_tables note)
        return np.array(self.data_primes[:k], dtype=np.uint64).reshape(k, 1)

    @functools.cache
    def decode_constants(self, k: int, scale: Fraction) -> DecodeConstants:
        primes = self.data_primes[:k]
        q = self.q_at(k)
        inv = np.array([pow((q // p) % p, -1, p) for p in primes],
                       dtype=np.uint64).reshape(k, 1)
        ratio = Fraction(q) / scale
        hi = float(ratio)
        lo = float(ratio - Fraction(hi))
        return DecodeConstants(
            inv=inv,
            p_f64=np.array(primes, dtype=np.float64).reshape(k, 1),
            q_over_scale_hi=hi,
            q_over_scale_lo=lo,
        )

    @functools.cache
    def rescale_constants(self, k: int) -> tuple[np.ndarray, np.ndarray, int]:
        """For dropping limb d=k-1: ([d,1] u64 inv of p_d mod p_j,
        its Shoup companion, p_d)."""
        from hectr_tpu.ckks.modmath import shoup

        d = k - 1
        p_d = self.data_primes[d]
        inv = np.array([pow(p_d % p, -1, p) for p in self.data_primes[:d]],
                       dtype=np.uint64).reshape(d, 1)
        pj = np.array(self.data_primes[:d], dtype=np.uint64).reshape(d, 1)
        return inv, shoup(inv, pj), p_d


@functools.lru_cache(maxsize=None)
def make_context(preset: CKKSPreset) -> CKKSContext:
    n = 1 << preset.logn
    two_n = 2 * n
    # special primes are drawn FIRST (the largest 30-bit NTT primes):
    # key-switch noise scales with (digit-group product) / (special
    # product), so the specials must dominate every width-alpha group
    special = tuple(find_ntt_primes(30, preset.special_limbs, two_n))
    base = tuple(find_ntt_primes(30, 2, two_n, avoid=set(special)))
    pairs = find_scale_prime_pairs(preset.scale_bits, preset.mult_depth,
                                   two_n, avoid=set(base) | set(special))
    scale_primes = tuple(q for pair in pairs for q in pair)
    ctx = CKKSContext(
        preset=preset, n=n, slots=preset.slots, depth=preset.mult_depth,
        base_primes=base, scale_primes=scale_primes, special_primes=special,
    )
    # key-switch noise sanity: every digit-group product must not exceed
    # the special-prime product (digit magnitude / P is the noise ratio)
    P = ctx.special_product
    for grp in ctx.digit_groups(ctx.max_limbs):
        Qj = 1
        for q in grp:
            Qj *= q
        assert Qj <= P, (
            f"digit group product {Qj.bit_length()}b exceeds special "
            f"product {P.bit_length()}b: raise special_limbs or lower "
            f"digit_width (preset {preset.name})")
    return ctx
