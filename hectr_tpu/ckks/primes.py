"""NTT-friendly prime chains and roots of unity (host side, exact ints).

The reference's GPQHE works over a single power-of-two modulus
q = 2^109 held in libgcrypt bignums (src/ctr.c:515-516).  The RNS
rebuild replaces that with a chain of primes p ≡ 1 (mod 2N), each
< 2^30 so products of residues fit comfortably in (emulated) uint64 and
in the 32-bit Pallas kernel path.  The CKKS scale Δ = 2^50
(src/ctr.c:517) is realised as *pairs* of ~25-bit primes whose product
approximates Δ; rescaling divides by such a pair and the per-level
scale is tracked exactly.
"""

from __future__ import annotations

import sympy


def is_prime(n: int) -> bool:
    return sympy.isprime(n)


def find_ntt_primes(bits: int, count: int, two_n: int,
                    avoid: set[int] | None = None) -> list[int]:
    """Find `count` primes p ≡ 1 (mod two_n) just below 2**bits,
    scanning downward (deterministic for reproducible contexts)."""
    avoid = avoid or set()
    out = []
    p = (1 << bits) - (1 << bits) % two_n + 1
    while len(out) < count:
        if p < (1 << (bits - 1)):
            raise RuntimeError(f"not enough {bits}-bit NTT primes")
        if p not in avoid and is_prime(p):
            out.append(p)
        p -= two_n
    return out


def find_scale_prime_pairs(scale_bits: int, pairs: int, two_n: int,
                           avoid: set[int] | None = None
                           ) -> list[tuple[int, int]]:
    """Find `pairs` of primes (p, q), each ≡ 1 mod two_n, with p*q as
    close to 2**scale_bits as possible (composite rescaling: dividing a
    ciphertext by p*q drops the scale by ~2**scale_bits).

    Each pair's product is within relative ~2^-20 of the target; the
    exact per-level scale is tracked, so closeness only bounds scale
    drift, not correctness.
    """
    avoid = set(avoid or set())
    half = scale_bits // 2
    out = []
    target = 1 << scale_bits
    p = (1 << half) + 1  # scan upward from 2^half
    p += (-(p - 1)) % two_n
    while len(out) < pairs:
        # Gather ~32 candidate p's, find each one's closest-prime
        # partner, keep the globally best-balanced pair.
        cands = []
        scan = p
        while len(cands) < 32:
            if scan >= (1 << (half + 2)):
                raise RuntimeError("not enough scale primes")
            if scan not in avoid and is_prime(scan):
                cands.append(scan)
            scan += two_n
        best_pair = None
        for cp in cands:
            q0 = target // cp
            q0 -= (q0 - 1) % two_n
            partner = None
            for delta in range(0, 400):
                for q in (q0 + delta * two_n, q0 - delta * two_n):
                    if q > 2 and q != cp and q not in avoid and is_prime(q):
                        if partner is None or abs(cp * q - target) < abs(cp * partner - target):
                            partner = q
                if partner is not None:
                    break
            if partner is not None:
                err = abs(cp * partner - target)
                if best_pair is None or err < best_pair[0]:
                    best_pair = (err, cp, partner)
        assert best_pair is not None
        _, cp, cq = best_pair
        out.append((cp, cq))
        avoid.add(cp)
        avoid.add(cq)
    return out


def primitive_root(p: int) -> int:
    """Smallest generator of Z_p^* (p prime)."""
    return sympy.primitive_root(p)


def root_of_unity(p: int, order: int) -> int:
    """A primitive `order`-th root of unity mod p (order | p-1)."""
    assert (p - 1) % order == 0, (p, order)
    g = primitive_root(p)
    w = pow(g, (p - 1) // order, p)
    assert pow(w, order, p) == 1 and pow(w, order // 2, p) == p - 1
    return w
