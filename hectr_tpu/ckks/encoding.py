"""CKKS canonical-embedding encode/decode (sparse slot packing).

Capability of GPQHE's `he_ecd`/`he_dcd` (call sites src/ctr.c:466-470,
489-494): encode a complex slot vector into an integer polynomial at
scale Delta, and back.  The reference packs `slots` values with
slots << N/2 (16 slots in a 4096-ring, src/ctr.c:511).

Design: for s slots (s | N/2, power of two) the encoded polynomial is
sparse -- m(X) = m'(X^{N/2s}) with m' in the 2s-dimensional subring
Z[Y]/(Y^{2s}+1) -- equivalently the value vector replicated N/(2s)
times across the full slot space.  Encode/decode therefore only needs
the *subring's* canonical embedding: an [s, 2s] matrix with
E[i, j] = omega^{g_i j}, omega = exp(2*pi*i/4s), g_i = 5^i mod 4s.
For the slot counts this framework targets (<= 2^10) the matrix
transform is small, exact to f64, and jit-friendly (two real matmuls);
a special-FFT path for full-slot packing can slot in behind the same
interface later.

Slot rotations compose correctly with this packing: a full-ring Galois
rotation by r rotates each replica consistently, i.e. rotates the
s-vector by r (SURVEY.md §2.3 he_gemv contract).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def embedding_matrices(slots: int) -> tuple[np.ndarray, np.ndarray]:
    """(ReE, ImE), each [s, 2s]: E[i, j] = omega^{g_i j}."""
    s = slots
    g = 1
    gs = []
    for _ in range(s):
        gs.append(g)
        g = (g * 5) % (4 * s)
    j = np.arange(2 * s)
    ang = 2.0 * np.pi * np.outer(np.array(gs), j) / (4.0 * s)
    return np.cos(ang), np.sin(ang)


def embed_ri(vre: jnp.ndarray, vim: jnp.ndarray, slots: int) -> jnp.ndarray:
    """Slot values (re, im)[s] -> real subring coefficients m'[2s]
    (unscaled): m' = (1/s) * Re(E^H v).  Real-only arithmetic: TPU has
    no complex128, so the whole compute path stays in f64 pairs."""
    ReE, ImE = embedding_matrices(slots)
    return (jnp.asarray(ReE).T @ vre + jnp.asarray(ImE).T @ vim) / slots


def embed(v, slots: int) -> jnp.ndarray:
    """Complex slot values v[s] -> real subring coefficients (host/CPU
    convenience wrapper over embed_ri)."""
    v = np.asarray(v, dtype=np.complex128)
    return embed_ri(jnp.asarray(v.real), jnp.asarray(v.imag), slots)


def unembed(m: jnp.ndarray, slots: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Real subring coefficients m'[2s] -> slot values (re[s], im[s])."""
    ReE, ImE = embedding_matrices(slots)
    return jnp.asarray(ReE) @ m, jnp.asarray(ImE) @ m


def integer_residues(y: jnp.ndarray, primes_col: jnp.ndarray) -> jnp.ndarray:
    """Exact residues of integer-valued float64 y (|y| < 2^60) mod each
    prime (primes_col uint64 [K, 1]) -> uint32 [K, len(y)].

    Three-way exact split y = a1*2^54 + a2*2^27 + a3 keeps every
    conversion and product inside exact-integer f64/uint64 range; f64
    cannot hold 2^54-magnitude integers at unit precision, so folding
    must happen piecewise.
    """
    sign_neg = y < 0
    a = jnp.abs(y)
    a1 = jnp.floor(a / 2.0**54)
    r1 = a - a1 * 2.0**54
    a2 = jnp.floor(r1 / 2.0**27)
    a3 = r1 - a2 * 2.0**27
    a1 = a1.astype(jnp.uint64)[None, :]
    a2 = a2.astype(jnp.uint64)[None, :]
    a3 = a3.astype(jnp.uint64)[None, :]
    p = primes_col  # [K,1]
    c54 = jnp.mod(jnp.uint64(1) << jnp.uint64(54), p)
    c27 = jnp.mod(jnp.uint64(1) << jnp.uint64(27), p)
    # a1 < 2^6, c54 < 2^30 -> products < 2^36; sum < 2^61: safe in u64
    acc = jnp.mod(a1 * c54 + jnp.mod(a2 * c27, p) + a3, p)
    r = jnp.mod(acc, p)
    r = jnp.where(sign_neg[None, :] & (r != 0), p - r, r)
    return r.astype(jnp.uint32)
