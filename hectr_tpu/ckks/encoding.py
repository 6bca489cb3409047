"""CKKS canonical-embedding encode/decode (any slot count up to N/2).

Capability of GPQHE's `he_ecd`/`he_dcd` (call sites src/ctr.c:466-470,
489-494): encode a complex slot vector into an integer polynomial at
scale Delta, and back.  The reference packs `slots` values with
slots << N/2 (16 slots in a 4096-ring, src/ctr.c:511) but the API is
general up to N/2 -- so is this one.

Design: for s slots (s | N/2, power of two) the encoded polynomial is
sparse -- m(X) = m'(X^{N/2s}) with m' in the 2s-dimensional subring
Z[Y]/(Y^{2s}+1) -- equivalently the value vector replicated N/(2s)
times across the full slot space.  Encode/decode therefore only needs
the *subring's* canonical embedding, which is evaluated two ways behind
one interface:

  * s <= _MATRIX_MAX_SLOTS: an [s, 2s] matrix transform (two real
    matmuls; exact-to-f64, trivially jittable).
  * larger s (up to N/2): an O(s log s) iterative *complex negacyclic
    FFT* on (re, im) float64 pairs -- the same Longa-Naehrig merged-psi
    butterfly structure and the same evaluation-point indexing
    e_i = 2*bitreverse(i)+1 as the modular NTT (hectr_tpu.ckks.ntt),
    with psi = exp(i*pi/2s).  Slot i lives at the evaluation index
    holding exponent 5^i mod 4s; its conjugate partner at -5^i mod 4s
    carries conj(v_i), which makes the inverse transform land on real
    coefficients.  TPU has no complex128, so everything is real f64
    pairs.

Slot rotations compose correctly with this packing: a full-ring Galois
rotation by r rotates each replica consistently, i.e. rotates the
s-vector by r (SURVEY.md §2.3 he_gemv contract).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

# Above this slot count the O(s^2) matrix embedding gives way to the
# O(s log s) FFT path.  The matrix path is kept for small s: it is the
# long-validated reference used by the acceptance tests, and the FFT
# path is differentially tested against it.
_MATRIX_MAX_SLOTS = 64


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


# ---------------------------------------------------------------------------
# complex negacyclic FFT path (large slot counts)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _cfft_tables(n2: int):
    """Merged-psi twiddle tables for the length-n2 complex negacyclic
    transform, psi = exp(i*pi/n2): (cos, sin) of psi^{brv(i)} and of
    psi^{-brv(i)}, each [n2] float64 (same layout as the modular NTT's
    psi_rev tables)."""
    from hectr_tpu.ckks.ntt import bit_reverse_indices

    brv = bit_reverse_indices(n2)
    ang = np.pi * brv / n2
    return (np.cos(ang), np.sin(ang), np.cos(ang), -np.sin(ang))


@functools.lru_cache(maxsize=None)
def _slot_indices(slots: int) -> tuple[np.ndarray, np.ndarray]:
    """(pos, cpos): evaluation-point index of slot i (exponent 5^i mod
    4s) and of its conjugate partner (exponent -5^i mod 4s) in the
    length-2s negacyclic transform output."""
    from hectr_tpu.ckks.ntt import bit_reverse_indices

    n2 = 2 * slots
    e = (2 * bit_reverse_indices(n2) + 1) % (2 * n2)
    where = {int(exp): i for i, exp in enumerate(e)}
    pos = np.empty(slots, dtype=np.int32)
    cpos = np.empty(slots, dtype=np.int32)
    g = 1
    for i in range(slots):
        pos[i] = where[g]
        cpos[i] = where[(2 * n2 - g) % (2 * n2)]
        g = (g * 5) % (2 * n2)
    return pos, cpos


def _cfft_fwd(re: jnp.ndarray, im: jnp.ndarray, n2: int):
    """Forward complex negacyclic FFT (CT, natural -> bit-reversed
    evaluation order), mirroring ntt()'s stage loop."""
    cr, ci, _, _ = _cfft_tables(n2)
    half, m = n2, 1
    while m < n2:
        half //= 2
        xr = re.reshape(m, 2 * half)
        xi = im.reshape(m, 2 * half)
        ur, vr = xr[:, :half], xr[:, half:]
        ui, vi = xi[:, :half], xi[:, half:]
        sr = jnp.asarray(cr[m:2 * m])[:, None]
        si = jnp.asarray(ci[m:2 * m])[:, None]
        tr = vr * sr - vi * si
        ti = vr * si + vi * sr
        re = jnp.concatenate([ur + tr, ur - tr], axis=1).reshape(n2)
        im = jnp.concatenate([ui + ti, ui - ti], axis=1).reshape(n2)
        m *= 2
    return re, im


def _cfft_inv(re: jnp.ndarray, im: jnp.ndarray, n2: int):
    """Inverse (GS, bit-reversed -> natural), scaled by 1/n2."""
    _, _, cr, ci = _cfft_tables(n2)
    half, m = 1, n2
    while m > 1:
        h = m // 2
        xr = re.reshape(h, 2 * half)
        xi = im.reshape(h, 2 * half)
        ur, vr = xr[:, :half], xr[:, half:]
        ui, vi = xi[:, :half], xi[:, half:]
        sr = jnp.asarray(cr[h:2 * h])[:, None]
        si = jnp.asarray(ci[h:2 * h])[:, None]
        dr, di = ur - vr, ui - vi
        re = jnp.concatenate([ur + vr, dr * sr - di * si], axis=1).reshape(n2)
        im = jnp.concatenate([ui + vi, dr * si + di * sr], axis=1).reshape(n2)
        half *= 2
        m = h
    return re / n2, im / n2


# ---------------------------------------------------------------------------
# public embedding API
# ---------------------------------------------------------------------------


def embed_ri(vre: jnp.ndarray, vim: jnp.ndarray, slots: int) -> jnp.ndarray:
    """Slot values (re, im)[s] -> real subring coefficients m'[2s]
    (unscaled).  Real-only arithmetic: TPU has no complex128, so the
    whole compute path stays in f64 pairs."""
    if slots <= _MATRIX_MAX_SLOTS:
        ReE, ImE = embedding_matrices(slots)
        return (jnp.asarray(ReE).T @ vre + jnp.asarray(ImE).T @ vim) / slots
    n2 = 2 * slots
    pos, cpos = _slot_indices(slots)
    wre = jnp.zeros(n2, dtype=jnp.float64)
    wim = jnp.zeros(n2, dtype=jnp.float64)
    wre = wre.at[jnp.asarray(pos)].set(vre).at[jnp.asarray(cpos)].set(vre)
    wim = wim.at[jnp.asarray(pos)].set(vim).at[jnp.asarray(cpos)].set(-vim)
    mre, _ = _cfft_inv(wre, wim, n2)   # imaginary part is ~0 by symmetry
    return mre


def embed(v, slots: int) -> jnp.ndarray:
    """Complex slot values v[s] -> real subring coefficients (host/CPU
    convenience wrapper over embed_ri)."""
    v = np.asarray(v, dtype=np.complex128)
    return embed_ri(jnp.asarray(v.real), jnp.asarray(v.imag), slots)


def unembed(m: jnp.ndarray, slots: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Real subring coefficients m'[2s] -> slot values (re[s], im[s])."""
    if slots <= _MATRIX_MAX_SLOTS:
        ReE, ImE = embedding_matrices(slots)
        return jnp.asarray(ReE) @ m, jnp.asarray(ImE) @ m
    pos, _ = _slot_indices(slots)
    fre, fim = _cfft_fwd(m, jnp.zeros_like(m), 2 * slots)
    idx = jnp.asarray(pos)
    return fre[idx], fim[idx]


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
