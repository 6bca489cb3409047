"""Negacyclic NTT / inverse NTT over RNS limb arrays (jittable).

The core compute primitive of the CKKS rebuild -- every polynomial
multiply, key switch and rotation runs through these transforms
(SURVEY.md §7 Phase 1; BASELINE.json metric "NTTs/sec per chip").

Algorithm: the merged-psi iterative transforms of Longa & Naehrig
("Speeding up the NTT", 2016): the forward transform is Cooley-Tukey
butterflies with the 2N-th root psi's powers in bit-reversed order
(negacyclic wrap folded into the twiddles, no separate pre-scaling);
the inverse is Gentleman-Sande with psi^-1 powers, scaled by N^-1 at
the end.  Forward maps natural -> bit-reversed coefficient order;
inverse maps bit-reversed -> natural; pointwise products happen in the
bit-reversed NTT domain so the composition is order-consistent.

Layout: residues are uint32[..., L, N]; each stage is one reshape to
[..., L, groups, 2, half] plus vectorized Shoup-multiply/add/sub --
log2(N) fused elementwise passes, XLA-friendly static shapes, and the
(L, N) axes are the mesh-shardable axes.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from hectr_tpu.ckks.modmath import (
    add_mod_u32,
    barrett_constants,
    mul_mod,
    mul_mod_shoup_u32,
    sub_mod_u32,
)
from hectr_tpu.ckks.primes import root_of_unity


def bit_reverse_indices(n: int) -> np.ndarray:
    logn = n.bit_length() - 1
    idx = np.arange(n)
    out = np.zeros(n, dtype=np.int64)
    for b in range(logn):
        out |= ((idx >> b) & 1) << (logn - 1 - b)
    return out


@dataclasses.dataclass(frozen=True)
class NTTTables:
    """Per-prime-chain precomputed transform tables (device constants)."""

    n: int
    primes: tuple[int, ...]
    p: np.ndarray          # [L, 1] uint64
    mu: np.ndarray         # [L, 1] uint64  Barrett mu
    k: np.ndarray          # [L, 1] uint64  Barrett shift base
    psi_rev: np.ndarray        # [L, N] uint32   psi^brv(i)
    psi_rev_shoup: np.ndarray  # [L, N] uint64
    psi_inv_rev: np.ndarray    # [L, N] uint32   psi^-brv(i)
    psi_inv_rev_shoup: np.ndarray
    n_inv: np.ndarray          # [L, 1] uint32   N^-1 mod p
    n_inv_shoup: np.ndarray    # [L, 1] uint64
    p32: np.ndarray = None     # [L, 1] uint32 (u32 butterfly path)


@functools.lru_cache(maxsize=None)
def build_ntt_tables(n: int, primes: tuple[int, ...]) -> NTTTables:
    L = len(primes)
    brv = bit_reverse_indices(n)
    psi_rev = np.empty((L, n), dtype=np.uint32)
    psi_inv_rev = np.empty((L, n), dtype=np.uint32)
    n_inv = np.empty((L, 1), dtype=np.uint32)
    p_arr, mu, k = barrett_constants(list(primes))
    for i, p in enumerate(primes):
        psi = root_of_unity(p, 2 * n)
        psi_inv = pow(psi, -1, p)
        pows = np.empty(n, dtype=object)
        pows_inv = np.empty(n, dtype=object)
        acc = 1
        acc_inv = 1
        for j in range(n):
            pows[j] = acc
            pows_inv[j] = acc_inv
            acc = acc * psi % p
            acc_inv = acc_inv * psi_inv % p
        psi_rev[i] = pows[brv].astype(np.uint32)
        psi_inv_rev[i] = pows_inv[brv].astype(np.uint32)
        n_inv[i, 0] = pow(n, -1, p)

    def _shoup(w32, pcol):
        # Shoup companions are < 2^32 by construction (w < p): store as
        # uint32 so the butterfly runs in pure 32-bit arithmetic.
        return (((w32.astype(object) << 32) // pcol.astype(object))
                % (1 << 32)).astype(np.uint32)

    # NOTE: tables hold host numpy arrays, NOT device arrays: this
    # builder is lru-cached and may first run inside a jit/scan trace,
    # where jnp.asarray would capture a trace-local constant tracer and
    # poison every later trace (verified on jax 0.9).  numpy constants
    # convert to trace-local constants at each use site instead.
    p_np = p_arr  # [L,1] uint64
    return NTTTables(
        n=n, primes=primes,
        p=p_arr, mu=mu, k=k,
        psi_rev=psi_rev,
        psi_rev_shoup=_shoup(psi_rev, p_np),
        psi_inv_rev=psi_inv_rev,
        psi_inv_rev_shoup=_shoup(psi_inv_rev, p_np),
        n_inv=n_inv,
        n_inv_shoup=_shoup(n_inv, p_np),
        p32=p_arr.astype(np.uint32),
    )


def ntt(a: jnp.ndarray, t: NTTTables) -> jnp.ndarray:
    """Forward negacyclic NTT.  a: uint32[..., L, N] natural order ->
    uint32[..., L, N] bit-reversed NTT domain.

    Dispatches to the fused Pallas kernel on TPU backends (one HBM
    read/write for all log2(N) stages); the stage-per-fusion XLA path
    below is the portable fallback (CPU tests, shard_map bodies)."""
    from hectr_tpu.ops.dispatch import use_pallas

    if use_pallas(t.n):
        from hectr_tpu.ops.ntt_pallas import ntt_pallas

        return ntt_pallas(a, t)
    n = t.n
    batch = a.shape[:-2]
    L = a.shape[-2]
    p = t.p32  # [L,1] broadcasts over trailing axes after reshape
    half = n
    m = 1
    while m < n:
        half //= 2
        x = a.reshape(*batch, L, m, 2 * half)
        u = x[..., :half]
        v = x[..., half:]
        S = t.psi_rev[:, m:2 * m]
        Ssh = t.psi_rev_shoup[:, m:2 * m]
        pcol = p[..., None]  # [L,1,1]
        v = mul_mod_shoup_u32(v, S[..., None], Ssh[..., None], pcol)
        a = jnp.concatenate([add_mod_u32(u, v, pcol), sub_mod_u32(u, v, pcol)],
                            axis=-1).reshape(*batch, L, n)
        m *= 2
    return a


def intt(a: jnp.ndarray, t: NTTTables) -> jnp.ndarray:
    """Inverse negacyclic NTT.  uint32[..., L, N] bit-reversed NTT
    domain -> natural-order coefficients.  Pallas-fused on TPU (see
    ntt)."""
    from hectr_tpu.ops.dispatch import use_pallas

    if use_pallas(t.n):
        from hectr_tpu.ops.ntt_pallas import intt_pallas

        return intt_pallas(a, t)
    n = t.n
    batch = a.shape[:-2]
    L = a.shape[-2]
    p = t.p32
    half = 1
    m = n
    while m > 1:
        h = m // 2
        x = a.reshape(*batch, L, h, 2 * half)
        u = x[..., :half]
        v = x[..., half:]
        S = t.psi_inv_rev[:, h:2 * h]
        Ssh = t.psi_inv_rev_shoup[:, h:2 * h]
        pcol = p[..., None]
        s = add_mod_u32(u, v, pcol)
        d = mul_mod_shoup_u32(sub_mod_u32(u, v, pcol),
                              S[..., None], Ssh[..., None], pcol)
        a = jnp.concatenate([s, d], axis=-1).reshape(*batch, L, n)
        half *= 2
        m = h
    return mul_mod_shoup_u32(a, t.n_inv, t.n_inv_shoup, p)


def pointwise_mul(a: jnp.ndarray, b: jnp.ndarray, t: NTTTables) -> jnp.ndarray:
    """Elementwise product in the NTT domain (Barrett)."""
    return mul_mod(a, b, t.p, t.mu, t.k)


def negacyclic_mul(a: jnp.ndarray, b: jnp.ndarray, t: NTTTables) -> jnp.ndarray:
    """Polynomial product mod X^N + 1 (per limb): intt(ntt(a) * ntt(b))."""
    return intt(pointwise_mul(ntt(a, t), ntt(b, t), t), t)
