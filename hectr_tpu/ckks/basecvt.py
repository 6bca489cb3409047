"""Fast RNS base conversion (exact centered CRT with float correction).

The workhorse of hybrid key switching: digits (values known modulo a
small product Q_J of chain primes) must be re-expressed modulo *other*
primes of the chain (reference capability: GPQHE's key-switch digit
decomposition behind he_gemv, src/hempc.c:257-259; the bignum route
there is libgcrypt MPI arithmetic, src/ctr.c:515-516 -- here it is a
vectorized uint32/float64 pipeline with no bignums anywhere).

Given residues x_i = [d]_{q_i} of a centered value d in (-Q/2, Q/2],
Q = prod q_i:

    y_i = [x_i * (Q/q_i)^{-1}]_{q_i}                  (per-limb Shoup mul)
    d   = sum_i y_i * (Q/q_i)  -  v * Q,  v = round(sum_i y_i / q_i)
    [d]_{p_t} = sum_i y_i * [(Q/q_i)]_{p_t} - v * [Q]_{p_t}   (mod p_t)

The float64 correction v is a small integer in [0, g] (g = #limbs);
an off-by-one rounding near a half-integer boundary shifts d by +-Q,
which preserves d mod every source prime (it only perturbs the
key-switch noise by a bounded amount), so the conversion is
*correctness-exact* for key switching at any rounding outcome.

All arrays are [..., g, N] uint32 residues; everything jits; constants
are host numpy (safe to build inside a trace, see ntt.build_ntt_tables).
"""

from __future__ import annotations

import dataclasses
import functools

import jax.numpy as jnp
import numpy as np

from hectr_tpu.ckks.modmath import barrett_constants, shoup


@dataclasses.dataclass(frozen=True)
class BaseConvConstants:
    """Host-side constants for one (from_primes -> to_primes) conversion."""

    g: int                      # source limb count
    t: int                      # target limb count
    q_col: np.ndarray           # [g, 1] uint64 source primes
    inv: np.ndarray             # [g, 1] uint64 (Q/q_i)^-1 mod q_i
    inv_shoup: np.ndarray       # [g, 1] uint64
    q_f64: np.ndarray           # [g, 1] float64 source primes
    M: np.ndarray               # [g, t] uint64 (Q/q_i) mod p_t
    M_shoup: np.ndarray         # [g, t] uint64 floor(M * 2^32 / p_t)
    Qmod: np.ndarray            # [t, 1] uint32 Q mod p_t
    p: np.ndarray               # [t, 1] uint64 target primes
    mu: np.ndarray              # [t, 1] uint64 Barrett mu
    k: np.ndarray               # [t, 1] uint64 Barrett shift


@functools.lru_cache(maxsize=None)
def base_conv_constants(from_primes: tuple[int, ...],
                        to_primes: tuple[int, ...]) -> BaseConvConstants:
    g, t = len(from_primes), len(to_primes)
    Q = 1
    for q in from_primes:
        Q *= q
    inv = np.array([pow((Q // q) % q, -1, q) for q in from_primes],
                   dtype=np.uint64).reshape(g, 1)
    q_col = np.array(from_primes, dtype=np.uint64).reshape(g, 1)
    M = np.empty((g, t), dtype=np.uint64)
    M_shoup = np.empty((g, t), dtype=np.uint64)
    for i, q in enumerate(from_primes):
        Qi = Q // q
        for j, p in enumerate(to_primes):
            M[i, j] = Qi % p
            M_shoup[i, j] = ((Qi % p) << 32) // p
    Qmod = np.array([Q % p for p in to_primes],
                    dtype=np.uint32).reshape(t, 1)
    p, mu, k = barrett_constants(list(to_primes))
    return BaseConvConstants(
        g=g, t=t, q_col=q_col, inv=inv, inv_shoup=shoup(inv, q_col),
        q_f64=q_col.astype(np.float64), M=M, M_shoup=M_shoup,
        Qmod=Qmod, p=p, mu=mu, k=k)


@dataclasses.dataclass(frozen=True)
class GroupedConvConstants:
    """Constants for converting dnum digit groups (each a width-alpha
    slice of the data chain, the last possibly truncated and padded
    with inert dummy limbs) to one common target chain."""

    dnum: int
    alpha: int
    t: int
    q_col: np.ndarray       # [dnum, alpha, 1] uint64 (dummy rows = 1)
    inv: np.ndarray         # [dnum, alpha, 1] uint64 (dummy rows = 0)
    inv_shoup: np.ndarray   # [dnum, alpha, 1] uint64
    q_f64: np.ndarray       # [dnum, alpha, 1] float64
    M: np.ndarray           # [dnum, alpha, t] uint64 (Q_j/q_i) mod p_t
    M_shoup: np.ndarray     # [dnum, alpha, t] uint64 floor(M * 2^32 / p_t)
    Qmod: np.ndarray        # [dnum, t, 1] uint32 Q_j mod p_t
    p: np.ndarray           # [t, 1] uint64
    mu: np.ndarray          # [t, 1] uint64
    k: np.ndarray           # [t, 1] uint64


@functools.lru_cache(maxsize=None)
def grouped_conv_constants(groups: tuple[tuple[int, ...], ...],
                           to_primes: tuple[int, ...]) -> GroupedConvConstants:
    dnum = len(groups)
    alpha = max(len(g) for g in groups)
    t = len(to_primes)
    q_col = np.ones((dnum, alpha, 1), dtype=np.uint64)
    inv = np.zeros((dnum, alpha, 1), dtype=np.uint64)
    M = np.zeros((dnum, alpha, t), dtype=np.uint64)
    M_shoup = np.zeros((dnum, alpha, t), dtype=np.uint64)
    Qmod = np.empty((dnum, t, 1), dtype=np.uint32)
    for j, grp in enumerate(groups):
        Qj = 1
        for q in grp:
            Qj *= q
        for i, q in enumerate(grp):
            q_col[j, i, 0] = q
            inv[j, i, 0] = pow((Qj // q) % q, -1, q)
            Qi = Qj // q
            for tt, p in enumerate(to_primes):
                M[j, i, tt] = Qi % p
                M_shoup[j, i, tt] = ((Qi % p) << 32) // p
        for tt, p in enumerate(to_primes):
            Qmod[j, tt, 0] = Qj % p
    p, mu, k = barrett_constants(list(to_primes))
    return GroupedConvConstants(
        dnum=dnum, alpha=alpha, t=t, q_col=q_col, inv=inv,
        inv_shoup=shoup(inv, q_col), q_f64=q_col.astype(np.float64),
        M=M, M_shoup=M_shoup, Qmod=Qmod, p=p, mu=mu, k=k)


def grouped_convert(x: jnp.ndarray, c: GroupedConvConstants) -> jnp.ndarray:
    """Grouped residues [dnum, alpha, N] (dummy rows zero) -> centered
    per-group values' residues over the target chain [dnum, t, N].
    Vectorized over dnum; the only host loop is over alpha (<= 3)."""
    from hectr_tpu.ckks.modmath import (add_mod, mul_mod, mul_mod_shoup,
                                        mul_mod_shoup_wide, sub_mod)

    y = mul_mod_shoup(x, jnp.asarray(c.inv), jnp.asarray(c.inv_shoup),
                      jnp.asarray(c.q_col))              # [dnum, alpha, N]
    v = jnp.round(jnp.sum(y.astype(jnp.float64) / c.q_f64, axis=-2)
                  ).astype(jnp.uint32)                   # [dnum, N]
    acc = jnp.zeros((c.dnum, c.t, x.shape[-1]), dtype=jnp.uint32)
    for i in range(c.alpha):
        # y_i is a residue of q_i, NOT reduced mod p_t: wide Shoup
        term = mul_mod_shoup_wide(y[:, i, None, :],
                                  jnp.asarray(c.M[:, i, :, None]),
                                  jnp.asarray(c.M_shoup[:, i, :, None]),
                                  c.p)                   # [dnum, t, N]
        acc = add_mod(acc, term, c.p)
    corr = mul_mod(v[:, None, :], jnp.asarray(c.Qmod), c.p, c.mu, c.k)
    return sub_mod(acc, corr, c.p)


def base_convert(x: jnp.ndarray, c: BaseConvConstants) -> jnp.ndarray:
    """Residues [..., g, N] over from_primes -> centered-value residues
    [..., t, N] over to_primes.  Coefficient domain in, coefficient
    domain out."""
    from hectr_tpu.ckks.modmath import (add_mod, mul_mod, mul_mod_shoup,
                                        mul_mod_shoup_wide, sub_mod)

    y = mul_mod_shoup(x, jnp.broadcast_to(c.inv, x.shape[:-1] + (1,)),
                      jnp.broadcast_to(c.inv_shoup, x.shape[:-1] + (1,)),
                      c.q_col)                           # [..., g, N]
    v = jnp.round(jnp.sum(y.astype(jnp.float64) / c.q_f64, axis=-2)
                  ).astype(jnp.uint32)                   # [..., N], <= g
    # acc_t = sum_i y_i * M[i, t]: y_i is a residue of q_i, NOT reduced
    # mod p_t, so the product is out of Barrett's domain -> wide Shoup
    acc = jnp.zeros(x.shape[:-2] + (c.t, x.shape[-1]), dtype=jnp.uint32)
    for i in range(c.g):
        term = mul_mod_shoup_wide(y[..., i:i + 1, :],
                                  jnp.asarray(c.M[i].reshape(c.t, 1)),
                                  jnp.asarray(c.M_shoup[i].reshape(c.t, 1)),
                                  c.p)                   # [..., t, N]
        acc = add_mod(acc, term, c.p)
    corr = mul_mod(v[..., None, :], jnp.asarray(c.Qmod), c.p, c.mu, c.k)
    return sub_mod(acc, corr, c.p)
