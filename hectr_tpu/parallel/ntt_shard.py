"""Coefficient-axis sharded negacyclic NTT (shard_map + ppermute).

The multi-chip scaling path for very large rings (SURVEY.md §7 Phase 5;
BASELINE north star: NTT scaling efficiency >= 70% at 2+ hosts).  The
limb axis is embarrassingly parallel and needs no code; the *long* axis
of the ring is the interesting one -- the structural sibling of
sequence/ring parallelism in attention (SURVEY.md §5).

Decomposition: shard the N coefficients into D contiguous chunks of
C = N/D.  A Cooley-Tukey stage with butterfly distance `half`:

  half >= C  (the first log2 D stages): the partner element lives on
      shard  s ^ (half/C).  One bidirectional ppermute exchanges whole
      chunks; each shard then computes its output locally --
          u-shard:  out = u_own + S * v_recv
          v-shard:  out = u_recv - S * v_own
      The twiddle S is *scalar per (limb, shard)* at these stages
      because a butterfly group (2*half elements) spans whole chunks.

  half < C  (the remaining log2 C stages): fully local; identical to
      the single-chip butterfly loop except each shard reads its own
      slice of the twiddle table at offset  m + s * (m/D).

Total communication: log2(D) chunk exchanges of C coefficients per
limb = the theoretical minimum for a butterfly network without
all-to-all re-layout; every exchange is nearest-pattern ppermute that
XLA maps onto ICI.

The inverse transform mirrors this: local Gentleman-Sande stages first,
then log2 D cross-shard stages, then the N^-1 scaling.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hectr_tpu.ckks.modmath import add_mod_u32, mul_mod_shoup_u32, sub_mod_u32
from hectr_tpu.ckks.ntt import NTTTables


def _twiddle_at(table, table_sh, idx):
    """Dynamic scalar twiddle per limb: table [L, N] -> [L, 1]."""
    w = jax.lax.dynamic_slice_in_dim(table, idx, 1, axis=1)
    wsh = jax.lax.dynamic_slice_in_dim(table_sh, idx, 1, axis=1)
    return w, wsh


def _local_ct_stages(chunk, t: NTTTables, s, D: int, C: int):
    """Remaining forward (CT) stages, all-local, with shard-offset
    twiddle slices.  chunk [..., L, C] (L = t's limb count, arbitrary
    leading batch dims); s = shard index (traced)."""
    n = t.n
    lead = chunk.shape[:-1]
    p = t.p32
    half = C
    m = n // (2 * C)  # groups at the first local stage
    while half > 1:
        half //= 2
        m *= 2
        loc = m // D  # groups owned by this shard
        S = jax.lax.dynamic_slice_in_dim(
            jnp.asarray(t.psi_rev), m + s * loc, loc, axis=1)
        Ssh = jax.lax.dynamic_slice_in_dim(
            jnp.asarray(t.psi_rev_shoup), m + s * loc, loc, axis=1)
        x = chunk.reshape(lead + (loc, 2 * half))
        u = x[..., :half]
        v = x[..., half:]
        pcol = p[..., None]
        v = mul_mod_shoup_u32(v, S[..., None], Ssh[..., None], pcol)
        chunk = jnp.concatenate(
            [add_mod_u32(u, v, pcol), sub_mod_u32(u, v, pcol)],
            axis=-1).reshape(lead + (C,))
    return chunk


def _local_gs_stages(chunk, t: NTTTables, s, D: int, C: int):
    """Leading inverse (GS) stages, all-local (half = 1 .. C/2)."""
    lead = chunk.shape[:-1]
    p = t.p32
    half = 1
    # iterate half = 1, 2, ..., C/2 ; groups h = n/(2*half)
    while half < C:
        h = t.n // (2 * half)
        loc = h // D
        S = jax.lax.dynamic_slice_in_dim(
            jnp.asarray(t.psi_inv_rev), h + s * loc, loc, axis=1)
        Ssh = jax.lax.dynamic_slice_in_dim(
            jnp.asarray(t.psi_inv_rev_shoup), h + s * loc, loc, axis=1)
        x = chunk.reshape(lead + (loc, 2 * half))
        u = x[..., :half]
        v = x[..., half:]
        pcol = p[..., None]
        ssum = add_mod_u32(u, v, pcol)
        d = mul_mod_shoup_u32(sub_mod_u32(u, v, pcol),
                              S[..., None], Ssh[..., None], pcol)
        chunk = jnp.concatenate([ssum, d], axis=-1).reshape(lead + (C,))
        half *= 2
    return chunk


def local_ntt_fns(t: NTTTables, axis: str, D: int):
    """(fwd_local, inv_local) callables for use INSIDE a shard_map over
    `axis` with D shards: chunk [..., L, C] -> [..., L, C] where L is
    t's limb count and C = N/D the local coefficient chunk.  Exposed
    separately from make_sharded_ntt so whole scheme ops (rescale,
    negacyclic mul, key-switch stages) can fuse several transforms into
    ONE shard_map program instead of bouncing through device_put."""
    n = t.n
    C = n // D
    assert D & (D - 1) == 0 and C >= 2, (D, C)
    perm_pairs = lambda dist: [(i, i ^ dist) for i in range(D)]  # noqa: E731
    p32 = t.p32

    def fwd_local(chunk):
        s = jax.lax.axis_index(axis)
        half = n // 2
        m = 1
        while half >= C:
            dist = half // C
            recv = jax.lax.ppermute(chunk, axis, perm=perm_pairs(dist))
            is_u = (s // dist) % 2 == 0
            idx = m + s // (2 * dist)
            S, Ssh = _twiddle_at(jnp.asarray(t.psi_rev),
                                 jnp.asarray(t.psi_rev_shoup), idx)
            sv_own = mul_mod_shoup_u32(chunk, S, Ssh, p32)
            sv_recv = mul_mod_shoup_u32(recv, S, Ssh, p32)
            out_u = add_mod_u32(chunk, sv_recv, p32)   # u + S v
            out_v = sub_mod_u32(recv, sv_own, p32)     # u_recv - S v_own
            chunk = jnp.where(is_u, out_u, out_v)
            m *= 2
            half //= 2
        return _local_ct_stages(chunk, t, s, D, C)

    def inv_local(chunk):
        s = jax.lax.axis_index(axis)
        chunk = _local_gs_stages(chunk, t, s, D, C)
        half = C
        while half <= n // 2:
            h = n // (2 * half)
            dist = half // C
            recv = jax.lax.ppermute(chunk, axis, perm=perm_pairs(dist))
            is_u = (s // dist) % 2 == 0
            idx = h + s // (2 * dist)
            S, Ssh = _twiddle_at(jnp.asarray(t.psi_inv_rev),
                                 jnp.asarray(t.psi_inv_rev_shoup), idx)
            # u-shard: out = u + v_recv ; v-shard: out = (u_recv - v_own)*S
            out_u = add_mod_u32(chunk, recv, p32)
            out_v = mul_mod_shoup_u32(sub_mod_u32(recv, chunk, p32),
                                      S, Ssh, p32)
            chunk = jnp.where(is_u, out_u, out_v)
            half *= 2
        return mul_mod_shoup_u32(chunk, jnp.asarray(t.n_inv),
                                 jnp.asarray(t.n_inv_shoup), p32)

    return fwd_local, inv_local


def ppermute_bytes_per_transform(n: int, limbs: int, D: int) -> int:
    """Analytic ICI traffic of one sharded [limbs, n] transform:
    log2(D) chunk exchanges x (n/D) uint32 coefficients x limbs,
    bidirectional counted once per device."""
    if D <= 1:
        return 0
    return int(np.log2(D)) * (n // D) * 4 * limbs


def make_sharded_ntt(t: NTTTables, mesh: Mesh, axis: str = "limb"):
    """Build (ntt_fn, intt_fn) operating on [L, N] arrays whose LAST
    axis is sharded over `axis` of the mesh.  D must divide N with
    chunk size >= 2 and D a power of two."""
    D = mesh.shape[axis]
    fwd_local, inv_local = local_ntt_fns(t, axis, D)

    spec = P(None, axis)
    fwd = jax.jit(jax.shard_map(fwd_local, mesh=mesh,
                                in_specs=spec, out_specs=spec))
    inv = jax.jit(jax.shard_map(inv_local, mesh=mesh,
                                in_specs=spec, out_specs=spec))

    def ntt_fn(a):
        return fwd(jax.device_put(a, NamedSharding(mesh, spec)))

    def intt_fn(a):
        return inv(jax.device_put(a, NamedSharding(mesh, spec)))

    return ntt_fn, intt_fn
