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


# Measured single-chip fused-kernel cost (v5e via the axon tunnel,
# DESIGN.md §5.1, 2026-08-21): 7.9 us per limb-NTT at logN=15, scaling
# ~ N log N.  Published v5e ICI: 2D torus, 4 links/chip, ~45 GB/s
# one-way per link (jax-ml.github.io/scaling-book hardware table).
_T_LIMB_NTT_LOGN15_US = 7.9
_V5E_ICI_GBPS = 45.0


def analytic_ici_efficiency(logn: int, limbs: int, D: int,
                            bw_gbs: float = _V5E_ICI_GBPS,
                            t_limb_us: float | None = None,
                            latency_us: float = 2.0) -> dict:
    """Predicted coefficient-sharded NTT scaling efficiency on real ICI
    (VERDICT r3 #3): the virtual-CPU-mesh measurement cannot speak for
    the target hardware, but the model's inputs are all measured or
    published, so the prediction is checkable arithmetic:

      T_comp(D) = limbs * t_limb(logn) / D          (kernel is
                  compute-bound at ~33/820 GB/s of HBM, so compute
                  divides cleanly with the coefficient shard)
      T_comm(D) = log2(D) * (latency + (n/D)*4B*limbs / bw)
                  (each cross-shard butterfly stage is ONE paired
                  neighbor ppermute of the full local chunk -- the
                  butterfly-minimum traffic, see module docstring)
      eff(D)    = T_comp(D) / (T_comp(D) + T_comm(D))

    t_limb defaults to the measured 7.9 us at logN=15 scaled by
    (N log N); bw is one ICI link's one-way bandwidth (each stage
    exchange is a disjoint neighbor pairing, so per-link bandwidth is
    the right denominator on a torus).  No overlap of compute with
    communication is assumed (conservative: the local stages of chunk
    j+1 could hide the exchange of chunk j when batching).

    NOTE this models sharding ONE transform's coefficient axis -- the
    latency-bound regime.  Throughput workloads shard the limb/batch
    axes first (embarrassingly parallel, no in-transform communication,
    efficiency ~= 1.0 until limbs*batch < D); coefficient sharding is
    for when a single ring must not fit (or must not wait) on one chip.
    """
    n = 1 << logn
    if t_limb_us is None:
        base_n = 1 << 15
        t_limb_us = (_T_LIMB_NTT_LOGN15_US
                     * (n * logn) / (base_n * 15))
    t_comp = limbs * t_limb_us / D
    if D <= 1:
        return {"D": D, "efficiency": 1.0, "t_comp_us": t_comp,
                "t_comm_us": 0.0}
    bytes_per_stage = (n // D) * 4 * limbs
    t_comm = int(np.log2(D)) * (latency_us + bytes_per_stage
                                / (bw_gbs * 1e3))  # GB/s -> B/us
    return {"D": D, "efficiency": round(t_comp / (t_comp + t_comm), 4),
            "t_comp_us": round(t_comp, 2), "t_comm_us": round(t_comm, 2),
            "bytes_per_device": ppermute_bytes_per_transform(n, limbs, D)}


def ici_efficiency_table(limbs: int = 22,
                         logns=(15, 16, 17),
                         Ds=(2, 4, 8)) -> dict:
    """The prediction grid + the 70%-crossover statement emitted into
    the MULTICHIP record (BASELINE north star: >=70% at 2+ hosts).
    The multi-HOST (DCN) road to >=70% is the batch/limb axes -- zero
    in-transform traffic, predicted ~1.0 -- with coefficient sharding
    kept intra-host on ICI, where this table says how far it pays."""
    grid = {}
    crossover = []
    for logn in logns:
        row = {}
        for D in Ds:
            e = analytic_ici_efficiency(logn, limbs, D)
            row[f"{D}dev"] = e["efficiency"]
            if e["efficiency"] >= 0.70:
                crossover.append(f"logN={logn},D={D}")
        grid[f"logn{logn}"] = row
    return {
        "model": ("eff = T_comp/(T_comp+T_comm); T_comp = limbs*t_limb"
                  "(logn)/D with measured t_limb(15) = 7.9 us; T_comm "
                  "= log2(D)*(2 us + (N/D)*4B*limbs / 45 GB/s ICI "
                  "link, v5e)"),
        "limbs": limbs,
        "predicted_efficiency": grid,
        "meets_70pct": crossover,
        "note": ("coefficient sharding of a single transform; "
                 "limb/batch sharding has no in-transform comm and "
                 "predicts ~1.0 -- that is the >=70% multi-host path"),
    }


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
