"""Fused negacyclic NTT / iNTT as single Pallas TPU kernels.

The XLA path (hectr_tpu/ckks/ntt.py) lowers each butterfly stage to its
own fusion; this kernel runs all log2(N) stages over a VMEM-resident
row, so a transform reads its [N] u32 coefficients from HBM once and
writes them once (BASELINE.json north star: "negacyclic NTT/iNTT
Pallas kernels").

Layout (per grid program = one (limb, batch) row): the N coefficients
live as x[R, 128] with R = N/128, flat index f = r*128 + l.  Every
butterfly stage is expressed uniformly as two static circular rolls
plus a masked select (no lane-granular reshapes, which would force
Mosaic relayouts):

    CT (forward):   s = (x * W) mod p
                    out[u-pos] = x + roll(s, -half)
                    out[v-pos] = roll(x, +half) - s
    GS (inverse):   out[u-pos] = x + roll(x, -half)
                    out[v-pos] = (roll(x, +half) - x) * W

rolls run along sublanes (axis 0) while the butterfly distance
half >= 128 and along lanes (axis 1) below that; roll wrap-around only
lands on positions the mask routes to the other branch.

Twiddle tables stay tiny thanks to a separability identity of the
merged-psi (Longa-Naehrig) twiddles: at a stage with m groups the
group index of position (r, l) splits its bits as g = r_bits:l_bits,
and since  brv(m+g) = N/(2m) + (N/m)*brv(g)  with brv(g) splitting
into independently reversed fields,

    W(r, l) = psi^brv(m + g(r,l)) = B(r) * A(l)  (mod p).

So lane stages carry one [R,1] column and one [1,128] row per stage
(two chained Shoup multiplies), and row stages carry a [R,1] column --
a few KB per limb instead of N-sized expansions.  The builder asserts
the factorization against the exact expanded table.

Modular arithmetic is the pure-uint32 Shoup path of
hectr_tpu.ckks.modmath (same functions, traced into the kernel).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hectr_tpu.ckks.modmath import (
    add_u32_lazy,
    mul_mod_shoup_u32_lazy,
    norm_u32,
    sub_u32_lazy,
)
from hectr_tpu.ckks.ntt import NTTTables

LANES = 128


def pallas_supported(n: int) -> bool:
    """This kernel needs at least two 128-lane rows per polynomial."""
    return n >= 256 and (n & (n - 1)) == 0


def _shoup_u32(w32: np.ndarray, p: np.ndarray) -> np.ndarray:
    """uint32 Shoup companions floor(w * 2^32 / p) for w < p < 2^31."""
    return (((w32.astype(object) << 32) // p.astype(object))
            % (1 << 32)).astype(np.uint32)


def _factor_lane_table(W: np.ndarray, p: int) -> tuple[np.ndarray, np.ndarray]:
    """Exact rank-1 factorization W[r,l] = B[r]*A[l] mod p (asserted)."""
    R, C = W.shape
    B = W[:, 0].astype(np.uint64)                    # A[0] folded into B
    a00_inv = pow(int(W[0, 0]), -1, p)
    A = (W[0].astype(object) * a00_inv % p).astype(np.uint64)
    check = (B[:, None].astype(object) * A[None, :].astype(object)) % p
    assert np.array_equal(check.astype(np.uint64), W.astype(np.uint64)), \
        "lane twiddle table is not rank-1 separable"
    return B.astype(np.uint32), A.astype(np.uint32)


@functools.lru_cache(maxsize=None)
def _pallas_tables(n: int, primes: tuple[int, ...]):
    """Host-side twiddle layouts for the fused kernels (numpy).

    Row stages (half >= 128): wrow [L, Sr, R, 1].
    Lane stages (half < 128): wlA [L, Sl, 1, 128], wlB [L, Sl, R, 1].
    Forward stage order: half = n/2 .. 1.  Inverse: half = 1 .. n/2,
    with N^-1 pre-folded into the final stage's twiddle column (the
    u-branch gets a separate N^-1 scalar multiply in-kernel).
    """
    from hectr_tpu.ckks.ntt import build_ntt_tables

    t = build_ntt_tables(n, primes)
    L = len(primes)
    R = n // LANES
    sr = int(np.log2(R))          # stages with half >= 128
    sl = 7                        # stages with half = 64 .. 1
    p_col = np.array(primes, dtype=np.uint32).reshape(L, 1)

    fwd_row = np.empty((L, sr, R, 1), dtype=np.uint32)
    inv_row = np.empty((L, sr, R, 1), dtype=np.uint32)
    fwd_lA = np.empty((L, sl, 1, LANES), dtype=np.uint32)
    fwd_lB = np.empty((L, sl, R, 1), dtype=np.uint32)
    inv_lA = np.empty((L, sl, 1, LANES), dtype=np.uint32)
    inv_lB = np.empty((L, sl, R, 1), dtype=np.uint32)

    rr = np.arange(R)[:, None]
    ll = np.arange(LANES)[None, :]

    def lane_expanded(table_row: np.ndarray, half: int) -> np.ndarray:
        m = n // (2 * half)
        g = rr * (LANES // (2 * half)) + ll // (2 * half)
        return table_row[m + g]

    for i, p in enumerate(map(int, primes)):
        # forward row stages: half = n/2 .. 128; group g = r // (2*hr)
        half, m = n // 2, 1
        for s in range(sr):
            hr = half // LANES
            fwd_row[i, s, :, 0] = t.psi_rev[i][m + rr[:, 0] // (2 * hr)]
            half //= 2
            m *= 2
        # forward lane stages: half = 64 .. 1
        for s, half in enumerate([64, 32, 16, 8, 4, 2, 1]):
            W = lane_expanded(t.psi_rev[i], half)
            fwd_lB[i, s, :, 0], fwd_lA[i, s, 0] = _factor_lane_table(W, p)
        # inverse lane stages: half = 1 .. 64
        for s, half in enumerate([1, 2, 4, 8, 16, 32, 64]):
            W = lane_expanded(t.psi_inv_rev[i], half)
            inv_lB[i, s, :, 0], inv_lA[i, s, 0] = _factor_lane_table(W, p)
        # inverse row stages: half = 128 .. n/2; fold N^-1 into the last
        half = LANES
        for s in range(sr):
            hr = half // LANES
            h = n // (2 * half)
            w = t.psi_inv_rev[i][h + rr[:, 0] // (2 * hr)].astype(np.uint64)
            if half == n // 2:
                w = w * int(t.n_inv[i, 0]) % p
            inv_row[i, s, :, 0] = w.astype(np.uint32)
            half *= 2

    pr = p_col[:, None, None]
    return dict(
        p32=p_col,
        ninv=t.n_inv[:, :1].astype(np.uint32),
        ninv_sh=_shoup_u32(t.n_inv[:, :1].astype(np.uint32), p_col),
        fwd_row=fwd_row, fwd_row_sh=_shoup_u32(fwd_row, pr),
        fwd_lA=fwd_lA, fwd_lA_sh=_shoup_u32(fwd_lA, pr),
        fwd_lB=fwd_lB, fwd_lB_sh=_shoup_u32(fwd_lB, pr),
        inv_row=inv_row, inv_row_sh=_shoup_u32(inv_row, pr),
        inv_lA=inv_lA, inv_lA_sh=_shoup_u32(inv_lA, pr),
        inv_lB=inv_lB, inv_lB_sh=_shoup_u32(inv_lB, pr),
        sr=sr, sl=sl, R=R,
    )


@functools.lru_cache(maxsize=None)
def _grouped_tables(n: int, primes: tuple[int, ...], gl: int, gb: int):
    """Multi-row grid batching (VERDICT r3 #4 lever 1): stack gl limbs
    x gb batch rows = one grid program, amortizing per-program setup
    (grid scheduling, block DMA latency, per-stage mask iotas) across
    RG = gb*gl*R sublane rows.

    Stacking whole transforms along the sublane axis is numerics-safe:
    at a row stage with butterfly distance hr < R, a u-position row r
    has bit hr CLEAR so its partner r+hr stays inside the same R-block
    (no carry), and a v-position has it SET so r-hr does too; the roll
    wrap-around only ever lands on positions the mask routes to the
    other branch -- exactly the single-transform argument, and the
    (row & hr) mask keeps working because the b,l bits sit above
    log2(R).  Twiddle columns are tiled to RG rows (limb-major inside a
    group, then gb-fold batch tile); the per-limb prime becomes a VMEM
    column so different primes coexist in one program."""
    base = _pallas_tables(n, primes)
    L = len(primes)
    assert L % gl == 0, (L, gl)
    Lg = L // gl
    R = base["R"]
    RG = gb * gl * R

    def regroup(tab_l):                   # [L, s, R, 1] -> [Lg, s, RG, 1]
        s = tab_l.shape[1]
        g = tab_l.reshape(Lg, gl, s, R, 1).transpose(0, 2, 1, 3, 4)
        g = g.reshape(Lg, s, gl * R, 1)
        return np.tile(g, (1, 1, gb, 1))

    def regroup_lane(tab_l):              # [L, s, 1, 128] -> [Lg, s, RG, 128]?
        # lane rows are R-independent: broadcast per limb then tile --
        # keep them [Lg, s, gl, 1, 128] and expand in-kernel?  Simpler:
        # rows within a limb share the same [1,128] row; tile to RG.
        s = tab_l.shape[1]
        g = tab_l.reshape(Lg, gl, s, 1, LANES).transpose(0, 2, 1, 3, 4)
        g = np.broadcast_to(g, (Lg, s, gl, R, LANES))
        g = g.reshape(Lg, s, gl * R, LANES)
        return np.tile(g, (1, 1, gb, 1))

    pcol = np.repeat(np.array(primes, dtype=np.uint32).reshape(Lg, gl),
                     R, axis=1).reshape(Lg, gl * R, 1)
    pcol = np.tile(pcol, (1, gb, 1))
    ninv = np.repeat(base["ninv"][:, 0].reshape(Lg, gl), R,
                     axis=1).reshape(Lg, gl * R, 1)
    ninv = np.tile(ninv, (1, gb, 1))
    ninv_sh = np.repeat(base["ninv_sh"][:, 0].reshape(Lg, gl), R,
                        axis=1).reshape(Lg, gl * R, 1)
    ninv_sh = np.tile(ninv_sh, (1, gb, 1))
    G = gb * gl
    pcol3 = np.tile(np.array(primes, dtype=np.uint32
                             ).reshape(Lg, gl, 1, 1), (1, gb, 1, 1))
    out = dict(
        pcol=pcol, pcol3=pcol3, ninv_col=ninv, ninv_col_sh=ninv_sh,
        sr=base["sr"], sl=base["sl"], R=R, RG=RG, gl=gl, gb=gb,
        G=G, Lg=Lg,
    )
    for name in ("fwd_row", "fwd_row_sh", "inv_row", "inv_row_sh",
                 "fwd_lB", "fwd_lB_sh", "inv_lB", "inv_lB_sh"):
        out[name] = regroup(base[name])
    for name in ("fwd_lA", "fwd_lA_sh", "inv_lA", "inv_lA_sh"):
        # lane-stage A rows broadcast across sublane rows but differ
        # per LIMB: keep them compact as [Lg, s, G, 1, 128] (G = gb*gl
        # row-groups, limb-minor) and apply them on the [G, R, 128]
        # view in-kernel -- expanding to RG rows would cost MBs of
        # VMEM per table for no information
        tab_l = base[name]
        s = tab_l.shape[1]
        g = tab_l.reshape(Lg, gl, s, 1, LANES).transpose(0, 2, 1, 3, 4)
        g = np.tile(g, (1, 1, gb, 1, 1))      # [Lg, s, G, 1, 128]
        out[name] = np.ascontiguousarray(g)
    return out


def _stage_mask(R: int, half: int) -> jnp.ndarray:
    """is-u-position mask for butterfly distance `half` (elements).
    Bitwise AND on int32 iota: div/mod and unsigned iota recurse in
    Mosaic's dtype-conversion lowering helper (jax 0.9)."""
    if half >= LANES:
        hr = half // LANES
        idx = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 0)
        return (idx & hr) == 0
    idx = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 1)
    return (idx & half) == 0


def _roll_u32(x, shift: int, axis: int):
    """Circular roll of a uint32 value.  Mosaic's dynamic_rotate only
    verifies int32 operands, and with jax_enable_x64 a Python-int shift
    would arrive as i64 -- bitcast + explicit int32 shift."""
    return pltpu.bitcast(pltpu.roll(pltpu.bitcast(x, jnp.int32),
                                    jnp.int32(shift), axis), jnp.uint32)


def _rolls(x, half: int, R: int):
    """(value at f+half, value at f-half) via circular rolls."""
    if half >= LANES:
        hr = half // LANES
        return (_roll_u32(x, R - hr, 0), _roll_u32(x, hr, 0))
    return (_roll_u32(x, LANES - half, 1), _roll_u32(x, half, 1))


def _lane_mul(x, wA_ref, wA_sh_ref, p3, s: int, G: int, R: int):
    """Lane-stage A multiply on the [G, R, 128] view: the A row differs
    per limb (per row-group) but broadcasts across the group's R rows."""
    x3 = x.reshape(G, R, LANES)
    xa = mul_mod_shoup_u32_lazy(x3, wA_ref[0, s], wA_sh_ref[0, s], p3)
    return xa.reshape(G * R, LANES)


def _fwd_kernel(sr: int, sl: int, R: int, G: int,
                pcol_ref, p3_ref, wrow_ref, wrow_sh_ref,
                wlA_ref, wlA_sh_ref, wlB_ref, wlB_sh_ref, x_ref, o_ref):
    """Lazy-reduction butterflies: values live in [0, 2p) across all
    stages (inputs arrive < p < 2p; Shoup products land < 2p with NO
    correction; add/sub wrap mod 2p), one normalize at the end -- the
    kernel is VPU compute-bound (DESIGN.md §5.1), so the removed
    correction selects are direct wins.

    The block carries G = gb*gl stacked transforms as [RG = G*R, 128]
    sublane rows (see _grouped_tables: stacking is roll/mask-safe); the
    modulus is a per-row VMEM column so limbs with different primes
    share one grid program."""
    RG = G * R
    x = x_ref[...].reshape(RG, LANES)                # u32
    p = pcol_ref[0]                                  # [RG, 1]
    p3 = p3_ref[0]                                   # [G, 1, 1]
    p2 = p + p
    n = R * LANES

    half = n // 2
    for s in range(sr):                              # row stages
        sx = mul_mod_shoup_u32_lazy(x, wrow_ref[0, s], wrow_sh_ref[0, s], p)
        fwd, bwd = _rolls(sx, half, RG)
        _, xb = _rolls(x, half, RG)
        out_u = add_u32_lazy(x, fwd, p2)
        out_v = sub_u32_lazy(xb, sx, p2)
        x = jnp.where(_stage_mask(RG, half), out_u, out_v)
        half //= 2

    for s in range(sl):                              # lane stages
        xa = _lane_mul(x, wlA_ref, wlA_sh_ref, p3, s, G, R)
        sx = mul_mod_shoup_u32_lazy(xa, wlB_ref[0, s], wlB_sh_ref[0, s], p)
        fwd, _ = _rolls(sx, half, RG)
        _, xb = _rolls(x, half, RG)
        out_u = add_u32_lazy(x, fwd, p2)
        out_v = sub_u32_lazy(xb, sx, p2)
        x = jnp.where(_stage_mask(RG, half), out_u, out_v)
        half //= 2

    o_ref[...] = norm_u32(x, p).reshape(o_ref.shape)


def _inv_kernel(sr: int, sl: int, R: int, G: int,
                pcol_ref, p3_ref, wrow_ref, wrow_sh_ref,
                wlA_ref, wlA_sh_ref, wlB_ref, wlB_sh_ref,
                ninv_ref, ninv_sh_ref, x_ref, o_ref):
    RG = G * R
    x = x_ref[...].reshape(RG, LANES)
    p = pcol_ref[0]
    p3 = p3_ref[0]
    p2 = p + p

    half = 1
    for s in range(sl):                              # lane stages first
        v_at_u, u_at_v = _rolls(x, half, RG)
        out_u = add_u32_lazy(x, v_at_u, p2)
        d = sub_u32_lazy(u_at_v, x, p2)
        da = _lane_mul(d, wlA_ref, wlA_sh_ref, p3, s, G, R)
        out_v = mul_mod_shoup_u32_lazy(da, wlB_ref[0, s],
                                       wlB_sh_ref[0, s], p)
        x = jnp.where(_stage_mask(RG, half), out_u, out_v)
        half *= 2

    for s in range(sr):                              # row stages
        v_at_u, u_at_v = _rolls(x, half, RG)
        out_u = add_u32_lazy(x, v_at_u, p2)
        if s == sr - 1:                              # fold N^-1 (u branch)
            out_u = mul_mod_shoup_u32_lazy(out_u, ninv_ref[0],
                                           ninv_sh_ref[0], p)
        d = sub_u32_lazy(u_at_v, x, p2)
        out_v = mul_mod_shoup_u32_lazy(d, wrow_ref[0, s],
                                       wrow_sh_ref[0, s], p)
        x = jnp.where(_stage_mask(RG, half), out_u, out_v)
        half *= 2

    o_ref[...] = norm_u32(x, p).reshape(o_ref.shape)


def _pick_groups(L: int, Bb: int, R: int) -> tuple[int, int]:
    """(gl, gb): stacked limbs and batch rows per grid program.  Target
    1024 sublane rows (512 KB block): Mosaic's scoped-VMEM accounting
    charges the unrolled stage chain ~60x the block size (measured: a
    2048-row block at logN=15 hit 60 MB), so the pallas_call raises the
    compiler's vmem limit to 64 MB -- the accounting is conservative;
    the 1024-row config compiles, runs, and measures ~7% faster than
    512 rows on-chip (same-window sweep, 2026-08-21).  Overridable via
    HECTR_PALLAS_ROWS.  Groups must divide their axes; gl first (limb
    stacking pays even at batch=1, the bench/hot-path shape)."""
    import os

    target = max(1, int(os.environ.get("HECTR_PALLAS_ROWS", "1024")) // R)
    gl = 1
    for c in (8, 4, 2):
        if L % c == 0 and c <= target:
            gl = c
            break
    gb = 1
    for c in (8, 4, 2):
        if Bb % c == 0 and c <= target // gl:
            gb = c
            break
    return gl, gb


def _call(kernel_body, tab_names_fwd_inv, a: jnp.ndarray,
          n: int, primes: tuple[int, ...], interpret: bool) -> jnp.ndarray:
    """Shared pallas_call wrapper.  a: uint32[..., L, N].  Grid is
    (L/gl, Bb/gb) -- limb outermost so per-limb-group twiddle blocks
    stay resident across the whole batch instead of refetching per
    step; each program transforms gb*gl*R sublane rows (multi-row grid
    batching, VERDICT r3 #4)."""
    L = a.shape[-2]
    R = n // LANES
    batch = a.shape[:-2]
    Bb = int(np.prod(batch)) if batch else 1
    gl, gb = _pick_groups(L, Bb, R)
    tab = _grouped_tables(n, primes, gl, gb)
    x = a.reshape(Bb, L, R, LANES)

    # tracing the 15-stage kernel body exceeds CPython's default
    # recursion limit inside jax's tracing internals at logN=15
    import sys
    if sys.getrecursionlimit() < 10000:
        sys.setrecursionlimit(10000)

    # with jax_enable_x64 Python-int block indices trace as i64, which
    # Mosaic rejects; index maps also must not capture constants --
    # derive int32 zeros from the (int32) grid indices instead
    table_names = tab_names_fwd_inv
    inputs = [jnp.asarray(tab[name]) for name in table_names]
    specs = []
    for name in table_names:
        shp = tab[name].shape
        blk = (1,) + shp[1:]
        nd = len(shp) - 1
        specs.append(pl.BlockSpec(
            blk, (lambda i, j, nd=nd: (i,) + (i * 0,) * nd),
            memory_space=pltpu.VMEM))

    out = pl.pallas_call(
        functools.partial(kernel_body, tab["sr"], tab["sl"], R, tab["G"]),
        grid=(tab["Lg"], Bb // gb),
        in_specs=specs + [
            pl.BlockSpec((gb, gl, R, LANES),
                         lambda i, j: (j, i, i * 0, i * 0),
                         memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((gb, gl, R, LANES),
                               lambda i, j: (j, i, i * 0, i * 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bb, L, R, LANES), jnp.uint32),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(*inputs, x)
    return out.reshape(*batch, L, n)


def ntt_pallas(a: jnp.ndarray, t: NTTTables,
               interpret: bool = False) -> jnp.ndarray:
    """Forward negacyclic NTT, fused kernel.  Same contract as
    hectr_tpu.ckks.ntt.ntt: uint32[..., L, N] natural order ->
    bit-reversed NTT domain."""
    return _call(_fwd_kernel,
                 ("pcol", "pcol3", "fwd_row", "fwd_row_sh",
                  "fwd_lA", "fwd_lA_sh", "fwd_lB", "fwd_lB_sh"),
                 a, t.n, t.primes, interpret)


def intt_pallas(a: jnp.ndarray, t: NTTTables,
                interpret: bool = False) -> jnp.ndarray:
    """Inverse negacyclic NTT, fused kernel (bit-reversed NTT domain ->
    natural-order coefficients, scaled by N^-1)."""
    return _call(_inv_kernel,
                 ("pcol", "pcol3", "inv_row", "inv_row_sh",
                  "inv_lA", "inv_lA_sh", "inv_lB", "inv_lB_sh",
                  "ninv_col", "ninv_col_sh"),
                 a, t.n, t.primes, interpret)
