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


def _fwd_kernel(sr: int, sl: int, R: int,
                p_ref, wrow_ref, wrow_sh_ref, wlA_ref, wlA_sh_ref,
                wlB_ref, wlB_sh_ref, x_ref, o_ref):
    """Lazy-reduction butterflies: values live in [0, 2p) across all
    stages (inputs arrive < p < 2p; Shoup products land < 2p with NO
    correction; add/sub wrap mod 2p), one normalize at the end -- the
    kernel is VPU compute-bound (DESIGN.md §5.1), so the removed
    correction selects are direct wins."""
    x = x_ref[0, 0]                                  # [R, 128] u32
    p = p_ref[pl.program_id(0), 0]
    p2 = p + p
    n = R * LANES

    half = n // 2
    for s in range(sr):                              # row stages
        sx = mul_mod_shoup_u32_lazy(x, wrow_ref[0, s], wrow_sh_ref[0, s], p)
        fwd, bwd = _rolls(sx, half, R)
        _, xb = _rolls(x, half, R)
        out_u = add_u32_lazy(x, fwd, p2)
        out_v = sub_u32_lazy(xb, sx, p2)
        x = jnp.where(_stage_mask(R, half), out_u, out_v)
        half //= 2

    for s in range(sl):                              # lane stages
        xa = mul_mod_shoup_u32_lazy(x, wlA_ref[0, s], wlA_sh_ref[0, s], p)
        sx = mul_mod_shoup_u32_lazy(xa, wlB_ref[0, s], wlB_sh_ref[0, s], p)
        fwd, _ = _rolls(sx, half, R)
        _, xb = _rolls(x, half, R)
        out_u = add_u32_lazy(x, fwd, p2)
        out_v = sub_u32_lazy(xb, sx, p2)
        x = jnp.where(_stage_mask(R, half), out_u, out_v)
        half //= 2

    o_ref[0, 0] = norm_u32(x, p)


def _inv_kernel(sr: int, sl: int, R: int,
                p_ref, wrow_ref, wrow_sh_ref, wlA_ref, wlA_sh_ref,
                wlB_ref, wlB_sh_ref, ninv_ref, ninv_sh_ref, x_ref, o_ref):
    x = x_ref[0, 0]
    i_limb = pl.program_id(0)
    p = p_ref[i_limb, 0]
    p2 = p + p
    n = R * LANES

    half = 1
    for s in range(sl):                              # lane stages first
        v_at_u, u_at_v = _rolls(x, half, R)
        out_u = add_u32_lazy(x, v_at_u, p2)
        d = sub_u32_lazy(u_at_v, x, p2)
        da = mul_mod_shoup_u32_lazy(d, wlA_ref[0, s], wlA_sh_ref[0, s], p)
        out_v = mul_mod_shoup_u32_lazy(da, wlB_ref[0, s],
                                       wlB_sh_ref[0, s], p)
        x = jnp.where(_stage_mask(R, half), out_u, out_v)
        half *= 2

    for s in range(sr):                              # row stages
        v_at_u, u_at_v = _rolls(x, half, R)
        out_u = add_u32_lazy(x, v_at_u, p2)
        if s == sr - 1:                              # fold N^-1 (u branch)
            out_u = mul_mod_shoup_u32_lazy(out_u, ninv_ref[i_limb, 0],
                                           ninv_sh_ref[i_limb, 0], p)
        d = sub_u32_lazy(u_at_v, x, p2)
        out_v = mul_mod_shoup_u32_lazy(d, wrow_ref[0, s],
                                       wrow_sh_ref[0, s], p)
        x = jnp.where(_stage_mask(R, half), out_u, out_v)
        half *= 2

    o_ref[0, 0] = norm_u32(x, p)


def _call(kernel_body, tab, a: jnp.ndarray, table_names: tuple[str, ...],
          interpret: bool) -> jnp.ndarray:
    """Shared pallas_call wrapper.  a: uint32[..., L, N].  Grid is
    (L, batch) -- limb outermost so per-limb twiddle blocks stay
    resident across the whole batch instead of refetching per step."""
    L = a.shape[-2]
    n = a.shape[-1]
    R = tab["R"]
    batch = a.shape[:-2]
    Bb = int(np.prod(batch)) if batch else 1
    x = a.reshape(Bb, L, R, LANES)

    # tracing the 15-stage kernel body exceeds CPython's default
    # recursion limit inside jax's tracing internals at logN=15
    import sys
    if sys.getrecursionlimit() < 10000:
        sys.setrecursionlimit(10000)

    # with jax_enable_x64 Python-int block indices trace as i64, which
    # Mosaic rejects; index maps also must not capture constants --
    # derive int32 zeros from the (int32) grid indices instead
    inputs = [jnp.asarray(tab[name]) for name in table_names]
    specs = []
    for name in table_names:
        shp = tab[name].shape
        blk = (1,) + shp[1:]
        if len(shp) == 2:                            # per-limb scalars: whole
            specs.append(pl.BlockSpec(shp, lambda i, j: (i * 0, i * 0),
                                      memory_space=pltpu.SMEM))
        else:
            nd = len(shp) - 1
            specs.append(pl.BlockSpec(
                blk, (lambda i, j, nd=nd: (i,) + (i * 0,) * nd),
                memory_space=pltpu.VMEM))

    out = pl.pallas_call(
        functools.partial(kernel_body, tab["sr"], tab["sl"], R),
        grid=(L, Bb),
        in_specs=specs + [
            pl.BlockSpec((1, 1, R, LANES), lambda i, j: (j, i, i * 0, i * 0),
                         memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, R, LANES),
                               lambda i, j: (j, i, i * 0, i * 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bb, L, R, LANES), jnp.uint32),
        interpret=interpret,
    )(*inputs, x)
    return out.reshape(*batch, L, n)


def ntt_pallas(a: jnp.ndarray, t: NTTTables,
               interpret: bool = False) -> jnp.ndarray:
    """Forward negacyclic NTT, fused kernel.  Same contract as
    hectr_tpu.ckks.ntt.ntt: uint32[..., L, N] natural order ->
    bit-reversed NTT domain."""
    tab = _pallas_tables(t.n, t.primes)
    return _call(_fwd_kernel, tab, a,
                 ("p32", "fwd_row", "fwd_row_sh",
                  "fwd_lA", "fwd_lA_sh", "fwd_lB", "fwd_lB_sh"),
                 interpret)


def intt_pallas(a: jnp.ndarray, t: NTTTables,
                interpret: bool = False) -> jnp.ndarray:
    """Inverse negacyclic NTT, fused kernel (bit-reversed NTT domain ->
    natural-order coefficients, scaled by N^-1)."""
    tab = _pallas_tables(t.n, t.primes)
    return _call(_inv_kernel, tab, a,
                 ("p32", "inv_row", "inv_row_sh",
                  "inv_lA", "inv_lA_sh", "inv_lB", "inv_lB_sh",
                  "ninv", "ninv_sh"),
                 interpret)
