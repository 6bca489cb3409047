"""Encrypted matrix-vector products: plaintext matrix x ciphertext
vector.

Capability of GPQHE's `he_gemv` (call sites src/hempc.c:257-259): the
reference's ONLY multiplicative primitive -- M is a real matrix
zero-embedded into a slots x slots complex layout (d2z_matrix,
src/matrices.c:133-141), v is an encrypted slot vector, and the product
consumes one multiplicative level (partnered with he_moddown on the
un-multiplied operand).  GPQHE's contract is GENERAL (any matrix, any
slot count), so both regimes are served:

* **Diagonal method with hoisting** (`method="diag"`):
      M v = sum_r diag_r(M) * rot_r(v),  diag_r[i] = M[i, (i+r) mod s]
  one switching key and one key switch per *nonzero* diagonal, a single
  hoisted digit decomposition shared by all of them.  Optimal for the
  controller's gain matrices (small blocks => few active diagonals).

* **Baby-step/giant-step** (`method="bsgs"`): write r = g*n1 + b with
  n1 ~ sqrt(s); then
      M v = sum_g rot_{g n1}( sum_b rot_{-g n1}(diag_{g n1 + b}) * rot_b(v) )
  needs keys only for the n1-1 baby amounts and the active giant
  amounts g*n1 -- O(sqrt s) keys and O(sqrt s) key switches where the
  plain diagonal method needs O(s) of each (at the MEDIUM preset's
  slots=8192 that is ~2*91 keys instead of 8191 multi-hundred-MB keys).
  Baby rotations share one hoisted decomposition; giant rotations are
  applied to the already-accumulated inner sums.  Level consumption and
  output scale are identical to the diagonal method.

`method="auto"` (default) picks whichever needs fewer key switches for
the matrix's sparsity pattern, preferring a method whose keys are
actually present in `rot_keys`.

Shared engineering:
  * diagonal plaintexts precomputed eagerly at closure-build time (they
    are static per matrix/level -- encoding them inside the traced step
    bloated both the graph and the runtime),
  * lax.scan over rotation amounts (stacked keys/permutations), which
    keeps the compiled graph one-body-sized instead of unrolling all
    rotations -- the remote-TPU compile of the fully unrolled
    encrypted-MPC step took minutes,
  * one rescale at the end; output scale == input scale (diagonals are
    encoded at the trailing-pair scale).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from hectr_tpu.ckks.context import CKKSContext
from hectr_tpu.ckks.keyswitch import (
    _inner_product,
    _mod_down_special,
    decompose_digits,
    eval_permutation,
    galois_element,
    slice_key,
)
from hectr_tpu.ckks.modmath import add_mod, mul_mod, sum_mod
from hectr_tpu.ckks.scheme import Ciphertext, mul_pt, rescale_pair


@functools.partial(jax.jit, static_argnums=(0,))
def _encode_batch_full(ctx: CKKSContext, vri: jnp.ndarray, scale_f):
    """Encode a batch of slot vectors ([R, 2, s] real pairs) over the
    FULL chain with a TRACED f64 scale: [R, K_max, N].  ONE executable
    serves every (level, scale) -- callers slice the first k limb rows
    (the per-limb NTT makes the slice bit-identical to encoding at k).

    WHY one executable: the per-(k, scale) static variants minted a
    fresh remote compile per level, each carrying the multi-MB twiddle
    tables as HLO literals -- and at the 30+ limb FLAGSHIP_QP scale
    one of those compiles HUNG the remote-TPU compile service on three
    independent runs (stack: backend_compile_and_load, never returns).
    The numeric contract is unchanged: encode already multiplied by
    float(scale); here the same f64 value arrives as an argument."""
    from hectr_tpu.ckks.encoding import embed_ri, integer_residues
    from hectr_tpu.ckks.ntt import ntt

    s = ctx.slots
    k = ctx.max_limbs
    stride = ctx.n // (2 * s)

    def one(vr, vi):
        m = embed_ri(vr, vi, s)
        y = jnp.round(m * scale_f)
        res = integer_residues(y, ctx.primes_col(k))
        coeffs = jnp.zeros((k, ctx.n), dtype=jnp.uint32)
        coeffs = coeffs.at[:, ::stride].set(res)
        return ntt(coeffs, ctx.tables(k))
    return jax.vmap(one)(vri[:, 0], vri[:, 1])


def _encode_batch(ctx: CKKSContext, vri: jnp.ndarray, k: int, scale):
    """Encode a batch of slot vectors ([R, 2, s] real pairs) into
    plaintext residue arrays [R, k, N] in ONE compiled graph (the eager
    per-diagonal path dominated gemv closure-build time).  Implemented
    by slicing the shared full-chain executable (see
    _encode_batch_full); the batch axis is padded to a bucket of at
    least 16 rows so ONE executable serves constants and every typical
    matrix shape -- observed on the remote-TPU compile service: the
    first big-twiddle-literal compile of a session succeeds, a SECOND
    one can hang it, so the fewer distinct encode executables the
    better."""
    R = vri.shape[0]
    sf = jnp.float64(float(scale))
    if R > 2048:
        # chunk huge grids (dense BSGS at slots=8192 encodes 8281
        # diagonals): bounded peak memory, one executable (R=2048)
        outs = []
        for off in range(0, R, 2048):
            outs.append(_encode_batch(ctx, vri[off:off + 2048], k, scale))
        return jnp.concatenate(outs, axis=0)
    Rp = max(16, 1 << max(0, int(R - 1).bit_length()))
    if Rp != R:
        vri = jnp.concatenate(
            [vri, jnp.zeros((Rp - R,) + vri.shape[1:], vri.dtype)])
    full = _encode_batch_full(ctx, vri, sf)
    return full[:R, :k, :]


def diagonals(M: np.ndarray, slots: int) -> np.ndarray:
    """Generalized diagonals of the slots x slots (zero-padded) matrix:
    diag[r, i] = M[i, (i+r) mod slots]."""
    Mz = np.zeros((slots, slots), dtype=np.complex128)
    Mz[:M.shape[0], :M.shape[1]] = M
    return np.stack([Mz[np.arange(slots), (np.arange(slots) + r) % slots]
                     for r in range(slots)])


# ---------------------------------------------------------------------------
# baby-step / giant-step split
# ---------------------------------------------------------------------------


def bsgs_split(slots: int) -> tuple[int, int]:
    """(n1, n2): baby count n1 ~ round(sqrt(slots)) and giant count
    n2 = ceil(slots/n1), so n1*n2 >= slots and total keys
    (n1-1) + (n2-1) <= 2*sqrt(slots).  n1 need not divide slots: the
    last giant group is simply partial."""
    import math

    n1 = max(1, round(math.sqrt(slots)))
    return n1, -(-slots // n1)


def bsgs_rotations(slots: int) -> list[int]:
    """The rotation amounts a dense BSGS gemv needs keys for: babies
    1..n1-1 and giants n1, 2*n1, ... -- ~2*sqrt(slots) total.  Feed to
    gen_rotation_keys(..., rotations=bsgs_rotations(ctx.slots))."""
    n1, n2 = bsgs_split(slots)
    return sorted(set(range(1, n1)) | {g * n1 for g in range(1, n2)})


def _bsgs_cost(active_rot: list[int], slots: int) -> tuple[int, list[int], int]:
    """(#key switches, needed rotation amounts, n1) for BSGS on this
    sparsity pattern.  Baby steps are the full 1..n1-1 (the baby stack
    is shared across groups); giant cost counts only active g > 0
    groups (the g = 0 group needs no giant rotation)."""
    n1, _ = bsgs_split(slots)
    giants = sorted({r // n1 for r in active_rot} - {0})
    needed = sorted(set(range(1, n1)) | {g * n1 for g in giants})
    return (n1 - 1) + len(giants), needed, n1


def _resolve_method(ctx: CKKSContext, M: np.ndarray, rot_keys: dict,
                    method: str):
    """(method, diags, active) after "auto" resolution."""
    s = ctx.slots
    diags = diagonals(np.asarray(M), s)
    active = [r for r in range(s) if np.max(np.abs(diags[r])) > 0.0]
    if not active:
        active = [0]
    rot_active = [r for r in active if r % s != 0]

    if method == "auto":
        bs_cost, bs_needed, _ = _bsgs_cost(rot_active, s)
        diag_ok = all(r in rot_keys for r in rot_active)
        bsgs_ok = all(r in rot_keys for r in bs_needed)
        if diag_ok and (len(rot_active) <= bs_cost or not bsgs_ok):
            method = "diag"
        elif bsgs_ok:
            method = "bsgs"
        else:
            missing = [r for r in rot_active if r not in rot_keys][:5]
            raise KeyError(
                f"rot_keys covers neither method: diagonal path missing "
                f"amounts {missing}..., BSGS path needs "
                f"{bsgs_rotations(s)[:5]}... (gen_rotation_keys(..., "
                f"rotations=bsgs_rotations(ctx.slots)))")
    return method, diags, active


def make_gemv(ctx: CKKSContext, M: np.ndarray, k: int, rot_keys: dict,
              method: str = "auto"):
    """Build an encrypted-gemv closure for a fixed matrix at a fixed
    level (k input limbs).  All static material -- diagonal plaintexts,
    evaluation permutations, stacked level-sliced switching keys -- is
    materialised eagerly here, outside any trace.

    method: "diag" (hoisted diagonal method, one key per nonzero
    diagonal), "bsgs" (baby-step/giant-step, ~2*sqrt(s) keys), or
    "auto" (fewest key switches among the methods whose keys are
    available).

    COMPILE-TIME NOTE: when the returned closure is traced into a jit,
    its captured arrays lower as HLO literals, which (a) bloat the
    compile request (the flagship key stacks are ~0.1 GB/key) and
    (b) hand XLA's constant-folder encode/slice subgraphs to execute at
    compile time -- the dominant cost of the monolithic flagship
    compile.  For jitted loops prefer gemv_materials + gemv_apply with
    the materials threaded through jit ARGUMENTS."""
    method, diags, active = _resolve_method(ctx, M, rot_keys, method)
    if method == "diag":
        return _make_gemv_diag(ctx, diags, active, k, rot_keys)
    if method == "bsgs":
        return _make_gemv_bsgs(ctx, diags, active, k, rot_keys)
    raise ValueError(f"unknown gemv method {method!r}")


def gemv_materials(ctx: CKKSContext, M: np.ndarray, k: int,
                   rot_keys: dict, method: str = "auto") -> dict:
    """Materialise the static gemv operands EAGERLY as device arrays:
    a nested pytree of arrays (top-level key "diag" or "bsgs" encodes
    the method structurally) to thread through jit arguments into
    gemv_apply.  Computed outside any trace so nothing here becomes an
    HLO literal or a constant-foldable subgraph."""
    method, diags, active = _resolve_method(ctx, M, rot_keys, method)
    if method == "diag":
        build = _materials_diag
    else:
        build = _materials_bsgs
    return build(ctx, diags, active, k, rot_keys)


def _mat_limbs(mat: dict) -> int:
    """The limb count the materials were built for, read from the
    encoded-plaintext STATIC shapes ([..., k, N]) -- usable under
    tracing, where an int leaf in the jit-arg pytree would not be."""
    if "diag" in mat:
        d = mat["diag"]
        arr = d["pt0"] if "pt0" in d else d["rot"]["pt"]
    else:
        b = mat["bsgs"]
        arr = b["pt0"] if "pt0" in b else b["giant"]["pt"]
    return arr.shape[-2]


def gemv_apply(ctx: CKKSContext, mat: dict, ct: Ciphertext) -> Ciphertext:
    """Apply an encrypted gemv from its materials pytree (gemv_materials).
    Traceable: call inside jit with `mat` passed as an argument -- the
    method is encoded STRUCTURALLY (top-level key "diag" or "bsgs"), so
    dispatch stays static under tracing."""
    k = _mat_limbs(mat)
    assert ct.limbs == k, (
        f"ciphertext at {ct.limbs} limbs but gemv materials were built "
        f"for {k} (mod_down_to the ciphertext or rebuild the materials)")
    if "diag" in mat:
        return _apply_diag(ctx, mat, ct)
    return _apply_bsgs(ctx, mat, ct)


# ---------------------------------------------------------------------------
# hoisted diagonal method
# ---------------------------------------------------------------------------


def _pt_shoup(pt_data: jnp.ndarray, k: int, ctx: CKKSContext) -> jnp.ndarray:
    """Shoup companions floor(pt * 2^32 / p) for static diagonal
    plaintexts -- computed once at closure build (or once per outer
    trace when the closure is built inside one), so the per-rotation
    ct x pt multiplies run in pure u32."""
    p = jnp.asarray(ctx.primes_col(k).reshape(
        (1,) * (pt_data.ndim - 2) + (k, 1)))
    return ((pt_data.astype(jnp.uint64) << jnp.uint64(32)) // p
            ).astype(jnp.uint32)


def _materials_diag(ctx: CKKSContext, diags: np.ndarray,
                    active: list[int], k: int, rot_keys: dict) -> dict:
    s = ctx.slots
    pair = ctx.pair_scale(k)
    vri = jnp.asarray(np.stack([
        np.stack([diags[r].real, diags[r].imag]) for r in active]))
    pt_batch = _encode_batch(ctx, vri, k, pair)           # [R, k, N]
    rot_active = [r for r in active if r % s != 0]
    mat: dict = {"diag": {}}
    d = mat["diag"]
    if 0 in active:
        d["pt0"] = pt_batch[active.index(0)]
    if rot_active:
        d["rot"] = {
            "perms": jnp.asarray(np.stack([
                eval_permutation(ctx.n, galois_element(r, ctx.n))
                for r in rot_active])),
            "ksk": jnp.stack([slice_key(ctx, rot_keys[r], k)
                              for r in rot_active]),  # [R, dnum, 4, k+S, N]
            "pt": jnp.stack([pt_batch[active.index(r)]
                             for r in rot_active]),   # [R, k, N]
        }
        d["rot"]["pt_sh"] = _pt_shoup(d["rot"]["pt"], k, ctx)
    return mat


def _apply_diag(ctx: CKKSContext, mat: dict, ct: Ciphertext) -> Ciphertext:
    from hectr_tpu.ckks.modmath import mul_mod_shoup_u32
    from hectr_tpu.ckks.scheme import Plaintext

    d = mat["diag"]
    k = ct.limbs
    pair = ctx.pair_scale(k)
    t = ctx.tables(k)
    if "pt0" in d:
        acc = mul_pt(ctx, ct, Plaintext(data=d["pt0"], scale=pair)).data
    else:
        acc = jnp.zeros_like(ct.data)
    if "rot" in d:
        r = d["rot"]
        digits = decompose_digits(ctx, ct.data[1])          # hoisted
        c0 = ct.data[0]

        def body(carry, inp):
            perm, pt_data, pt_sh, ksk = inp
            dig_r = digits[..., perm]
            ks_ext = _inner_product(ctx, dig_r, ksk, k, sliced=True)
            ks = _mod_down_special(ctx, ks_ext, k)          # [2, k, N]
            c0r = c0[..., perm]
            term0 = mul_mod_shoup_u32(add_mod(c0r, ks[0], t.p),
                                      pt_data, pt_sh, t.p32)
            term1 = mul_mod_shoup_u32(ks[1], pt_data, pt_sh, t.p32)
            carry = add_mod(carry, jnp.stack([term0, term1]), t.p)
            return carry, None

        acc, _ = jax.lax.scan(
            body, acc, (r["perms"], r["pt"], r["pt_sh"], r["ksk"]))
    out = Ciphertext(data=acc, scale=ct.scale * pair)
    return rescale_pair(ctx, out)


def _make_gemv_diag(ctx: CKKSContext, diags: np.ndarray, active: list[int],
                    k: int, rot_keys: dict):
    mat = _materials_diag(ctx, diags, active, k, rot_keys)

    def apply(ct: Ciphertext) -> Ciphertext:
        assert ct.limbs == k, (ct.limbs, k)
        return _apply_diag(ctx, mat, ct)

    return apply


# ---------------------------------------------------------------------------
# baby-step / giant-step method
# ---------------------------------------------------------------------------


def _materials_bsgs(ctx: CKKSContext, diags: np.ndarray,
                    active: list[int], k: int, rot_keys: dict) -> dict:
    s = ctx.slots
    n1, _n2 = bsgs_split(s)
    pair = ctx.pair_scale(k)
    active_set = set(active)
    groups = sorted({r // n1 for r in active})

    # diag'_{g,b} = rot_{-g n1}(diag_{g n1 + b}); np.roll by +g*n1 is
    # exactly rot_{-g n1} (rot_r(x)[i] = x[(i+r) mod s]).  Group 0 and
    # the giant groups are encoded SEPARATELY: a post-hoc gather of the
    # giant rows out of one full grid doubles peak device memory (the
    # slots=8192 dense grid is ~6.4 GB -- the gather copy OOMed a
    # 16 GB chip).
    def _encode_groups(group_list):
        vri = np.zeros((len(group_list), n1, 2, s))
        for gi, g in enumerate(group_list):
            for b in range(n1):
                r = g * n1 + b
                if r < s and r in active_set:
                    d = np.roll(diags[r], g * n1)
                    vri[gi, b, 0] = d.real
                    vri[gi, b, 1] = d.imag
        return _encode_batch(
            ctx, jnp.asarray(vri.reshape(-1, 2, s)), k, pair
        ).reshape(len(group_list), n1, k, ctx.n)

    mat: dict = {"bsgs": {
        "baby_perms": jnp.asarray(np.stack([
            eval_permutation(ctx.n, galois_element(b, ctx.n))
            for b in range(1, n1)])),
        "baby_ksk": jnp.stack([slice_key(ctx, rot_keys[b], k)
                               for b in range(1, n1)]),
    }}
    b = mat["bsgs"]
    giants = [g for g in groups if g > 0]
    if giants:
        b["giant"] = {
            "perms": jnp.asarray(np.stack([
                eval_permutation(ctx.n, galois_element(g * n1, ctx.n))
                for g in giants])),
            "ksk": jnp.stack([slice_key(ctx, rot_keys[g * n1], k)
                              for g in giants]),
            "pt": _encode_groups(giants),
        }
    if 0 in groups:
        b["pt0"] = _encode_groups([0])[0]
    return mat


def _apply_bsgs(ctx: CKKSContext, mat: dict, ct: Ciphertext) -> Ciphertext:
    b = mat["bsgs"]
    k = ct.limbs
    pair = ctx.pair_scale(k)
    t = ctx.tables(k)
    digits = decompose_digits(ctx, ct.data[1])              # hoisted babies
    c0 = ct.data[0]

    def baby_body(_, inp):
        perm, ksk = inp
        ks_ext = _inner_product(ctx, digits[..., perm], ksk, k,
                                sliced=True)
        ks = _mod_down_special(ctx, ks_ext, k)
        return None, jnp.stack([add_mod(c0[..., perm], ks[0], t.p),
                                ks[1]])

    _, C_rot = jax.lax.scan(baby_body, None,
                            (b["baby_perms"], b["baby_ksk"]))
    C = jnp.concatenate([ct.data[None], C_rot], axis=0)     # [n1, 2, k, N]

    def group_sum(ptg):
        # sum_b C[b] * ptg[b]; products reduced, then one u64 sum +
        # Barrett (n1 * p < 2^45, in sum_mod's domain)
        prod = mul_mod(C, ptg[:, None], t.p, t.mu, t.k)     # [n1,2,k,N]
        return sum_mod(prod, 0, t.p, t.mu, t.k)             # [2,k,N]

    acc = group_sum(b["pt0"]) if "pt0" in b else jnp.zeros_like(ct.data)
    if "giant" in b:
        g = b["giant"]

        def giant_body(carry, inp):
            ptg, perm, ksk = inp
            w = group_sum(ptg)
            w0 = w[0][..., perm]
            w1 = w[1][..., perm]
            dig = decompose_digits(ctx, w1)
            ks_ext = _inner_product(ctx, dig, ksk, k, sliced=True)
            ks = _mod_down_special(ctx, ks_ext, k)
            out = jnp.stack([add_mod(w0, ks[0], t.p), ks[1]])
            return add_mod(carry, out, t.p), None

        acc, _ = jax.lax.scan(giant_body, acc,
                              (g["pt"], g["perms"], g["ksk"]))
    out = Ciphertext(data=acc, scale=ct.scale * pair)
    return rescale_pair(ctx, out)


def _make_gemv_bsgs(ctx: CKKSContext, diags: np.ndarray, active: list[int],
                    k: int, rot_keys: dict):
    mat = _materials_bsgs(ctx, diags, active, k, rot_keys)

    def apply(ct: Ciphertext) -> Ciphertext:
        assert ct.limbs == k, (ct.limbs, k)
        return _apply_bsgs(ctx, mat, ct)

    return apply


def gemv(ctx: CKKSContext, M: np.ndarray, ct: Ciphertext,
         rot_keys: dict, method: str = "auto") -> Ciphertext:
    """Encrypted M @ v.  Consumes one level; output scale == input
    scale.  (One-shot convenience; loops should build `make_gemv` once.)"""
    return make_gemv(ctx, M, ct.limbs, rot_keys, method=method)(ct)
