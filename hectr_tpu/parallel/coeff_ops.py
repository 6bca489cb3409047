"""Coefficient-sharded CKKS scheme operations (shard_map + ppermute).

Integrates the coefficient-axis NTT (hectr_tpu.parallel.ntt_shard) into
real scheme ops so ciphertexts whose LAST axis is sharded over a
"coeff" mesh axis can be processed end-to-end -- the multi-chip path
for very large rings (SURVEY.md §2.6/§7 Phase 5; the structural sibling
of sequence parallelism: butterfly stages crossing the shard boundary
become ppermute over ICI, everything below is local).

Design note -- explicit sharded ops, not implicit dispatch: under jit
the operand sharding is static, so "dispatch ntt/intt on sharding"
would just be a compile-time branch; building the sharded variants as
their own closures keeps each op ONE shard_map program (all NTT
round-trips, base extensions and elementwise work fused, no
device_put bouncing between stages) and leaves the single-chip path
untouched.

Provided ops (all consume/produce coeff-sharded arrays):
  * ntt / intt           -- [L, N] chain transforms
  * negacyclic_mul       -- full poly product over the chain (the core
                            of every ciphertext op) at any logN
  * rescale_pair         -- the REAL scheme op (exact composite
                            rescale, bit-identical to
                            hectr_tpu.ckks.scheme.rescale_pair),
                            fusing 2x (single-limb iNTT -> centered
                            base broadcast -> chain NTT -> subtract /
                            Shoup-multiply) into one program
  * add / sub / mul_pt   -- elementwise (local by construction; listed
                            for completeness via plain scheme calls:
                            they work on sharded operands unchanged)

Communication: per [L, N] transform, log2(D) chunk exchanges of N/D
uint32 coefficients per limb (ppermute_bytes_per_transform) -- the
butterfly-minimum; rescale_pair moves 2 single-limb iNTTs + 2 chain
NTTs worth.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hectr_tpu.ckks.basecvt import (
    base_conv_constants,
    base_convert,
    grouped_conv_constants,
    grouped_convert,
)
from hectr_tpu.ckks.context import CKKSContext
from hectr_tpu.ckks.modmath import (
    add_mod,
    mul_mod,
    mul_mod_shoup,
    sub_mod,
    sum_mod,
)
from hectr_tpu.ckks.scheme import Ciphertext
from hectr_tpu.parallel.ntt_shard import local_ntt_fns


class CoeffOps:
    """Coefficient-sharded op set for one (context, mesh) pair."""

    def __init__(self, ctx: CKKSContext, mesh: Mesh, axis: str = "coeff"):
        self.ctx = ctx
        self.mesh = mesh
        self.axis = axis
        self.D = mesh.shape[axis]
        assert ctx.n % self.D == 0 and ctx.n // self.D >= 2

    def _spec(self, ndim: int) -> P:
        return P(*([None] * (ndim - 1) + [self.axis]))

    def shard(self, a: jnp.ndarray) -> jnp.ndarray:
        return jax.device_put(
            a, NamedSharding(self.mesh, self._spec(np.ndim(a))))

    @functools.cache
    def _ntt_pair(self, k: int):
        """(fwd, inv) jitted shard_map transforms over the k-limb chain."""
        t = self.ctx.tables(k)
        fwd_l, inv_l = local_ntt_fns(t, self.axis, self.D)
        spec = self._spec(2)
        fwd = jax.jit(jax.shard_map(fwd_l, mesh=self.mesh,
                                    in_specs=spec, out_specs=spec))
        inv = jax.jit(jax.shard_map(inv_l, mesh=self.mesh,
                                    in_specs=spec, out_specs=spec))
        return fwd, inv

    def ntt(self, a: jnp.ndarray) -> jnp.ndarray:
        return self._ntt_pair(a.shape[-2])[0](self.shard(a))

    def intt(self, a: jnp.ndarray) -> jnp.ndarray:
        return self._ntt_pair(a.shape[-2])[1](self.shard(a))

    @functools.cache
    def _negacyclic_mul_fn(self, k: int):
        t = self.ctx.tables(k)
        fwd_l, inv_l = local_ntt_fns(t, self.axis, self.D)

        def mul_local(a, b):
            fa = fwd_l(a)
            fb = fwd_l(b)
            return inv_l(mul_mod(fa, fb, t.p, t.mu, t.k))

        spec = self._spec(2)
        return jax.jit(jax.shard_map(mul_local, mesh=self.mesh,
                                     in_specs=(spec, spec),
                                     out_specs=spec))

    def negacyclic_mul(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """Coefficient-domain [k, N] x [k, N] -> [k, N] negacyclic
        product over the chain, one shard_map program (2 fwd + 1 inv
        transform + the pointwise product, all fused)."""
        assert a.shape == b.shape
        return self._negacyclic_mul_fn(a.shape[-2])(
            self.shard(a), self.shard(b))

    @functools.cache
    def _rescale_fn(self, k: int):
        ctx = self.ctx

        def drop_one_local(data, kk):
            """Sharded mirror of scheme._drop_one on local chunks
            [..., kk, C]: exact single-limb rescale."""
            d = kk - 1
            inv, inv_sh, p_d = ctx.rescale_constants(kk)
            row = ctx.tables_row(d)
            t_out = ctx.tables(d)
            row_inv = local_ntt_fns(row, self.axis, self.D)[1]
            out_fwd = local_ntt_fns(t_out, self.axis, self.D)[0]
            last = row_inv(data[..., d:d + 1, :])          # coeff domain
            centered = jnp.where(last.astype(jnp.int64) > p_d // 2,
                                 last.astype(jnp.int64) - p_d,
                                 last.astype(jnp.int64))
            ext = jnp.mod(centered, ctx.primes_col(d).astype(jnp.int64)
                          ).astype(jnp.uint32)
            ext = out_fwd(ext)
            diff = sub_mod(data[..., :d, :], ext, t_out.p)
            return mul_mod_shoup(diff, jnp.broadcast_to(inv, (d, 1)),
                                 jnp.broadcast_to(inv_sh, (d, 1)), t_out.p)

        def rescale_local(data):
            return drop_one_local(drop_one_local(data, k), k - 1)

        spec = self._spec(3)
        return jax.jit(jax.shard_map(rescale_local, mesh=self.mesh,
                                     in_specs=spec, out_specs=spec))

    def rescale_pair(self, a: Ciphertext) -> Ciphertext:
        """Composite rescale of a coeff-sharded ciphertext -- one
        shard_map program, bit-identical to scheme.rescale_pair."""
        k = a.limbs
        data = self._rescale_fn(k)(self.shard(a.data))
        return Ciphertext(data=data, scale=a.scale / self.ctx.pair_scale(k))

    # ------------------------------------------------------------------
    # key switching (the hot op of the encrypted controller: behind
    # every rotation, reference src/ctr.c:521-532 / src/hempc.c:257-259)
    # ------------------------------------------------------------------
    #
    # Decomposition into mesh programs: the digit decomposition and the
    # inner-product+mod-down are each ONE shard_map program (their NTT
    # round-trips exchange the butterfly-minimum chunks via ppermute;
    # the centered-CRT base conversions are per-coefficient, hence
    # local).  The only other communication is the Galois permutation
    # of the evaluation index axis -- a static gather across shards
    # that GSPMD lowers to a collective; it runs in the global view
    # BETWEEN the two shard_map programs, exactly where the hoisted
    # gemv re-permutes shared digits per rotation amount.

    @functools.cache
    def _decompose_fn(self, k: int):
        """shard_map digit decomposition: NTT-domain c1 chunk [k, C] ->
        extended NTT-domain digits [dnum, k+S, C] (the sharded mirror
        of ckks.keyswitch.decompose_digits)."""
        ctx = self.ctx
        t = ctx.tables(k)
        tks = ctx.tables_ks(k)
        dnum, alpha = ctx.dnum(k), ctx.alpha
        pad = dnum * alpha - k
        consts = grouped_conv_constants(
            ctx.digit_groups(k), ctx.data_primes[:k] + ctx.special_primes)
        inv_data = local_ntt_fns(t, self.axis, self.D)[1]
        fwd_ks = local_ntt_fns(tks, self.axis, self.D)[0]

        def local(c1):
            coeff = inv_data(c1)                            # [k, C]
            if pad:
                coeff = jnp.concatenate(
                    [coeff, jnp.zeros((pad, coeff.shape[-1]), jnp.uint32)],
                    axis=0)
            ext = grouped_convert(coeff.reshape(dnum, alpha, -1), consts)
            return fwd_ks(ext)                              # [dnum, k+S, C]

        return jax.jit(jax.shard_map(local, mesh=self.mesh,
                                     in_specs=self._spec(2),
                                     out_specs=self._spec(3)))

    @functools.cache
    def _ks_apply_fn(self, k: int):
        """shard_map inner-product + special mod-down: (digits
        [dnum, k+S, C], sliced key [dnum, 2, k+S, C]) -> [2, k, C]
        (the sharded mirror of _inner_product + _mod_down_special)."""
        from hectr_tpu.ckks.keyswitch import _ks_constants

        ctx = self.ctx
        t = ctx.tables(k)
        tks = ctx.tables_ks(k)
        bc = base_conv_constants(ctx.special_primes, ctx.data_primes[:k])
        pinv, pinv_sh = _ks_constants(ctx, k)
        inv_sp = local_ntt_fns(ctx.tables_special(), self.axis, self.D)[1]
        fwd_data = local_ntt_fns(t, self.axis, self.D)[0]

        def local(digits, ksk):
            from hectr_tpu.ckks.modmath import mul_mod, mul_mod_shoup_u32

            # ksk rows 0:2 = key, 2:4 = Shoup companions (see
            # keyswitch._gen_switching_key): pure-u32 inner product;
            # compact keys (axis-1 size 2) fall back to u64-Barrett
            if ksk.shape[1] == 4:
                prod = mul_mod_shoup_u32(digits[:, None], ksk[:, :2],
                                         ksk[:, 2:], tks.p32)
            else:
                prod = mul_mod(digits[:, None], ksk, tks.p, tks.mu, tks.k)
            acc = sum_mod(prod, 0, tks.p, tks.mu, tks.k)    # [2, k+S, C]
            last = inv_sp(acc[..., k:, :])                  # [2, S, C]
            ext = fwd_data(base_convert(last, bc))          # [2, k, C]
            diff = sub_mod(acc[..., :k, :], ext, t.p)
            return mul_mod_shoup(diff, jnp.broadcast_to(pinv, (k, 1)),
                                 jnp.broadcast_to(pinv_sh, (k, 1)), t.p)

        return jax.jit(jax.shard_map(
            local, mesh=self.mesh,
            in_specs=(self._spec(3), self._spec(4)),
            out_specs=self._spec(3)))

    @functools.cache
    def _rotate_fn(self, k: int):
        ctx = self.ctx
        t = ctx.tables(k)
        dec = self._decompose_fn(k)
        ksa = self._ks_apply_fn(k)

        def run(data, perm, ksk):
            c0r = data[0][..., perm]
            c1r = data[1][..., perm]
            ks = ksa(dec(c1r), ksk)
            return jnp.stack([add_mod(c0r, ks[0], t.p), ks[1]])

        return jax.jit(run)

    def rotate(self, ct: Ciphertext, r: int, rot_keys: dict) -> Ciphertext:
        """Left-rotate a coeff-sharded ciphertext's slots by r --
        bit-identical to ckks.keyswitch.rotate (same permute-first
        order, same arithmetic)."""
        from hectr_tpu.ckks.keyswitch import (
            eval_permutation, galois_element, slice_key)

        ctx = self.ctx
        r = r % ctx.slots
        if r == 0:
            return ct
        k = ct.limbs
        perm = jnp.asarray(eval_permutation(ctx.n, galois_element(r, ctx.n)))
        ksk = self.shard(slice_key(ctx, rot_keys[r], k))
        data = self._rotate_fn(k)(self.shard(ct.data), perm, ksk)
        return Ciphertext(data=data, scale=ct.scale)

    def make_gemv(self, M: np.ndarray, k: int, rot_keys: dict):
        """Coeff-sharded hoisted-diagonal encrypted gemv closure --
        the same op sequence as ckks.gemv's diagonal method (one digit
        decomposition shared across rotation amounts), so the result is
        bit-identical to the single-device closure.  Rotation amounts
        are unrolled (a Python loop) -- sized for the controller's
        small slot counts; dense large-slot matrices belong to the BSGS
        path on a single chip."""
        from hectr_tpu.ckks.gemv import _encode_batch, diagonals
        from hectr_tpu.ckks.keyswitch import (
            eval_permutation, galois_element, slice_key)
        from hectr_tpu.ckks.scheme import Plaintext

        ctx = self.ctx
        s = ctx.slots
        diags = diagonals(np.asarray(M), s)
        active = [r for r in range(s) if np.max(np.abs(diags[r])) > 0.0]
        if not active:
            active = [0]
        pair = ctx.pair_scale(k)
        vri = jnp.asarray(np.stack([
            np.stack([diags[r].real, diags[r].imag]) for r in active]))
        pt_batch = _encode_batch(ctx, vri, k, pair)
        pts = {r: Plaintext(data=pt_batch[i], scale=pair)
               for i, r in enumerate(active)}
        rot_active = [r for r in active if r % s != 0]
        perms = [jnp.asarray(eval_permutation(ctx.n, galois_element(r, ctx.n)))
                 for r in rot_active]
        ksks = [self.shard(slice_key(ctx, rot_keys[r], k))
                for r in rot_active]
        pt_rot = [pts[r].data for r in rot_active]
        t = ctx.tables(k)
        dec = self._decompose_fn(k)
        ksa = self._ks_apply_fn(k)
        resc = self._rescale_fn(k)

        def run(data, *flat):
            from hectr_tpu.ckks.gemv import _pt_shoup
            from hectr_tpu.ckks.modmath import mul_mod_shoup_u32

            n_r = len(rot_active)
            perms_l = flat[:n_r]
            pt_l = flat[n_r:2 * n_r]
            ksk_l = flat[2 * n_r:]
            if 0 in pts:
                acc = mul_mod(data, pts[0].data[None], t.p, t.mu, t.k)
            else:
                acc = jnp.zeros_like(data)
            if rot_active:
                digits = dec(data[1])                       # hoisted
                c0 = data[0]
                for perm, pt_data, ksk in zip(perms_l, pt_l, ksk_l):
                    dig_r = digits[..., perm]
                    ks = ksa(dig_r, ksk)
                    pt_sh = _pt_shoup(pt_data, k, ctx)
                    term0 = mul_mod_shoup_u32(
                        add_mod(c0[..., perm], ks[0], t.p),
                        pt_data, pt_sh, t.p32)
                    term1 = mul_mod_shoup_u32(ks[1], pt_data, pt_sh, t.p32)
                    acc = add_mod(acc, jnp.stack([term0, term1]), t.p)
            return resc(acc)

        run_j = jax.jit(run)

        def apply(ct: Ciphertext) -> Ciphertext:
            assert ct.limbs == k, (ct.limbs, k)
            data = run_j(self.shard(ct.data), *perms, *pt_rot, *ksks)
            # pt-mult raised the scale by `pair`; the fused rescale
            # divided it back out: net scale unchanged
            return Ciphertext(data=data, scale=ct.scale)

        return apply
