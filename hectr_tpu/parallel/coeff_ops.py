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

from hectr_tpu.ckks.context import CKKSContext
from hectr_tpu.ckks.modmath import mul_mod, mul_mod_shoup, sub_mod
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
