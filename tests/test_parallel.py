"""Multi-device sharding tests (8 virtual CPU devices, SURVEY.md §4)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hectr_tpu.config import CKKSPreset
from hectr_tpu.ckks import scheme as S
from hectr_tpu.ckks.context import make_context
from hectr_tpu.parallel import ct_sharding, make_mesh, shard_ciphertext

PRESET = CKKSPreset(name="par-test", logn=10, slots=16, scale_bits=50,
                    limb_bits=25, mult_depth=1)


@pytest.fixture(scope="module")
def ctx():
    return make_context(PRESET)


@pytest.fixture(scope="module")
def keys(ctx):
    return S.keygen(ctx, jax.random.PRNGKey(0))


def test_mesh_construction():
    mesh = make_mesh(batch=4, limb=2)
    assert mesh.devices.shape == (4, 2)
    assert mesh.axis_names == ("batch", "limb")


def test_limb_sharded_homomorphic_add(ctx, keys):
    """ct add with limb-sharded operands: result must equal the
    unsharded computation bit-exactly."""
    mesh = make_mesh(batch=1, limb=2)
    v = np.arange(ctx.slots, dtype=np.float64).astype(np.complex128)
    pt = S.encode(ctx, v, ctx.max_limbs)
    ca = S.encrypt(ctx, keys, pt, jax.random.PRNGKey(1))
    cb = S.encrypt(ctx, keys, pt, jax.random.PRNGKey(2))
    want = np.asarray(S.add(ctx, ca, cb).data)

    ca_s = shard_ciphertext(ca, mesh)
    cb_s = shard_ciphertext(cb, mesh)
    out = jax.jit(
        lambda a, b: S.add(ctx, a, b),
        in_shardings=(
            jax.tree_util.tree_map(lambda _: ct_sharding(mesh), ca_s,
                                   is_leaf=lambda x: hasattr(x, "shape")),
            jax.tree_util.tree_map(lambda _: ct_sharding(mesh), cb_s,
                                   is_leaf=lambda x: hasattr(x, "shape")),
        ),
    )(ca_s, cb_s)
    np.testing.assert_array_equal(np.asarray(out.data), want)


@pytest.mark.slow   # heavy sharded-decrypt compile; dryrun covers it
def test_limb_sharded_full_decrypt_path(ctx, keys):
    """encrypt -> rescale-bearing mul_pt -> decrypt -> decode with the
    ciphertext sharded over the limb axis: exercises the cross-limb
    base-extension collectives GSPMD inserts."""
    mesh = make_mesh(batch=1, limb=2)
    v = np.ones(ctx.slots, dtype=np.complex128) * 3.0
    pt = S.encode(ctx, v, ctx.max_limbs)
    ct = S.encrypt(ctx, keys, pt, jax.random.PRNGKey(3))
    pt2 = S.encode(ctx, 2 * np.ones(ctx.slots, np.complex128),
                   ctx.max_limbs, scale=ctx.pair_scale(ctx.max_limbs))

    def f(ct):
        out = S.rescale_pair(ctx, S.mul_pt(ctx, ct, pt2))
        return S.decode(ctx, S.decrypt(ctx, keys, out))

    want = np.asarray(f(ct))
    ct_s = shard_ciphertext(ct, mesh)
    got = np.asarray(jax.jit(f)(ct_s))
    np.testing.assert_allclose(got, want, atol=1e-9)
    np.testing.assert_allclose(got.real, 6.0, atol=1e-8)


def test_batched_ct_sharding(ctx, keys):
    """A batch of ciphertexts sharded over (batch, limb)."""
    mesh = make_mesh(batch=4, limb=2)
    v = np.ones(ctx.slots, dtype=np.complex128)
    pt = S.encode(ctx, v, ctx.max_limbs)
    cts = [S.encrypt(ctx, keys, pt, jax.random.PRNGKey(10 + i))
           for i in range(4)]
    batch = jnp.stack([c.data for c in cts])          # [4, 2, L, N]
    batch_s = jax.device_put(batch, ct_sharding(mesh, batched=True))
    t = ctx.tables(ctx.max_limbs)
    from hectr_tpu.ckks.modmath import add_mod

    out = jax.jit(lambda x: add_mod(x, x, t.p))(batch_s)
    want = np.asarray(add_mod(batch, batch, t.p))
    np.testing.assert_array_equal(np.asarray(out), want)


@pytest.mark.slow   # the driver executes dryrun_multichip separately
def test_dryrun_multichip_8():
    """The driver's multi-chip dryrun must pass on the virtual mesh."""
    import __graft_entry__ as g

    g.dryrun_multichip(8)
