"""Coefficient-sharded scheme ops: bit-exact parity with the
single-device scheme on the 8-virtual-device CPU mesh (SURVEY.md §4
multi-chip test strategy).  The integration mandated by round-1 review:
scheme ops (rescale) and the full negacyclic product consuming
coeff-sharded operands end-to-end."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from hectr_tpu.config import CKKSPreset
from hectr_tpu.ckks import scheme as S
from hectr_tpu.ckks.context import make_context
from hectr_tpu.ckks.modmath import mul_mod
from hectr_tpu.ckks.ntt import intt, ntt
from hectr_tpu.parallel.coeff_ops import CoeffOps

# logn=10 keeps the fast gate cheap on 2-vCPU hosts (round-2 review
# flagged logn=12 x 8 virtual devices as a fast-suite hot spot); the
# deep/large-ring coverage is the dryrun (logN=15) and the slow suite.
PRESET = CKKSPreset(name="coeff-test", logn=10, slots=16, scale_bits=50,
                    limb_bits=25, mult_depth=2)


@pytest.fixture(scope="module")
def ctx():
    return make_context(PRESET)


@pytest.fixture(scope="module")
def ops(ctx):
    mesh = Mesh(np.array(jax.devices()[:8]), ("coeff",))
    return CoeffOps(ctx, mesh)


def test_sharded_ntt_roundtrip_two_devices(ctx):
    """D=2 boundary (exactly one cross-shard butterfly stage) -- the
    full-mesh fixture covers D=8; keeping this one case cheap instead
    of double-instantiating every module fixture."""
    mesh = Mesh(np.array(jax.devices()[:2]), ("coeff",))
    ops2 = CoeffOps(ctx, mesh)
    k = ctx.max_limbs
    a = _rand_poly(ctx, k, 7)
    t = ctx.tables(k)
    got = np.asarray(ops2.ntt(jnp.asarray(a)))
    np.testing.assert_array_equal(got, np.asarray(ntt(jnp.asarray(a), t)))
    np.testing.assert_array_equal(np.asarray(ops2.intt(jnp.asarray(got))), a)


def _rand_poly(ctx, k, seed):
    rng = np.random.default_rng(seed)
    return rng.integers(0, np.array(ctx.data_primes[:k]).reshape(-1, 1),
                        size=(k, ctx.n)).astype(np.uint32)


def test_sharded_chain_ntt_roundtrip(ctx, ops):
    k = ctx.max_limbs
    a = _rand_poly(ctx, k, 0)
    t = ctx.tables(k)
    got = np.asarray(ops.ntt(jnp.asarray(a)))
    np.testing.assert_array_equal(got, np.asarray(ntt(jnp.asarray(a), t)))
    back = np.asarray(ops.intt(jnp.asarray(got)))
    np.testing.assert_array_equal(back, a)


def test_sharded_negacyclic_mul_matches_unsharded(ctx, ops):
    k = ctx.max_limbs
    a = _rand_poly(ctx, k, 1)
    b = _rand_poly(ctx, k, 2)
    t = ctx.tables(k)
    want = np.asarray(intt(mul_mod(ntt(jnp.asarray(a), t),
                                   ntt(jnp.asarray(b), t),
                                   t.p, t.mu, t.k), t))
    got = np.asarray(ops.negacyclic_mul(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_array_equal(got, want)


def test_sharded_rescale_bit_exact_on_real_ciphertext(ctx, ops):
    """The REAL scheme op on a REAL ciphertext: encrypt, coeff-shard,
    rescale on the mesh, compare bit-for-bit with the single-device
    rescale, then decrypt + decode and check the value."""
    if ops.D != 8:
        pytest.skip("scheme-level check once, on the full mesh "
                    "(2-dev coverage comes from the NTT/mul tests)")
    keys = S.keygen(ctx, jax.random.PRNGKey(10))
    rng = np.random.default_rng(11)
    v = rng.uniform(-2, 2, ctx.slots)
    pt = S.encode(ctx, (jnp.asarray(v), jnp.zeros(ctx.slots)),
                  ctx.max_limbs)
    ct = S.encrypt(ctx, keys, pt, jax.random.PRNGKey(12))
    # ct x pt product then composite rescale (the gemv inner pattern)
    pt2 = S.encode(ctx, (2.0 * jnp.ones(ctx.slots), jnp.zeros(ctx.slots)),
                   ctx.max_limbs, scale=ctx.pair_scale(ctx.max_limbs))
    prod = S.mul_pt(ctx, ct, pt2)

    want = S.rescale_pair(ctx, prod)
    got = ops.rescale_pair(prod)
    assert got.scale == want.scale
    np.testing.assert_array_equal(np.asarray(got.data),
                                  np.asarray(want.data))

    re, im = S.decode_ri(ctx, S.decrypt(ctx, keys, got))
    np.testing.assert_allclose(np.asarray(re), 2.0 * v, atol=1e-8)
    assert np.max(np.abs(np.asarray(im))) < 1e-5


@pytest.fixture(scope="module")
def crypto(ctx):
    from hectr_tpu.ckks.keyswitch import gen_rotation_keys

    keys = S.keygen(ctx, jax.random.PRNGKey(20))
    rot = gen_rotation_keys(ctx, keys, jax.random.PRNGKey(21),
                            rotations=[1, 3, 5])
    return keys, rot


def test_sharded_rotate_bit_exact(ctx, ops, crypto):
    """Coeff-sharded key switch behind a slot rotation (VERDICT r2 #4:
    the hot op of the encrypted controller, reference rotation
    machinery src/ctr.c:521-532): bit-identical to the single-device
    rotate, then value-checked after decrypt."""
    from hectr_tpu.ckks.keyswitch import rotate

    keys, rot = crypto
    rng = np.random.default_rng(22)
    v = rng.uniform(-2, 2, ctx.slots)
    pt = S.encode(ctx, (jnp.asarray(v), jnp.zeros(ctx.slots)),
                  ctx.max_limbs)
    ct = S.encrypt(ctx, keys, pt, jax.random.PRNGKey(23))
    for r in (1, 3):
        want = rotate(ctx, ct, r, rot)
        got = ops.rotate(ct, r, rot)
        assert got.scale == want.scale
        np.testing.assert_array_equal(np.asarray(got.data),
                                      np.asarray(want.data))
    re, im = S.decode_ri(ctx, S.decrypt(ctx, keys, ops.rotate(ct, 3, rot)))
    np.testing.assert_allclose(np.asarray(re), np.roll(v, -3), atol=1e-6)
    assert np.max(np.abs(np.asarray(im))) < 1e-5


def test_sharded_gemv_bit_exact(ctx, ops, crypto):
    """Coeff-sharded hoisted-diagonal gemv == single-device gemv,
    bit-for-bit (same hoisted decomposition, same op order)."""
    from hectr_tpu.ckks.gemv import make_gemv

    if ops.D != 8:
        pytest.skip("gemv parity once, on the full mesh")
    keys, rot = crypto
    s = ctx.slots
    rng = np.random.default_rng(24)
    M = np.zeros((s, s))
    idx = np.arange(s)
    M[idx, idx] = rng.normal(size=s)
    M[idx, (idx + 1) % s] = rng.normal(size=s)             # diagonal 1
    M[idx, (idx + 5) % s] = rng.normal(size=s)             # diagonal 5
    v = rng.uniform(-1, 1, s)
    pt = S.encode(ctx, (jnp.asarray(v), jnp.zeros(s)), ctx.max_limbs)
    ct = S.encrypt(ctx, keys, pt, jax.random.PRNGKey(25))

    want = make_gemv(ctx, M, ctx.max_limbs, rot, method="diag")(ct)
    got = ops.make_gemv(M, ctx.max_limbs, rot)(ct)
    assert got.scale == want.scale
    np.testing.assert_array_equal(np.asarray(got.data),
                                  np.asarray(want.data))
    re, im = S.decode_ri(ctx, S.decrypt(ctx, keys, got))
    np.testing.assert_allclose(np.asarray(re), M @ v, atol=1e-6)
    assert np.max(np.abs(np.asarray(im))) < 1e-5
