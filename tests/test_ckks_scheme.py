"""CKKS scheme property tests: dec(enc(x)) ~ x, homomorphic add/sub/
neg, ct-pt multiply + rescale, mod-down level alignment.

Mirrors the reference's runtime noise canary -- imaginary residue of
every decode < 1e-5 (src/ctr.c:493-494) -- and SURVEY.md §4's mandated
property tests.
"""

from fractions import Fraction

import jax
import numpy as np
import pytest

from hectr_tpu.config import CKKSPreset
from hectr_tpu.ckks.context import make_context
from hectr_tpu.ckks import scheme as S

# Small-but-real parameters: depth 2 at logn=10.  Scheme semantics are
# ring-size independent; the reference ring (logn=12) is exercised
# end-to-end by the slow hempc differential suite, and logn=10 keeps
# this module fast-gate-sized on 2-vCPU hosts (round-2 review #7).
PRESET = CKKSPreset(name="test", logn=10, slots=16, scale_bits=50,
                    limb_bits=25, mult_depth=2)


@pytest.fixture(scope="module")
def ctx():
    return make_context(PRESET)


@pytest.fixture(scope="module")
def keys(ctx):
    return S.keygen(ctx, jax.random.PRNGKey(42))


def rand_slots(ctx, seed, mag=1.0, complex_=False):
    rng = np.random.default_rng(seed)
    v = rng.uniform(-mag, mag, ctx.slots)
    if complex_:
        v = v + 1j * rng.uniform(-mag, mag, ctx.slots)
    return v.astype(np.complex128)


def enc(ctx, keys, v, seed=0, k=None):
    k = ctx.max_limbs if k is None else k
    pt = S.encode(ctx, v, k)
    return S.encrypt(ctx, keys, pt, jax.random.PRNGKey(seed))


def dec(ctx, keys, ct):
    return np.asarray(S.decode(ctx, S.decrypt(ctx, keys, ct)))


def test_encode_decode_roundtrip_no_crypto(ctx):
    v = rand_slots(ctx, 0, mag=100.0, complex_=True)
    pt = S.encode(ctx, v, ctx.max_limbs)
    got = np.asarray(S.decode(ctx, pt))
    np.testing.assert_allclose(got, v, atol=1e-11)


def test_enc_dec_roundtrip(ctx, keys):
    v = rand_slots(ctx, 1, mag=30.0)
    got = dec(ctx, keys, enc(ctx, keys, v, seed=1))
    np.testing.assert_allclose(got.real, v.real, atol=1e-9)
    # reference noise canary (src/ctr.c:493-494)
    assert np.max(np.abs(got.imag)) < 1e-5


def test_homomorphic_add_sub_neg(ctx, keys):
    va = rand_slots(ctx, 2, mag=10.0)
    vb = rand_slots(ctx, 3, mag=10.0)
    ca = enc(ctx, keys, va, seed=2)
    cb = enc(ctx, keys, vb, seed=3)
    np.testing.assert_allclose(
        dec(ctx, keys, S.add(ctx, ca, cb)).real, (va + vb).real, atol=1e-9)
    np.testing.assert_allclose(
        dec(ctx, keys, S.sub(ctx, ca, cb)).real, (va - vb).real, atol=1e-9)
    np.testing.assert_allclose(
        dec(ctx, keys, S.neg(ctx, ca)).real, (-va).real, atol=1e-9)


def test_ct_pt_mul_rescale(ctx, keys):
    """The reference's only multiplicative primitive shape: ct * pt at
    matched scale, then drop one level (he_gemv consumes 1 level,
    SURVEY.md §2.3)."""
    v = rand_slots(ctx, 4, mag=5.0)
    w = rand_slots(ctx, 5, mag=5.0)
    k = ctx.max_limbs
    ct = enc(ctx, keys, v, seed=4)
    # encode the multiplier at the pair scale so the product rescales
    # back to exactly Delta
    pt = S.encode(ctx, w, k, scale=ctx.pair_scale(k))
    prod = S.rescale_pair(ctx, S.mul_pt(ctx, ct, pt))
    assert prod.limbs == k - 2
    assert prod.scale == ct.scale
    got = dec(ctx, keys, prod)
    np.testing.assert_allclose(got.real, (v * w).real, atol=1e-8)
    assert np.max(np.abs(got.imag)) < 1e-5


def test_mod_down_alignment_and_add(ctx, keys):
    """moddown drops a level without dividing; result adds cleanly with
    a rescaled product (the hempc update shape, src/hempc.c:261-266)."""
    v = rand_slots(ctx, 6, mag=5.0)
    w = rand_slots(ctx, 7, mag=5.0)
    k = ctx.max_limbs
    cu = enc(ctx, keys, v, seed=6)
    cw = enc(ctx, keys, w, seed=7)
    ones = np.ones(ctx.slots, dtype=np.complex128)
    pt1 = S.encode(ctx, ones, k, scale=ctx.pair_scale(k))
    prod = S.rescale_pair(ctx, S.mul_pt(ctx, cw, pt1))   # ~ w at level-1
    cu_down = S.mod_down_pair(ctx, cu)
    out = S.add(ctx, cu_down, prod)
    got = dec(ctx, keys, out)
    np.testing.assert_allclose(got.real, (v + w).real, atol=1e-8)


def test_depth_two_chain(ctx, keys):
    """Two successive ct-pt mults exercise the full depth-2 chain."""
    v = rand_slots(ctx, 8, mag=2.0)
    k = ctx.max_limbs
    ct = enc(ctx, keys, v, seed=8)
    pt2 = S.encode(ctx, 2 * np.ones(ctx.slots, np.complex128), k,
                   scale=ctx.pair_scale(k))
    ct = S.rescale_pair(ctx, S.mul_pt(ctx, ct, pt2))
    pt3 = S.encode(ctx, 3 * np.ones(ctx.slots, np.complex128), ct.limbs,
                   scale=ctx.pair_scale(ct.limbs))
    ct = S.rescale_pair(ctx, S.mul_pt(ctx, ct, pt3))
    got = dec(ctx, keys, ct)
    np.testing.assert_allclose(got.real, 6 * v.real, atol=1e-7)


def test_encrypt_is_randomized(ctx, keys):
    v = rand_slots(ctx, 9)
    c1 = enc(ctx, keys, v, seed=10)
    c2 = enc(ctx, keys, v, seed=11)
    assert not np.array_equal(np.asarray(c1.data), np.asarray(c2.data))


def test_wrong_key_fails(ctx, keys):
    other = S.keygen(ctx, jax.random.PRNGKey(999))
    v = rand_slots(ctx, 12, mag=1.0)
    got = np.asarray(S.decode(ctx, S.decrypt(ctx, other, enc(ctx, keys, v))))
    # decrypting with the wrong key must yield garbage, not the value
    assert np.max(np.abs(got - v)) > 1.0
