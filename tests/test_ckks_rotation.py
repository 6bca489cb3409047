"""Key switching, rotation, ct-ct mult, and encrypted gemv tests
(SURVEY.md §4 mandated: dec(rot(enc(v))) ~ roll(v),
dec(gemv(M, enc(v))) ~ M v)."""

from fractions import Fraction

import jax
import numpy as np
import pytest

from hectr_tpu.config import CKKSPreset
from hectr_tpu.ckks.context import make_context
from hectr_tpu.ckks import scheme as S
from hectr_tpu.ckks.gemv import diagonals, gemv
from hectr_tpu.ckks.keyswitch import (
    gen_relin_key,
    gen_rotation_keys,
    mul_ct,
    rotate,
)

# logn=10 keeps keygen + 15 rotation keys fast; rotation/gemv semantics
# are ring-size independent (the logn=12 reference ring is exercised by
# the slow acceptance tests, tests/test_hempc.py)
PRESET = CKKSPreset(name="test-rot", logn=10, slots=16, scale_bits=50,
                    limb_bits=25, mult_depth=2)


@pytest.fixture(scope="module")
def ctx():
    return make_context(PRESET)


@pytest.fixture(scope="module")
def keys(ctx):
    return S.keygen(ctx, jax.random.PRNGKey(0))


@pytest.fixture(scope="module")
def rot_keys(ctx, keys):
    return gen_rotation_keys(ctx, keys, jax.random.PRNGKey(1))


def enc(ctx, keys, v, seed=0):
    pt = S.encode(ctx, v, ctx.max_limbs)
    return S.encrypt(ctx, keys, pt, jax.random.PRNGKey(seed))


def dec(ctx, keys, ct):
    return np.asarray(S.decode(ctx, S.decrypt(ctx, keys, ct)))


def test_diagonals_decompose():
    rng = np.random.default_rng(0)
    M = rng.normal(size=(16, 16))
    v = rng.normal(size=16)
    d = diagonals(M, 16)
    acc = np.zeros(16)
    for r in range(16):
        acc = acc + d[r].real * np.roll(v, -r)  # rot_r = left-rotate
    np.testing.assert_allclose(acc, M @ v, atol=1e-12)


@pytest.mark.parametrize("r", [1, 15])
def test_rotation(ctx, keys, rot_keys, r):
    rng = np.random.default_rng(r)
    v = rng.uniform(-10, 10, ctx.slots).astype(np.complex128)
    ct = enc(ctx, keys, v, seed=r)
    got = dec(ctx, keys, rotate(ctx, ct, r, rot_keys))
    want = np.roll(v, -r)  # left rotation: slot i <- slot i+r
    np.testing.assert_allclose(got.real, want.real, atol=1e-8)
    assert np.max(np.abs(got.imag)) < 1e-5


@pytest.mark.slow
def test_gemv_random_matrix(ctx, keys, rot_keys):
    rng = np.random.default_rng(42)
    M = rng.normal(size=(16, 16))
    v = rng.uniform(-5, 5, 16).astype(np.complex128)
    ct = enc(ctx, keys, v, seed=99)
    out = gemv(ctx, M, ct, rot_keys)
    assert out.limbs == ct.limbs - 2
    assert out.scale == ct.scale
    got = dec(ctx, keys, out)
    np.testing.assert_allclose(got.real, M @ v.real, atol=1e-7)
    assert np.max(np.abs(got.imag)) < 1e-5


def test_gemv_block_matrix_skips_zero_diagonals(ctx, keys, rot_keys):
    """The controller's gain matrices occupy an [8 x 3] block of the
    16x16 slot layout (d2z_matrix zero-embedding) -- most diagonals
    vanish and must be skipped exactly."""
    rng = np.random.default_rng(7)
    M = np.zeros((16, 16))
    M[:8, :3] = rng.normal(size=(8, 3))
    v = np.zeros(16, dtype=np.complex128)
    v[:3] = rng.uniform(-2, 2, 3)
    ct = enc(ctx, keys, v, seed=5)
    got = dec(ctx, keys, gemv(ctx, M, ct, rot_keys))
    np.testing.assert_allclose(got.real, M @ v.real, atol=1e-7)


def test_ct_ct_mult_relin(ctx, keys):
    rk = gen_relin_key(ctx, keys, jax.random.PRNGKey(3))
    rng = np.random.default_rng(11)
    va = rng.uniform(-3, 3, ctx.slots).astype(np.complex128)
    vb = rng.uniform(-3, 3, ctx.slots).astype(np.complex128)
    ca = enc(ctx, keys, va, seed=21)
    cb = enc(ctx, keys, vb, seed=22)
    prod = S.rescale_pair(ctx, mul_ct(ctx, ca, cb, rk))
    got = dec(ctx, keys, prod)
    np.testing.assert_allclose(got.real, (va * vb).real, atol=1e-6)
    assert np.max(np.abs(got.imag)) < 1e-4


def test_compact_key_layout_bit_exact(ctx, keys):
    """Compact switching keys (no stored Shoup companions, HALF the
    key memory -- VERDICT r3 weak #6) must produce bit-identical
    key-switch results via the u64-Barrett fallback."""
    full = gen_rotation_keys(ctx, keys, jax.random.PRNGKey(1),
                             rotations=[3])
    comp = gen_rotation_keys(ctx, keys, jax.random.PRNGKey(1),
                             rotations=[3], compact=True)
    assert comp[3].shape[1] == 2 and full[3].shape[1] == 4
    assert comp[3].nbytes * 2 == full[3].nbytes
    # identical randomness => rows 0:2 identical
    np.testing.assert_array_equal(np.asarray(comp[3]),
                                  np.asarray(full[3][:, :2]))
    v = np.linspace(-1, 1, ctx.slots)
    ct = S.encrypt(ctx, keys,
                   S.encode(ctx, v.astype(np.complex128), ctx.max_limbs),
                   jax.random.PRNGKey(9))
    r_full = rotate(ctx, ct, 3, full)
    r_comp = rotate(ctx, ct, 3, comp)
    np.testing.assert_array_equal(np.asarray(r_full.data),
                                  np.asarray(r_comp.data))


def test_compact_relin_key_bit_exact(ctx, keys):
    rk_f = gen_relin_key(ctx, keys, jax.random.PRNGKey(2))
    rk_c = gen_relin_key(ctx, keys, jax.random.PRNGKey(2), compact=True)
    v = np.linspace(0.1, 0.9, ctx.slots)
    ct = S.encrypt(ctx, keys,
                   S.encode(ctx, v.astype(np.complex128), ctx.max_limbs),
                   jax.random.PRNGKey(11))
    m_f = mul_ct(ctx, ct, ct, rk_f)
    m_c = mul_ct(ctx, ct, ct, rk_c)
    np.testing.assert_array_equal(np.asarray(m_f.data),
                                  np.asarray(m_c.data))


def test_gemv_materials_apply_bit_exact(ctx, keys):
    """gemv_materials + gemv_apply (materials threaded through jit
    ARGUMENTS -- the compile-time fix for the flagship graph: closure
    captures lower as HLO literals that XLA constant-folds for tens of
    minutes) must be bit-exact vs the make_gemv closures, both
    methods."""
    from hectr_tpu.ckks.gemv import bsgs_rotations, gemv_apply, \
        gemv_materials, make_gemv

    rk_all = gen_rotation_keys(ctx, keys, jax.random.PRNGKey(1))
    rk_bs = gen_rotation_keys(ctx, keys, jax.random.PRNGKey(1),
                              rotations=bsgs_rotations(ctx.slots))
    M = np.random.default_rng(0).normal(size=(8, 3))
    v = np.linspace(-1, 1, ctx.slots)
    ct = S.encrypt(ctx, keys,
                   S.encode(ctx, v.astype(np.complex128), ctx.max_limbs),
                   jax.random.PRNGKey(2))
    for rks, meth in ((rk_all, "diag"), (rk_bs, "bsgs")):
        want = make_gemv(ctx, M, ctx.max_limbs, rks, method=meth)(ct)
        mat = gemv_materials(ctx, M, ctx.max_limbs, rks, method=meth)
        got = jax.jit(
            lambda m, c: gemv_apply(
                ctx, m, S.Ciphertext(data=c, scale=ct.scale)).data
        )(mat, ct.data)
        np.testing.assert_array_equal(np.asarray(want.data),
                                      np.asarray(got), err_msg=meth)
