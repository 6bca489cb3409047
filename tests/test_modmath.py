"""Exhaustive-random validation of the vectorized modular arithmetic
against exact Python integers (the 'bignum oracle' -- SURVEY.md §7
recommends oracle tests over a big-int reference)."""

import numpy as np
import pytest

import jax.numpy as jnp

from hectr_tpu.ckks.modmath import (
    add_mod,
    barrett_constants,
    from_rns,
    mul_mod,
    mul_mod_shoup,
    neg_mod,
    shoup,
    sub_mod,
    to_rns,
)
from hectr_tpu.ckks.primes import find_ntt_primes, find_scale_prime_pairs

TWO_N = 1 << 13  # logn=12 ring


@pytest.fixture(scope="module")
def primes():
    base = find_ntt_primes(30, 2, TWO_N)
    pairs = find_scale_prime_pairs(50, 2, TWO_N, avoid=set(base))
    return base + [q for pair in pairs for q in pair]


def test_prime_properties(primes):
    for p in primes:
        assert p % TWO_N == 1
        assert p < (1 << 30)
    assert len(set(primes)) == len(primes)
    # scale pairs multiply to ~2^50
    pairs = find_scale_prime_pairs(50, 2, TWO_N)
    for a, b in pairs:
        assert abs(a * b / 2**50 - 1.0) < 1e-3


def test_mod_ops_vs_python_ints(primes):
    rng = np.random.default_rng(0)
    L, N = len(primes), 256
    p, mu, k = (jnp.asarray(x) for x in barrett_constants(primes))
    pv = np.array(primes, dtype=np.uint64).reshape(L, 1)
    a = (rng.integers(0, pv, size=(L, N))).astype(np.uint32)
    b = (rng.integers(0, pv, size=(L, N))).astype(np.uint32)
    aj, bj = jnp.asarray(a), jnp.asarray(b)

    np.testing.assert_array_equal(
        np.asarray(add_mod(aj, bj, p)),
        (a.astype(object) + b.astype(object)) % pv.astype(object))
    np.testing.assert_array_equal(
        np.asarray(sub_mod(aj, bj, p)),
        (a.astype(object) - b.astype(object)) % pv.astype(object))
    np.testing.assert_array_equal(
        np.asarray(neg_mod(aj, p)),
        (-a.astype(object)) % pv.astype(object))
    np.testing.assert_array_equal(
        np.asarray(mul_mod(aj, bj, p, mu, k)),
        (a.astype(object) * b.astype(object)) % pv.astype(object))


def test_barrett_worst_cases(primes):
    """Edge inputs: 0, 1, p-1 products (overflow-prone corners)."""
    L = len(primes)
    p, mu, k = (jnp.asarray(x) for x in barrett_constants(primes))
    pv = np.array(primes, dtype=np.uint64).reshape(L, 1)
    edges = np.concatenate([
        np.zeros((L, 1)), np.ones((L, 1)), pv - 1, pv // 2, pv // 2 + 1,
    ], axis=1).astype(np.uint32)
    for i in range(edges.shape[1]):
        for j in range(edges.shape[1]):
            a = edges[:, i:i + 1]
            b = edges[:, j:j + 1]
            got = np.asarray(mul_mod(jnp.asarray(a), jnp.asarray(b), p, mu, k))
            want = (a.astype(object) * b.astype(object)) % pv.astype(object)
            np.testing.assert_array_equal(got, want)


def test_shoup_mul(primes):
    rng = np.random.default_rng(1)
    L, N = len(primes), 256
    p, _, _ = barrett_constants(primes)
    pv = p  # [L,1] uint64
    w = rng.integers(0, pv, size=(L, 1)).astype(np.uint64)
    wsh = shoup(w, pv)
    a = rng.integers(0, pv, size=(L, N)).astype(np.uint32)
    got = np.asarray(mul_mod_shoup(
        jnp.asarray(a), jnp.asarray(w), jnp.asarray(wsh), jnp.asarray(pv)))
    want = (a.astype(object) * w.astype(object)) % pv.astype(object)
    np.testing.assert_array_equal(got, want)


def test_rns_roundtrip(primes):
    rng = np.random.default_rng(2)
    q = 1
    for p in primes:
        q *= p
    coeffs = np.array([int(rng.integers(-2**60, 2**60)) for _ in range(64)],
                      dtype=object)
    res = to_rns(coeffs, primes)
    back = from_rns(res, primes)
    np.testing.assert_array_equal(back, coeffs)
