"""Negacyclic NTT validation: roundtrip, linearity, and polynomial
products against an exact big-int naive O(N^2) oracle."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hectr_tpu.ckks.modmath import from_rns, to_rns
from hectr_tpu.ckks.ntt import (
    build_ntt_tables,
    intt,
    negacyclic_mul,
    ntt,
    pointwise_mul,
)
from hectr_tpu.ckks.primes import find_ntt_primes


def naive_negacyclic(a_obj, b_obj, p):
    """Exact schoolbook product mod (X^N + 1, p)."""
    n = len(a_obj)
    out = np.zeros(n, dtype=object)
    for i in range(n):
        ai = int(a_obj[i])
        if ai == 0:
            continue
        for j in range(n):
            k = i + j
            v = ai * int(b_obj[j])
            if k >= n:
                out[k - n] -= v
            else:
                out[k] += v
    return np.array([int(x) % p for x in out], dtype=object)


@pytest.mark.parametrize("logn", [4, 12])
def test_ntt_roundtrip(logn):
    n = 1 << logn
    primes = tuple(find_ntt_primes(30, 3, 2 * n))
    t = build_ntt_tables(n, primes)
    rng = np.random.default_rng(logn)
    a = rng.integers(0, np.array(primes).reshape(-1, 1),
                     size=(len(primes), n)).astype(np.uint32)
    aj = jnp.asarray(a)
    back = np.asarray(intt(ntt(aj, t), t))
    np.testing.assert_array_equal(back, a)


@pytest.mark.parametrize("logn", [4, 6])
def test_negacyclic_mul_vs_oracle(logn):
    n = 1 << logn
    primes = tuple(find_ntt_primes(29, 2, 2 * n))
    t = build_ntt_tables(n, primes)
    rng = np.random.default_rng(7 + logn)
    a = rng.integers(0, np.array(primes).reshape(-1, 1),
                     size=(len(primes), n)).astype(np.uint32)
    b = rng.integers(0, np.array(primes).reshape(-1, 1),
                     size=(len(primes), n)).astype(np.uint32)
    got = np.asarray(negacyclic_mul(jnp.asarray(a), jnp.asarray(b), t))
    for i, p in enumerate(primes):
        want = naive_negacyclic(a[i].astype(object), b[i].astype(object), p)
        np.testing.assert_array_equal(got[i].astype(object), want)


def test_ntt_linearity_and_convolution_theorem():
    n = 256
    primes = tuple(find_ntt_primes(30, 2, 2 * n))
    t = build_ntt_tables(n, primes)
    rng = np.random.default_rng(3)
    pv = np.array(primes).reshape(-1, 1)
    a = rng.integers(0, pv, size=(2, n)).astype(np.uint32)
    b = rng.integers(0, pv, size=(2, n)).astype(np.uint32)
    aj, bj = jnp.asarray(a), jnp.asarray(b)
    lhs = np.asarray(ntt((aj.astype(np.uint64) + bj).astype(np.uint32) % pv, t))
    rhs = (np.asarray(ntt(aj, t)).astype(np.uint64)
           + np.asarray(ntt(bj, t))) % pv
    np.testing.assert_array_equal(lhs, rhs.astype(np.uint32))


def test_ntt_batch_axis():
    """Leading batch axes must vectorize transparently (ciphertexts are
    [2, L, N]; gemv rotates stacks of them)."""
    n = 64
    primes = tuple(find_ntt_primes(30, 2, 2 * n))
    t = build_ntt_tables(n, primes)
    rng = np.random.default_rng(4)
    pv = np.array(primes).reshape(-1, 1)
    a = rng.integers(0, pv, size=(3, 2, len(primes), n)).astype(np.uint32)
    aj = jnp.asarray(a)
    batched = np.asarray(ntt(aj, t))
    for i in range(3):
        for j in range(2):
            single = np.asarray(ntt(aj[i, j], t))
            np.testing.assert_array_equal(batched[i, j], single)


def test_x_times_x_shifts():
    """Multiplying by X must negacyclically shift coefficients."""
    n = 32
    primes = tuple(find_ntt_primes(30, 1, 2 * n))
    t = build_ntt_tables(n, primes)
    p = primes[0]
    a = np.zeros((1, n), dtype=np.uint32)
    a[0, n - 1] = 5  # 5 * X^{N-1}
    x = np.zeros((1, n), dtype=np.uint32)
    x[0, 1] = 1      # X
    got = np.asarray(negacyclic_mul(jnp.asarray(a), jnp.asarray(x), t))
    want = np.zeros((1, n), dtype=np.uint32)
    want[0, 0] = p - 5  # X^N = -1
    np.testing.assert_array_equal(got, want)
