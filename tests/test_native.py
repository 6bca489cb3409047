"""Native C++ host library (csrc/hectr_host.cpp) vs the pure-Python
object-integer contracts of hectr_tpu.ckks.modmath."""

import numpy as np
import pytest

from hectr_tpu import native
from hectr_tpu.ckks.ntt import build_ntt_tables, intt, ntt
from hectr_tpu.ckks.primes import find_ntt_primes, root_of_unity

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


def _py_from_rns(res, primes):
    L, N = res.shape
    q = 1
    for p in primes:
        q *= p
    acc = np.zeros(N, dtype=object)
    for i, p in enumerate(primes):
        qi = q // p
        inv = pow(qi % p, -1, p)
        acc = (acc + res[i].astype(object) * inv % p * qi) % q
    return np.where(acc > q // 2, acc - q, acc)


def test_crt_centered_matches_python():
    rng = np.random.default_rng(0)
    primes = find_ntt_primes(30, 8, 1 << 9)
    pcol = np.array(primes).reshape(-1, 1)
    res = rng.integers(0, pcol, size=(8, 64)).astype(np.uint32)
    got = native.crt_centered(res, primes)
    want = _py_from_rns(res, primes)
    assert all(int(a) == int(b) for a, b in zip(got, want))


def test_to_rns_roundtrip():
    import random

    random.seed(1)
    primes = find_ntt_primes(30, 5, 1 << 9)
    q = 1
    for p in primes:
        q *= p
    coeffs = np.array([random.randint(-(q // 2) + 1, q // 2)
                       for _ in range(32)], dtype=object)
    res = native.to_rns(coeffs, primes)
    back = native.crt_centered(res, primes)
    assert all(int(a) == int(b) for a, b in zip(back, coeffs))


def test_ntt_oracle_matches_device_path():
    n = 512
    primes = tuple(find_ntt_primes(30, 2, 2 * n))
    t = build_ntt_tables(n, primes)
    rng = np.random.default_rng(2)
    a = rng.integers(0, np.array(primes).reshape(-1, 1),
                     size=(2, n)).astype(np.uint32)
    dev = np.asarray(ntt(a, t))
    for i, p in enumerate(primes):
        psi = root_of_unity(p, 2 * n)
        assert np.array_equal(native.ntt_ref(a[i], p, psi), dev[i])
        assert np.array_equal(native.intt_ref(dev[i], p, psi), a[i])


def test_negacyclic_mul_oracle():
    """Independent O(n^2) product vs the NTT-based device path."""
    n = 256
    primes = tuple(find_ntt_primes(30, 2, 2 * n))
    t = build_ntt_tables(n, primes)
    rng = np.random.default_rng(3)
    pcol = np.array(primes).reshape(-1, 1)
    x = rng.integers(0, pcol, size=(2, n)).astype(np.uint32)
    y = rng.integers(0, pcol, size=(2, n)).astype(np.uint32)
    from hectr_tpu.ckks.ntt import negacyclic_mul

    dev = np.asarray(negacyclic_mul(x, y, t))
    for i, p in enumerate(primes):
        assert np.array_equal(native.negacyclic_mul_ref(x[i], y[i], p), dev[i])
