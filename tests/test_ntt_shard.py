"""Coefficient-sharded NTT: parity with the single-device transform on
an 8-virtual-device mesh (the multi-chip scaling path of SURVEY.md §7
Phase 5, testable without hardware per §4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from hectr_tpu.ckks.ntt import build_ntt_tables, intt, ntt
from hectr_tpu.ckks.primes import find_ntt_primes
from hectr_tpu.parallel.ntt_shard import make_sharded_ntt


@pytest.fixture(scope="module", params=[2, 4, 8])
def mesh(request):
    d = request.param
    return Mesh(np.array(jax.devices()[:d]), ("coeff",))


@pytest.mark.parametrize("logn", [8, 12])
def test_sharded_ntt_matches_unsharded(mesh, logn):
    n = 1 << logn
    primes = tuple(find_ntt_primes(30, 3, 2 * n))
    t = build_ntt_tables(n, primes)
    rng = np.random.default_rng(logn)
    a = rng.integers(0, np.array(primes).reshape(-1, 1),
                     size=(3, n)).astype(np.uint32)
    aj = jnp.asarray(a)

    ntt_fn, intt_fn = make_sharded_ntt(t, mesh, axis="coeff")
    got_fwd = np.asarray(ntt_fn(aj))
    want_fwd = np.asarray(ntt(aj, t))
    np.testing.assert_array_equal(got_fwd, want_fwd)

    got_rt = np.asarray(intt_fn(jnp.asarray(got_fwd)))
    np.testing.assert_array_equal(got_rt, a)

    got_inv = np.asarray(intt_fn(aj))
    want_inv = np.asarray(intt(aj, t))
    np.testing.assert_array_equal(got_inv, want_inv)
