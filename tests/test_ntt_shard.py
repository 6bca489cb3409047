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


def test_analytic_ici_efficiency_model():
    """The ICI prediction (VERDICT r3 #3) is checkable arithmetic:
    measured t_limb=7.9us at logN=15, v5e 45 GB/s link, 2us latency."""
    from hectr_tpu.parallel.ntt_shard import (
        analytic_ici_efficiency, ici_efficiency_table,
        ppermute_bytes_per_transform)

    assert analytic_ici_efficiency(15, 22, 1)["efficiency"] == 1.0
    e2 = analytic_ici_efficiency(15, 22, 2)
    # hand check: T_comp = 22*7.9/2 = 86.9us; bytes = 16384*4*22 =
    # 1.442MB; T_comm = 2 + 1442816/45000 = 34.06us; eff = 0.718
    assert abs(e2["t_comp_us"] - 86.9) < 0.1
    assert abs(e2["t_comm_us"] - 34.06) < 0.2
    assert 0.70 < e2["efficiency"] < 0.74
    assert e2["bytes_per_device"] == ppermute_bytes_per_transform(
        1 << 15, 22, 2)
    # efficiency falls with D (comm amortizes worse than compute)
    e4 = analytic_ici_efficiency(15, 22, 4)
    e8 = analytic_ici_efficiency(15, 22, 8)
    assert e2["efficiency"] > e4["efficiency"] > e8["efficiency"]
    # and rises with N at fixed D (compute N log N vs comm N)
    assert (analytic_ici_efficiency(16, 22, 2)["efficiency"]
            > e2["efficiency"])
    tab = ici_efficiency_table(limbs=22)
    assert "logN=15,D=2" in tab["meets_70pct"]
    assert tab["predicted_efficiency"]["logn15"]["2dev"] == e2["efficiency"]
