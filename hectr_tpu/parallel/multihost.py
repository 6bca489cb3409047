"""Multi-host (DCN) scale-out: jax.distributed init + pod meshes +
the NTT scaling-efficiency harness.

The reference is a single process (SURVEY.md §2.6); multi-host is a
new first-class capability of the TPU build (BASELINE north star:
>= 70% NTT scaling efficiency at 2+ hosts).  The TPU-idiomatic shape:

  * `jax.distributed.initialize` once per process (coordinator via env
    or args); afterwards jax.devices() spans the whole pod slice and
    the SAME shard_map programs (parallel.ntt_shard / coeff_ops) run
    unchanged -- XLA routes ppermute hops within a host over ICI and
    across hosts over DCN.
  * Mesh axis order encodes the interconnect hierarchy: "batch"
    (independent control loops / ciphertexts -- outermost, DCN-friendly
    since it never communicates), then "limb" (RNS tensor parallelism
    -- all-gathers at rescale/key-switch), then "coeff" innermost so
    the NTT butterfly ppermutes ride ICI between neighbouring chips.

Real multi-host hardware is not reachable from this environment; the
efficiency harness is interconnect-agnostic (it measures whatever mesh
it is given) and doubles as the virtual-CPU-mesh stand-in the tests
and dryrun use.  On a real pod: run one process per host with
HECTR_COORDINATOR set, call init_distributed(), build the mesh with
make_pod_mesh, and run ntt_scaling_efficiency.
"""

from __future__ import annotations

import os
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from hectr_tpu.parallel.ntt_shard import (
    make_sharded_ntt,
    ppermute_bytes_per_transform,
)


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> bool:
    """Initialise jax.distributed for multi-host execution.

    Arguments default from the environment (HECTR_COORDINATOR,
    HECTR_NUM_PROCS, HECTR_PROC_ID); returns False (no-op) when no
    coordinator is configured -- single-host runs need nothing.
    Safe to call twice (already-initialised is not an error)."""
    coordinator = coordinator or os.environ.get("HECTR_COORDINATOR")
    if not coordinator:
        return False
    num_processes = num_processes or int(os.environ.get("HECTR_NUM_PROCS", "1"))
    process_id = process_id if process_id is not None else int(
        os.environ.get("HECTR_PROC_ID", "0"))
    try:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except RuntimeError as e:  # already initialised
        if "already" not in str(e):
            raise
    return True


def make_pod_mesh(batch: int = 1, limb: int = 1,
                  coeff: int | None = None) -> Mesh:
    """Mesh over ALL devices (every host's, after init_distributed)
    with the DCN-to-ICI axis order batch > limb > coeff.  coeff=None
    takes whatever device count remains."""
    devs = np.array(jax.devices())
    if coeff is None:
        assert devs.size % (batch * limb) == 0, (devs.size, batch, limb)
        coeff = devs.size // (batch * limb)
    need = batch * limb * coeff
    assert devs.size >= need, (devs.size, batch, limb, coeff)
    return Mesh(devs[:need].reshape(batch, limb, coeff),
                ("batch", "limb", "coeff"))


def ntt_scaling_efficiency(logn: int, limbs: int, mesh: Mesh,
                           axis: str = "coeff", iters: int = 8) -> dict:
    """Measure D-way coefficient-sharded NTT throughput against the
    single-device transform on the same backend and report the scaling
    efficiency (speedup / D) plus the analytic ppermute traffic.

    On a virtual CPU mesh the number is an indicative stand-in (no real
    interconnect); on a pod slice it is the north-star metric itself.
    """
    from hectr_tpu.ckks.ntt import build_ntt_tables, ntt
    from hectr_tpu.ckks.primes import find_ntt_primes

    n = 1 << logn
    D = mesh.shape[axis]
    primes = tuple(find_ntt_primes(30, limbs, 2 * n))
    t = build_ntt_tables(n, primes)
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(0, np.array(primes).reshape(-1, 1),
                                 size=(limbs, n)).astype(np.uint32))

    def rate(fn, x):
        r = fn(x)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn(r)   # output feeds input: valid residues, no memoization
        jax.block_until_ready(r)
        return iters / (time.perf_counter() - t0)

    single = jax.jit(lambda x: ntt(x, t))
    ntt_fn, _ = make_sharded_ntt(t, mesh, axis=axis)
    r1 = rate(single, a)
    rD = rate(ntt_fn, a)
    speedup = rD / r1
    return {
        "logn": logn, "limbs": limbs, "devices": D,
        "single_dev_ntt_per_s": r1, "sharded_ntt_per_s": rD,
        "speedup": speedup, "efficiency": speedup / D,
        "ppermute_bytes_per_transform":
            ppermute_bytes_per_transform(n, limbs, D),
    }
