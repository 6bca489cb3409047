"""Execute the multi-process (DCN) path for real: TWO jax.distributed
processes on localhost CPU, 4 virtual devices each, running the
coefficient-sharded NTT and a sharded scheme op across the 2-process
global mesh with bit-exactness asserted per local shard (VERDICT r4
missing #5: `init_distributed` had never executed with
num_processes > 1 anywhere).

Cross-process communication is real: the 8-device "coeff" mesh spans
both processes, so the first butterfly ppermute stages exchange chunks
BETWEEN processes through the jax.distributed runtime -- the same code
path that rides DCN on a multi-host pod (parallel.multihost docstring;
SURVEY.md §2.6 multi-host mandate).

Usage:
  python scripts/run_multihost_cpu.py              # launcher (spawns 2)
  python scripts/run_multihost_cpu.py worker <pid> <port>   # internal

Writes results/multihost_cpu.json.
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def worker(pid: int, port: int) -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    # 4 virtual devices per process (replace any inherited count, e.g.
    # the test harness's 8)
    flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
             if "host_platform_device_count" not in f]
    flags.append("--xla_force_host_platform_device_count=4")
    os.environ["XLA_FLAGS"] = " ".join(flags)
    import jax

    jax.config.update("jax_platforms", "cpu")

    from hectr_tpu.parallel.multihost import init_distributed

    assert init_distributed(coordinator=f"127.0.0.1:{port}",
                            num_processes=2, process_id=pid)
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8 and jax.local_device_count() == 4

    from hectr_tpu.ckks.ntt import build_ntt_tables, ntt
    from hectr_tpu.ckks.primes import find_ntt_primes
    from hectr_tpu.parallel.ntt_shard import local_ntt_fns

    def log(msg):
        print(f"[worker {pid}] {msg}", flush=True)

    mesh = Mesh(np.array(jax.devices()), ("coeff",))
    log(f"mesh over {len(jax.devices())} devices across "
        f"{jax.process_count()} processes")

    # --- coeff-sharded NTT at logN=15, bit-exact per local shard -----
    n, limbs = 1 << 15, 4
    primes = tuple(find_ntt_primes(30, limbs, 2 * n))
    t = build_ntt_tables(n, primes)
    rng = np.random.default_rng(0)     # same seed -> same data, all procs
    a = rng.integers(0, np.array(primes).reshape(-1, 1),
                     size=(limbs, n)).astype(np.uint32)
    spec = P(None, "coeff")
    g = jax.device_put(a, NamedSharding(mesh, spec))
    fwd_l, inv_l = local_ntt_fns(t, "coeff", 8)
    fwd = jax.jit(jax.shard_map(fwd_l, mesh=mesh,
                                in_specs=spec, out_specs=spec))
    out = fwd(g)
    ref = np.asarray(jax.jit(lambda x: ntt(x, t))(
        jax.device_put(a, jax.local_devices()[0])))
    for sh in out.addressable_shards:
        assert np.array_equal(np.asarray(sh.data), ref[sh.index]), \
            f"NTT shard {sh.index} diverged"
    log(f"sharded NTT bit-exact on {len(out.addressable_shards)} "
        f"local shards @ logN=15 x {limbs} limbs")

    # --- sharded SCHEME op: negacyclic mul over the reference chain --
    from hectr_tpu.config import REFERENCE_HEMPC
    from hectr_tpu.ckks.context import make_context
    from hectr_tpu.ckks.modmath import mul_mod
    from hectr_tpu.parallel.coeff_ops import CoeffOps

    ctx = make_context(REFERENCE_HEMPC)
    k = ctx.max_limbs
    cops = CoeffOps(ctx, mesh)
    tt = ctx.tables(k)
    pcol = np.array(ctx.data_primes[:k]).reshape(-1, 1)
    b1 = rng.integers(0, pcol, size=(k, ctx.n)).astype(np.uint32)
    b2 = rng.integers(0, pcol, size=(k, ctx.n)).astype(np.uint32)
    got = cops.negacyclic_mul(jnp.asarray(b1), jnp.asarray(b2))
    # reference negacyclic mul, computed locally the same way CoeffOps
    # does (fwd, pointwise, inv)
    from hectr_tpu.ckks.ntt import intt

    loc = jax.local_devices()[0]
    fa = jax.jit(lambda x: ntt(x, tt))(jax.device_put(b1, loc))
    fb = jax.jit(lambda x: ntt(x, tt))(jax.device_put(b2, loc))
    want = np.asarray(jax.jit(lambda x, y: intt(
        mul_mod(x, y, tt.p, tt.mu, tt.k), tt))(fa, fb))
    for sh in got.addressable_shards:
        assert np.array_equal(np.asarray(sh.data), want[sh.index]), \
            f"negacyclic shard {sh.index} diverged"
    log(f"sharded negacyclic_mul bit-exact @ logN="
        f"{ctx.preset.logn} x {k} limbs")
    print(f"WORKER {pid} OK", flush=True)


def launcher() -> None:
    port = 47161
    env = dict(os.environ)
    env.pop("HECTR_COORDINATOR", None)
    t0 = time.time()
    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "worker", str(i),
         str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=REPO) for i in range(2)]
    outs = []
    ok = True
    for i, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
            ok = False
        outs.append(out)
        print(f"----- process {i} (rc={p.returncode}) -----")
        print(out)
        ok = ok and p.returncode == 0 and f"WORKER {i} OK" in out
    record = {
        "kind": "multihost_dcn_execution",
        "date": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "processes": 2,
        "devices_per_process": 4,
        "global_devices": 8,
        "backend": "cpu (localhost stand-in for DCN; same "
                   "jax.distributed + shard_map code path)",
        "ntt_bitexact_logn15": ok,
        "negacyclic_mul_bitexact": ok,
        "elapsed_s": round(time.time() - t0, 1),
        "ok": ok,
    }
    d = os.path.join(REPO, "results")
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "multihost_cpu.json"), "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps(record))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        worker(int(sys.argv[2]), int(sys.argv[3]))
    else:
        launcher()
