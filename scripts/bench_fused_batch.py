"""Flagship SERVING capacity: the fused single-ciphertext protocol
vmapped over a batch of independent control loops at logN=15, L=20 --
how many flagship-scale encrypted-MPC loops one chip can regulate
concurrently (the batch axis of SURVEY §2.6 at the flagship parameters;
the logn12 serving curve is bench_hempc_batch_curve).

Protocol: per dispatch, each loop runs `inner` fused steps inside one
jitted lax.scan (enc_pack -> hoisted gemv -> decrypt, the decoded u
feeding the next step's packed encryption); dispatches chain through
the decoded controls.  Aggregate steps/s = batch*inner*iters/elapsed.

Run:  python scripts/bench_fused_batch.py
Writes cache entry hempc_fused_batch_logn15.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    import jax

    if os.environ.get("HECTR_FORCE_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from bench import _cache_store, _sink
    from __graft_entry__ import _cstr_model_plant
    from hectr_tpu.config import FLAGSHIP
    from hectr_tpu.ckks import scheme as S
    from hectr_tpu.ckks.context import make_context
    from hectr_tpu.ckks.gemv import bsgs_rotations
    from hectr_tpu.ckks.keyswitch import gen_rotation_keys
    from hectr_tpu.hempc import hempc_init_state
    from hectr_tpu.hempc.fused import make_fused_materials, make_fused_regulator

    t00 = time.time()

    def log(msg):
        print(f"[fusedb {time.time()-t00:6.0f}s] {msg}", flush=True)

    backend = jax.devices()[0].platform
    log(f"backend: {backend}")
    ctx = make_context(FLAGSHIP)
    keys = S.keygen(ctx, jax.random.PRNGKey(0))
    rot_keys = gen_rotation_keys(ctx, keys, jax.random.PRNGKey(1),
                                 rotations=bsgs_rotations(ctx.slots))
    model, plant = _cstr_model_plant()
    mats = make_fused_materials(ctx, rot_keys, model, plant, 4)
    del rot_keys
    jax.block_until_ready(mats)
    log("materials done")
    xr, ur = jnp.zeros(3), jnp.zeros(2)

    def loop(u0, xs_seq, key, mats, sk, pk):
        reg = make_fused_regulator(ctx, S.KeySet(sk=sk, pk=pk), model,
                                   plant, 4, mats)

        def body(carry, x):
            u, st = carry
            u2, st2 = reg(st, x, u, xr, ur)
            return (u2, st2), ()
        (u, _), _ = jax.lax.scan(body, (u0, hempc_init_state(key)), xs_seq)
        return u

    results = {}
    inner, iters = 8, 3
    for B in (1, 4, 8):
        f = jax.jit(jax.vmap(loop, in_axes=(0, 0, 0, None, None, None)))
        ks = jax.random.split(jax.random.PRNGKey(7), B)
        xs0 = jnp.zeros((B, inner, 3))
        t0 = time.time()
        u = f(jnp.zeros((B, 2)), xs0, ks, mats, keys.sk, keys.pk)
        _sink(u)
        log(f"B={B} compile+run done ({time.time()-t0:.0f}s)")
        u = f(jnp.zeros((B, 2)), xs0 + 1e-12, ks, mats, keys.sk, keys.pk)
        _sink(u)
        seqs = [xs0 + 1e-9 * (i + 1) for i in range(iters)]
        jax.block_until_ready(seqs)
        t0 = time.perf_counter()
        for i in range(iters):
            u = f(u, seqs[i], ks, mats, keys.sk, keys.pk)
        _sink(u)
        agg = B * inner * iters / (time.perf_counter() - t0)
        results[str(B)] = {"aggregate_steps_s": round(agg, 2),
                           "per_loop_steps_s": round(agg / B, 2)}
        log(f"B={B}: {agg:.2f}/s aggregate, {agg / B:.2f}/s per loop")

    if backend == "tpu":
        _cache_store(
            "hempc_fused_batch_logn15", results["8"]["aggregate_steps_s"],
            extra={"curve": results,
                   "note": ("fused single-ct protocol vmapped over "
                            "independent loops at FLAGSHIP (logN=15, "
                            "L=20), inner=8 scan steps/dispatch, 3 "
                            "chained dispatches; value = batch-8 "
                            "aggregate steps/s")})


if __name__ == "__main__":
    main()
