"""Explain the batch-serving curve (VERDICT r4 next #3): per-phase
device rates for the encrypted-MPC step at the reference parameters,
at batch=1 vs batch=64 -- which phase stops scaling names the
saturated resource.

Phases (the per-step op inventory, src/hempc.c:253-266 shape):
  enc   -- 4 encode+pk-encrypt per loop (vmapped over batch)
  reg   -- the server computation: 2 hoisted gemvs + sub/neg/add glue
  dec   -- decrypt + decode, first nu slots

Each phase is chained in-graph (Rch repetitions per dispatch,
unique-scalar across dispatches) so the reading is device time, not
tunnel latency.  Also re-checks the batch=4 curve point (the first
curve run read 165.9/s aggregate there, BELOW batch=1 -- a
degraded-window artifact if it does not reproduce).

Run:  python scripts/bench_batch_phases.py
Writes cache entry hempc_batch_phases.
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

    from bench import (_cache_store, _hempc_batch_setup, _sink,
                       bench_hempc_batch)
    from hectr_tpu.ckks import scheme as S
    from hectr_tpu.ckks.gemv import gemv_apply

    backend = jax.devices()[0].platform
    print(f"[phases] backend: {backend}", flush=True)
    ctx, keys, model, plant, mats = _hempc_batch_setup()
    k = ctx.max_limbs
    s = ctx.slots
    mat_A, mat_B = mats
    sk, pk = keys.sk, keys.pk

    def enc4(xhat, uhat, c, sk, pk):
        ks = S.KeySet(sk=sk, pk=pk)
        vs = jnp.zeros((4, s), jnp.float64)
        vs = vs.at[0, :3].set(xhat).at[1, :2].set(uhat)
        eks = jax.random.split(jax.random.fold_in(jax.random.PRNGKey(7), c), 4)

        def one(v, ek):
            return S.encrypt(ctx, ks, S.encode(
                ctx, (v, jnp.zeros(s)), k), ek).data
        return jax.vmap(one)(vs, eks)

    def reg(cts, mat_A, mat_B):
        ct = lambda d: S.Ciphertext(data=d, scale=ctx.delta)  # noqa: E731
        xdiff = S.sub(ctx, ct(cts[0]), ct(cts[2]))
        udiff = S.sub(ctx, ct(cts[1]), ct(cts[3]))
        du = S.neg(ctx, S.add(ctx, gemv_apply(ctx, mat_A, xdiff),
                              gemv_apply(ctx, mat_B, udiff)))
        uhat_low = S.Ciphertext(data=cts[1][:, : du.limbs, :],
                                scale=ctx.delta)
        return S.add(ctx, uhat_low, du).data

    def dec(u_data, sk, pk):
        ct = S.Ciphertext(data=u_data, scale=ctx.delta)
        re, im = S.decode_ri(ctx, S.decrypt(
            ctx, S.KeySet(sk=sk, pk=pk), ct))
        return re[:2], jnp.max(jnp.abs(im))

    rates = {}

    def measure(name, build, x0, Rch=8, iters=3):
        f = jax.jit(build)
        r = f(x0, jnp.uint32(1))
        jax.block_until_ready(r)
        _sink(f(x0, jnp.uint32(1000001)))
        t0 = time.perf_counter()
        y = x0
        for i in range(iters):
            y = f(y, jnp.uint32(2 + i))
        _sink(y)
        rate = Rch * iters / (time.perf_counter() - t0)
        rates[name] = rate
        print(f"[phases] {name}: {rate:.1f}/s (chained {Rch}/dispatch)",
              flush=True)

    batches = tuple(int(x) for x in os.environ.get(
        "HECTR_PHASES_BATCHES", "1,64").split(","))
    for B in batches:
        # --- enc: B loops x 4 encrypts, chained via the uhat slot ----
        def enc_chain(xs, c, B=B):
            def body(i, xs):
                ci = c * jnp.uint32(8) + i.astype(jnp.uint32)

                def one(x):
                    cts = enc4(x[:3], x[3:5], ci, sk, pk)
                    return x.at[3:5].set(x[3:5] + 1e-18 * cts[1, 0, 0, 0]
                                         .astype(jnp.float64))
                return jax.vmap(one)(xs)
            return jax.lax.fori_loop(0, 8, body, xs)

        xs0 = jnp.asarray(np.tile(np.linspace(0.001, 0.005, 5), (B, 1)))
        measure(f"enc_b{B}", lambda xs, c: enc_chain(xs, c), xs0)

        # --- reg: B x (2 gemvs + glue), chained ct -> ct -------------
        ct0 = S.encrypt(ctx, keys, S.encode(
            ctx, (jnp.ones(s), jnp.zeros(s)), k), jax.random.PRNGKey(5))
        cts0 = jnp.broadcast_to(ct0.data, (B, 4) + ct0.data.shape)

        def reg_chain(cts, c, B=B):
            cts = jnp.where(cts == c, cts - c, cts)

            def body(i, cc):
                def one(c4):
                    out = reg(c4, mat_A, mat_B)     # [2, k-2, N]
                    pad = c4[0][:, out.shape[1]:, :]
                    nxt = jnp.concatenate([out, pad], axis=1)
                    return c4.at[0].set(nxt)
                return jax.vmap(one)(cc)
            return jax.lax.fori_loop(0, 8, body, cts)

        measure(f"reg_b{B}", reg_chain, jnp.asarray(cts0))

        # --- dec: B decrypt+decode, chained through a scalar ---------
        d0 = jnp.broadcast_to(ct0.data, (B,) + ct0.data.shape)

        def dec_chain(d, c, B=B):
            d = jnp.where(d == c, d - c, d)

            def body(i, dd):
                def one(x):
                    re, im = dec(x, sk, pk)
                    return x.at[0, 0, 0].set(
                        x[0, 0, 0] + (re[0] * 0).astype(jnp.uint32))
                return jax.vmap(one)(dd)
            return jax.lax.fori_loop(0, 8, body, d)

        measure(f"dec_b{B}", dec_chain, jnp.asarray(d0))

    # --- batch=4 curve point re-check -------------------------------
    agg4 = bench_hempc_batch(batch=4, iters=2, inner=16)
    print(f"[phases] batch=4 recheck: {agg4:.1f}/s aggregate", flush=True)

    if backend == "tpu":
        _cache_store(
            "hempc_batch_phases", rates["reg_b64"],
            extra={"phases_per_s": {n: round(v, 1)
                                    for n, v in rates.items()},
                   "batch4_recheck_aggregate": round(agg4, 1),
                   "note": ("per-phase chained device rates at batch 1 "
                            "vs 64 (8 reps/dispatch, logn12 reference "
                            "params); value = reg_b64 (the dominant "
                            "server phase, rate in phase-executions/s "
                            "where one execution = batch x (2 gemvs + "
                            "glue))")})


if __name__ == "__main__":
    main()
