"""Standalone split-graph DIRECT flagship measurement (no watchdogs).

Same protocol as bench.bench_hempc_step_flagship -- encrypt / encrypted
regulator / decrypt as three separately-compiled executables chained
per step at the host (the reference's own per-step trust-boundary
shape, src/ctr.c:587-590) -- but engineered for a degraded tunnel:

  * progress prints between every pipeline stage,
  * each closed-loop step timed INDIVIDUALLY with its own host fetch,
  * the running median rate persisted to results/bench_cache.json after
    every step, so a wedge mid-run still leaves a valid measurement.

Run:  python scripts/run_flagship_split.py [K_steps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(K: int = 10) -> None:
    import jax
    import jax.numpy as jnp

    from bench import _cache_store, _sink
    from __graft_entry__ import _cstr_model_plant
    from hectr_tpu.config import FLAGSHIP
    from hectr_tpu.ckks import scheme as S
    from hectr_tpu.ckks.context import make_context
    from hectr_tpu.ckks.gemv import bsgs_rotations, gemv_apply
    from hectr_tpu.ckks.keyswitch import gen_rotation_keys
    from hectr_tpu.hempc.regulator import make_hempc_gemv_materials

    t00 = time.time()

    def log(msg):
        print(f"[split {time.time()-t00:7.0f}s] {msg}", flush=True)

    ctx = make_context(FLAGSHIP)
    k = ctx.max_limbs
    s = ctx.slots
    keys = S.keygen(ctx, jax.random.PRNGKey(0))
    jax.block_until_ready(keys.sk)
    log("keygen done")
    rot_keys = gen_rotation_keys(ctx, keys, jax.random.PRNGKey(1),
                                 rotations=bsgs_rotations(s))
    jax.block_until_ready(list(rot_keys.values()))
    log(f"{len(rot_keys)} BSGS rotation keys done")
    model, plant = _cstr_model_plant()
    mats = make_hempc_gemv_materials(ctx, rot_keys, model, plant, 4)
    jax.block_until_ready(mats)
    log("gemv materials done")

    def _enc_vec(v, key, ks):
        zre = jnp.zeros(s, jnp.float64).at[: v.shape[0]].set(v)
        return S.encrypt(ctx, ks, S.encode(ctx, (zre, jnp.zeros(s)), k),
                         key).data

    def enc4(xhat, uhat, xr, ur, c, sk, pk):
        ks = S.KeySet(sk=sk, pk=pk)
        k1, k2, k3, k4 = jax.random.split(
            jax.random.fold_in(jax.random.PRNGKey(7), c), 4)
        return jnp.stack([_enc_vec(xhat, k1, ks), _enc_vec(uhat, k2, ks),
                          _enc_vec(xr, k3, ks), _enc_vec(ur, k4, ks)])

    def reg(cts, mats):
        mat_A, mat_B = mats
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

    f_enc, f_reg, f_dec = jax.jit(enc4), jax.jit(reg), jax.jit(dec)
    xr, ur = jnp.zeros(3), jnp.zeros(2)
    sk, pk = keys.sk, keys.pk

    t0 = time.time()
    cts = f_enc(jnp.zeros(3), jnp.zeros(2), xr, ur, jnp.uint32(1), sk, pk)
    jax.block_until_ready(cts)
    log(f"enc compile+run done ({time.time()-t0:.0f}s)")
    t0 = time.time()
    u_d = f_reg(cts, mats)
    jax.block_until_ready(u_d)
    log(f"reg compile+run done ({time.time()-t0:.0f}s)")
    t0 = time.time()
    u, im = f_dec(u_d, sk, pk)
    jax.block_until_ready((u, im))
    log(f"dec compile+run done ({time.time()-t0:.0f}s); "
        f"imag residue {float(im):.2e}")

    dts = []
    for i in range(K):
        xh = jnp.asarray(np.full(3, 1e-3 * (i + 1)))
        t0 = time.perf_counter()
        cts = f_enc(xh, u, xr, ur, jnp.uint32(2 + i), sk, pk)
        u, im = f_dec(f_reg(cts, mats), sk, pk)
        _sink((u, im))
        dt = time.perf_counter() - t0
        dts.append(dt)
        med = float(np.median(dts))
        log(f"step {i+1}/{K}: {dt*1e3:.0f} ms (median {med*1e3:.0f} ms "
            f"-> {1.0/med:.2f} steps/s)")
        _cache_store(
            "hempc_step_logn15_L20", 1.0 / med,
            extra={"mode": ("split-graph direct: enc/reg/dec as three "
                            "executables chained per step at the host "
                            "(the reference's per-step trust-boundary "
                            "shape, src/ctr.c:587-590); 3 dispatches + "
                            "1 fetch per step included; median of "
                            f"{len(dts)} steps")})
    log(f"done: median {float(np.median(dts))*1e3:.0f} ms/step, "
        f"canary {float(im):.2e}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 10)
