"""FUSED single-ciphertext flagship step on the chip (VERDICT r4 #8).

The reference-shaped per-step protocol moves 4 ciphertexts and runs two
sequential hoisted gemvs (measured 121 ms/step, ~83 ms in the gemvs);
the fused protocol (hectr_tpu.hempc.fused) packs [v1 | v2] into ONE
ciphertext and computes u = (S-K) v1 + K v2 with ONE encryption, ONE
hoisted gemv, ONE decrypt -- algebraically identical, a quarter of the
encryption work and half the key-switch work per step.

Split-graph protocol like scripts/run_flagship_split.py: enc / gemv /
dec as three separately-compiled executables chained per step at the
host (the trust boundary is crossed every step); every step's decoded
control feeds the next step's packed encryption; per-step timing with
a host fetch; running median persisted to the bench cache
(hempc_step_logn15_L20_fused) after every step.

Run:  python scripts/run_flagship_fused.py [K_steps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(K: int = 12) -> None:
    import jax
    import jax.numpy as jnp

    from bench import _cache_store, _sink
    from __graft_entry__ import _cstr_model_plant
    from hectr_tpu.config import FLAGSHIP
    from hectr_tpu.ckks import scheme as S
    from hectr_tpu.ckks.context import make_context
    from hectr_tpu.ckks.gemv import bsgs_rotations, gemv_apply
    from hectr_tpu.ckks.keyswitch import gen_rotation_keys
    from hectr_tpu.hempc.fused import make_fused_materials, pack_offset

    t00 = time.time()

    def log(msg):
        print(f"[fused {time.time()-t00:7.0f}s] {msg}", flush=True)

    backend = jax.devices()[0].platform
    log(f"backend: {backend}")
    if os.environ.get("HECTR_REQUIRE_TPU") == "1" and backend != "tpu":
        log("TPU required but backend is not tpu -- exiting rc=3")
        sys.exit(3)

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
    mats = make_fused_materials(ctx, rot_keys, model, plant, 4)
    del rot_keys
    jax.block_until_ready(mats)
    method = "diag" if "diag" in mats else "bsgs"
    log(f"fused gemv materials done (method={method})")

    nx, nu = 3, 2
    d = nx + nu
    off = pack_offset(s, d)

    def enc(xhat, uhat, xr, ur, c, sk, pk):
        ks = S.KeySet(sk=sk, pk=pk)
        z = (jnp.zeros(s, jnp.float64)
             .at[:nx].set(xhat).at[nx:d].set(uhat)
             .at[off:off + nx].set(xr).at[off + nx:off + d].set(ur))
        ek = jax.random.fold_in(jax.random.PRNGKey(7), c)
        return S.encrypt(ctx, ks, S.encode(
            ctx, (z, jnp.zeros(s, jnp.float64)), k), ek).data

    def gemv(ct_data, mats):
        ct = S.Ciphertext(data=ct_data, scale=ctx.delta)
        return gemv_apply(ctx, mats, ct).data

    def dec(u_data, sk, pk):
        ct = S.Ciphertext(data=u_data, scale=ctx.delta)
        re, im = S.decode_ri(ctx, S.decrypt(
            ctx, S.KeySet(sk=sk, pk=pk), ct))
        return re[:nu], jnp.max(jnp.abs(im))

    f_enc, f_gemv, f_dec = jax.jit(enc), jax.jit(gemv), jax.jit(dec)
    sk, pk = keys.sk, keys.pk
    xr, ur = jnp.zeros(3), jnp.zeros(2)

    t0 = time.time()
    ctd = f_enc(jnp.zeros(3), jnp.zeros(2), xr, ur, jnp.uint32(1), sk, pk)
    jax.block_until_ready(ctd)
    log(f"enc compile+run done ({time.time()-t0:.0f}s)")
    t0 = time.time()
    u_d = f_gemv(ctd, mats)
    jax.block_until_ready(u_d)
    log(f"gemv compile+run done ({time.time()-t0:.0f}s)")
    t0 = time.time()
    u, im = f_dec(u_d, sk, pk)
    jax.block_until_ready((u, im))
    log(f"dec compile+run done ({time.time()-t0:.0f}s); "
        f"imag residue {float(im):.2e}")

    dts = []
    for i in range(K):
        xh = jnp.asarray(np.full(3, 1e-3 * (i + 1)))
        t0 = time.perf_counter()
        ctd = f_enc(xh, u, xr, ur, jnp.uint32(2 + i), sk, pk)
        u, im = f_dec(f_gemv(ctd, mats), sk, pk)
        _sink((u, im))
        dt = time.perf_counter() - t0
        dts.append(dt)
        med = float(np.median(dts))
        log(f"step {i+1}/{K}: {dt*1e3:.0f} ms (median {med*1e3:.0f} ms "
            f"-> {1.0/med:.2f} steps/s)")
        if backend == "tpu":
            _cache_store(
                "hempc_step_logn15_L20_fused", 1.0 / med,
                extra={"mode": ("fused single-ciphertext protocol "
                                "(hempc.fused): pack [v1|v2] -> ONE "
                                "encrypt, ONE hoisted gemv "
                                f"({method}), ONE decrypt per step; "
                                "3 dispatches + 1 fetch per step "
                                "included; median of "
                                f"{len(dts)} steps")})
    log(f"done: median {float(np.median(dts))*1e3:.0f} ms/step, "
        f"canary {float(im):.2e}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 12)
