"""Measure the compact-key trade ONCE on the chip (VERDICT r4 weak #3:
keyswitch.py claimed "~5% slower end-to-end" without a recorded
measurement).  Same B=64 unique-scalar chained ct-ct protocol as the
bench's logn14 section, run twice: stored-Shoup-companion relin key
([dnum, 4, lf, N]) vs compact key ([dnum, 2, lf, N], u64-Barrett inner
product).  Records both rates + key bytes to cache entry
compact_key_tradeoff.

Run:  python scripts/bench_compact_key.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def measure(compact: bool) -> tuple[float, int]:
    import jax
    import jax.numpy as jnp

    from bench import _sink
    from hectr_tpu.config import CKKSPreset
    from hectr_tpu.ckks import scheme as S
    from hectr_tpu.ckks.context import make_context
    from hectr_tpu.ckks.keyswitch import _key_bytes, gen_relin_key, mul_ct
    from hectr_tpu.ckks.scheme import Ciphertext

    preset = CKKSPreset(name="bench14", logn=14, slots=64, scale_bits=50,
                        limb_bits=25, mult_depth=5)
    ctx = make_context(preset)
    keys = S.keygen(ctx, jax.random.PRNGKey(0))
    rk = gen_relin_key(ctx, keys, jax.random.PRNGKey(1), compact=compact)
    kb = _key_bytes(ctx, compact=compact)
    v = np.random.default_rng(0).uniform(-1, 1, ctx.slots
                                         ).astype(np.complex128)
    enc = jax.jit(lambda key: S.encrypt(
        ctx, keys, S.encode(ctx, v, ctx.max_limbs), key).data)
    cb = Ciphertext(data=enc(jax.random.PRNGKey(3)), scale=ctx.delta)
    B = 64

    def mult_batch(a_stack, c, rk):
        a_stack = jnp.where(a_stack == c, a_stack - c, a_stack)

        def one(a):
            ct = Ciphertext(data=a, scale=ctx.delta)
            return S.rescale_pair(ctx, mul_ct(ctx, ct, cb, rk)).data
        return jax.vmap(one)(a_stack)

    f = jax.jit(mult_batch)
    base = jnp.stack([enc(jax.random.PRNGKey(100 + j)) for j in range(B)])
    jax.block_until_ready(base)
    _sink(f(base, jnp.uint32(1), rk))
    _sink(f(base, jnp.uint32(1000001), rk))
    iters = 3
    t0 = time.perf_counter()
    rs = [f(base, jnp.uint32(2 + i), rk) for i in range(iters)]
    for r in rs:
        _sink(r)
    return iters * B / (time.perf_counter() - t0), kb


def main() -> None:
    import jax

    from bench import _cache_store

    backend = jax.devices()[0].platform
    print(f"[compact] backend: {backend}", flush=True)
    t0 = time.time()
    rate_full, kb_full = measure(compact=False)
    print(f"[compact] stored-companion key: {rate_full:.1f} mult/s, "
          f"{kb_full >> 20} MB ({time.time()-t0:.0f}s)", flush=True)
    t0 = time.time()
    rate_comp, kb_comp = measure(compact=True)
    print(f"[compact] compact key:          {rate_comp:.1f} mult/s, "
          f"{kb_comp >> 20} MB ({time.time()-t0:.0f}s)", flush=True)
    slowdown = 100.0 * (rate_full / rate_comp - 1.0)
    print(f"[compact] compact is {slowdown:+.1f}% slower for "
          f"{100.0 * (1 - kb_comp / kb_full):.0f}% less key memory",
          flush=True)
    if backend == "tpu":
        _cache_store(
            "compact_key_tradeoff", rate_comp,
            extra={"full_key_mult_per_s": round(rate_full, 1),
                   "compact_key_mult_per_s": round(rate_comp, 1),
                   "full_key_mb": kb_full >> 20,
                   "compact_key_mb": kb_comp >> 20,
                   "compact_slowdown_pct": round(slowdown, 1),
                   "note": ("ct-ct mult (relin+rescale) at logN=14 "
                            "L=10, B=64 chained protocol; compact = "
                            "no stored Shoup companions (half the key "
                            "bytes, u64-Barrett inner product)")})


if __name__ == "__main__":
    main()
