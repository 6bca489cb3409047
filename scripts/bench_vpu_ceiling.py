"""Pure-streaming modular-multiply ceiling on the chip (VERDICT r4
next #7): measure the attainable issue rate of the exact primitive the
NTT butterfly is built from -- `mul_mod_shoup_u32_lazy` (16-bit-partial
hi32, wrapping correction, no selects) -- with NO rolls, NO masks, NO
twiddle indexing: a VMEM-resident block chained through R dependent
multiplies per element inside one Pallas kernel.

This pins the denominator of DESIGN.md §5.1's "healthy fraction of the
VPU's issue capacity": the NTT kernel executes 22 full-width lazy
Shoup multiplies per element per limb-transform at logN=15 (8 row
stages x 1 + 7 lane stages x 2 chained) plus rolls/lazy-addsub/select
overhead; ceiling% = (NTT mults/s) / (streaming mults/s).

Run:  python scripts/bench_vpu_ceiling.py            (real chip)
      HECTR_FORCE_CPU=1 ... --interpret              (logic smoke)
Writes cache entry vpu_ceiling_u32.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

LANES = 128
BR = 512          # sublane rows per grid program (256 KB block)
ROWS = 4096       # total rows: 2 MB array, 8 grid programs
R_CHAIN = 512     # dependent multiplies per element per kernel call
CALLS = 4         # kernel calls chained per jit dispatch


def main() -> None:
    import jax

    if os.environ.get("HECTR_FORCE_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from bench import _cache_load, _cache_store, _sink
    from hectr_tpu.ckks.modmath import mul_mod_shoup_u32_lazy
    from hectr_tpu.ckks.primes import find_ntt_primes

    interpret = "--interpret" in sys.argv
    backend = jax.devices()[0].platform
    print(f"[vpu] backend: {backend}, interpret={interpret}", flush=True)

    p = find_ntt_primes(30, 1, 2 * (1 << 15))[0]
    rng = np.random.default_rng(0)
    w = rng.integers(1, p, size=(1, LANES), dtype=np.uint64)
    wsh = ((w.astype(object) << 32) // p % (1 << 32)).astype(np.uint32)
    w32 = w.astype(np.uint32)
    p32 = np.full((1, LANES), p, dtype=np.uint32)
    x0 = rng.integers(0, p, size=(ROWS, LANES), dtype=np.uint64
                      ).astype(np.uint32)

    def kernel(w_ref, wsh_ref, p_ref, x_ref, o_ref):
        wv = w_ref[...]
        wshv = wsh_ref[...]
        pv = p_ref[...]
        x = x_ref[...]

        def body(i, v):
            return mul_mod_shoup_u32_lazy(v, wv, wshv, pv)
        o_ref[...] = jax.lax.fori_loop(0, R_CHAIN, body, x)

    row_spec = pl.BlockSpec((1, LANES), lambda i: (i * 0, i * 0),
                            memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        grid=(ROWS // BR,),
        in_specs=[row_spec, row_spec, row_spec,
                  pl.BlockSpec((BR, LANES), lambda i: (i, i * 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((BR, LANES), lambda i: (i, i * 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ROWS, LANES), jnp.uint32),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )

    @jax.jit
    def chain(x, c):
        x = jnp.where(x == c, x - c, x)   # unique per call (memoization)

        def body(i, v):
            return call(jnp.asarray(w32), jnp.asarray(wsh), jnp.asarray(p32),
                        v)
        return jax.lax.fori_loop(0, CALLS, body, x)

    x = jnp.asarray(x0)
    # correctness probe: R_CHAIN*CALLS chained mults == pow(w, ...) mod p
    got = np.asarray(chain(x, jnp.uint32(0xFFFFFFFF))) % p
    wpow = pow(int(w[0, 0]), R_CHAIN * CALLS, p)
    want = (x0[:, 0].astype(object) * wpow) % p
    assert np.array_equal(got[:, 0].astype(object), want), "chain wrong"
    print("[vpu] correctness probe ok", flush=True)

    _sink(chain(x, jnp.uint32(1)))
    _sink(chain(x, jnp.uint32(1000001)))
    iters = 6
    t0 = time.perf_counter()
    r = x
    for i in range(iters):
        r = chain(r, jnp.uint32(2 + i))
    _sink(r)
    dt = (time.perf_counter() - t0) / iters
    mults = ROWS * LANES * R_CHAIN * CALLS
    mult_rate = mults / dt
    ops_per_mult = 18     # 15 (mulhi32: 2 split, 4 partial mults, 4 add,
    #                       1 shift-fold, 2 carry cmp+sel, 2 shifts) +
    #                       a*w, q*p, sub
    u32_rate = mult_rate * ops_per_mult
    print(f"[vpu] {dt*1e3:.2f} ms/dispatch -> {mult_rate/1e9:.1f} G "
          f"lazy-Shoup mult/s = {u32_rate/1e12:.2f} T u32-op/s",
          flush=True)

    # NTT kernel as % of this ceiling: mults per limb-NTT at logN=15 =
    # 22 full-width (8 row stages x1 + 7 lane stages x2)
    ntt_ent = _cache_load().get("ntt_logn15", {})
    pct = None
    if ntt_ent.get("backend") == backend:
        ntt_mult_rate = ntt_ent["value"] * 32768 * 22
        pct = round(100.0 * ntt_mult_rate / mult_rate, 1)
        print(f"[vpu] NTT kernel ({ntt_ent['value']:.0f}/s incl. "
              f"dispatch) issues {ntt_mult_rate/1e9:.1f} G mult/s = "
              f"{pct}% of the streaming ceiling (plus rolls/selects/"
              f"lazy-addsub overhead it must also issue)", flush=True)

    if backend == "tpu" and not interpret:
        _cache_store(
            "vpu_ceiling_u32", u32_rate,
            extra={"mult_per_s": round(mult_rate),
                   "ops_per_mult": ops_per_mult,
                   "ntt_kernel_pct_of_ceiling": pct,
                   "note": ("pure-streaming mul_mod_shoup_u32_lazy "
                            "chain in VMEM (no rolls/masks/twiddle "
                            "loads): the attainable issue ceiling for "
                            "the butterfly primitive; NTT%% counts the "
                            "kernel's 22 full-width mults per element "
                            "per limb-transform at logN=15")})


if __name__ == "__main__":
    main()
