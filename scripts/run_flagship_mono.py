"""Monolithic flagship measurement: the WHOLE inner=8-step encrypted
loop as ONE jitted scan (bench._bench_regulator_steps), standalone so
no watchdog kills the remote compile.  With gemv materials threaded as
jit arguments (no constant-foldable captures) the graph may now
compile inside a tunnel window -- the regulator subgraph alone took
58 s once the compile queue drained (scripts/run_flagship_split.py log,
2026-08-21)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import _bench_regulator_steps, _cache_store
from hectr_tpu.config import FLAGSHIP

t0 = time.time()
r = _bench_regulator_steps(FLAGSHIP, iters=4, bsgs=True)
print(f"[mono] {r:.3f} steps/s ({time.time()-t0:.0f}s total)", flush=True)
_cache_store("hempc_step_logn15_L20_mono", r, extra={
    "mode": ("monolithic: inner=8 closed-loop steps per jitted scan, "
             "4 chained dispatches; BSGS keys + gemv materials as args")})
