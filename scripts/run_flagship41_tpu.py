"""The full 41-step encrypted CSTR closed loop ON THE CHIP at the
flagship parameters (BASELINE configs[4]: encrypted CSTR MPC at
logN=15, L=20 matching reference outputs).

One jitted lax.scan over all 40 steps: measure -> Kalman update ->
target selector -> [encrypt -> encrypted regulator -> decrypt] ->
nonlinear CSTR plant (implicit stiff step) -> Kalman time update --
the reference loop shape src/ctr.c:571-595 with the trust boundary
crossed inside the graph each step.  Key material and gemv materials
travel as jit ARGUMENTS (closure captures would lower as HLO literals
and stall the remote compile in XLA constant folding).

Differential twin: the plaintext closed loop (control.simulate), the
reference's own acceptance test (tests/hectr.c cstr-cmp; committed
bar <= 9.7e-11 per channel at logn=12 -- BASELINE.md).

Run:  python scripts/run_flagship41_tpu.py
Writes: results/flagship41_tpu/{summary.json, *.txt}
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from bench import _cache_store
    from hectr_tpu.config import FLAGSHIP
    from hectr_tpu.ckks import scheme as S
    from hectr_tpu.ckks.context import make_context
    from hectr_tpu.ckks.gemv import bsgs_rotations
    from hectr_tpu.ckks.keyswitch import gen_rotation_keys
    from hectr_tpu.control.simulate import simulate
    from hectr_tpu.control.stages import (
        actuate, estimate_forward, estimator_gains, measure,
        measure_forward, select_target, selector_matrix)
    from hectr_tpu.hempc import hempc_init_state, make_hempc_regulator
    from hectr_tpu.hempc.regulator import make_hempc_gemv_materials
    from __graft_entry__ import _cstr_model_plant

    t00 = time.time()

    def log(msg):
        print(f"[41tpu {time.time()-t00:7.0f}s] {msg}", flush=True)

    # NOTE: do NOT import tests.test_cstr here -- tests/conftest.py
    # force-sets JAX_PLATFORMS=cpu at import time, silently demoting
    # this run to the CPU backend (bitten once)
    model, plant = _cstr_model_plant()
    dt, N = 1.0, 40
    p_seq = np.zeros((N, 1))
    p_seq[9:, 0] = 0.1 * plant.ps[0]   # +10% inlet flow from k=9
    backend = jax.devices()[0].platform
    log(f"backend: {backend}")
    if os.environ.get("HECTR_REQUIRE_TPU") == "1" and backend != "tpu":
        # the axon plugin falls back to cpu when the tunnel wedges at
        # process init; bail before burning minutes on a mislabeled run
        log("TPU required but backend is not tpu -- exiting rc=3")
        sys.exit(3)

    # plaintext twin (small f64 scan; compiles in seconds)
    x_pt, u_pt = simulate(model, plant, p_seq, dt, N, horizon=4)
    log("plaintext twin done")

    ctx = make_context(FLAGSHIP)
    keys = S.keygen(ctx, jax.random.PRNGKey(0))
    jax.block_until_ready(keys.sk)
    log("keygen done")
    rot_keys = gen_rotation_keys(ctx, keys, jax.random.PRNGKey(1),
                                 rotations=bsgs_rotations(ctx.slots))
    jax.block_until_ready(list(rot_keys.values()))
    mats = make_hempc_gemv_materials(ctx, rot_keys, model, plant, 4)
    jax.block_until_ready(mats)
    log("6 BSGS keys + gemv materials done")

    Lx, Ld = estimator_gains(model.A, model.B, model.C, model.Bd,
                             model.Cd, plant.xs)
    Ginv = selector_matrix(model.A, model.B, model.C, model.Hr)
    f64 = jnp.float64
    A, B, C = (jnp.asarray(m, f64) for m in (model.A, model.B, model.C))
    Bd, Cd, Hr = (jnp.asarray(m, f64) for m in (model.Bd, model.Cd,
                                                model.Hr))
    LxJ, LdJ, GinvJ = (jnp.asarray(m, f64) for m in (Lx, Ld, Ginv))
    xs, us, ps = (jnp.asarray(v, f64) for v in (plant.xs, plant.us,
                                                plant.ps))
    rsp = jnp.zeros(2, f64)
    pseq_j = jnp.asarray(p_seq, f64)

    def loop(mats, sk, pk, key0, pseq):
        reg = make_hempc_regulator(ctx, S.KeySet(sk=sk, pk=pk), {},
                                   model, plant, 4, gemv_mats=mats)

        def step(carry, inp):
            x, xhatm, dhatm, u_prev, st = carry
            k, p_k = inp
            y = measure(C, x)
            xhat, dhat = measure_forward(C, Cd, LxJ, LdJ, y, xhatm, dhatm)
            xr, ur = select_target(Bd, Cd, Hr, GinvJ, dhat, rsp)
            uhat = jnp.where(k == 0, ur, u_prev)
            u, st = reg(st, xhat, uhat, xr, ur)
            x_next = actuate(plant.ode, plant.jacobian, x, u, p_k,
                             xs, us, ps, dt)
            xhatm_n, dhatm_n = estimate_forward(A, B, Bd, xhat, dhat, u)
            return (x_next, xhatm_n, dhatm_n, u, st), (x, u)

        init = (jnp.zeros(3, f64), jnp.zeros(3, f64), jnp.zeros(2, f64),
                jnp.zeros(2, f64), hempc_init_state(key0))
        carry, (x_traj, u_traj) = jax.lax.scan(
            step, init, (jnp.arange(N), pseq))
        x_all = jnp.vstack([x_traj, carry[0][None, :]]) + xs[None, :]
        u_all = u_traj + us[None, :]
        return x_all, u_all, carry[4][1]   # canary

    f = jax.jit(loop)
    log("compiling + running the 41-step encrypted scan "
        "(expect tens of minutes on the remote compiler)...")
    t0 = time.time()
    x_he, u_he, canary = f(mats, keys.sk, keys.pk,
                           jax.random.PRNGKey(42), pseq_j)
    jax.block_until_ready(x_he)
    t_first = time.time() - t0
    log(f"compile+run done ({t_first:.0f}s)")
    # timed second run (compile cached, fresh PRNG path)
    t0 = time.perf_counter()
    x2, u2, c2 = f(mats, keys.sk, keys.pk, jax.random.PRNGKey(43), pseq_j)
    jax.block_until_ready(x2)
    t_loop = time.perf_counter() - t0
    log(f"second full loop: {t_loop:.1f}s = {N / t_loop:.2f} steps/s, "
        f"canary {float(c2):.2e}")

    x_he, u_he = np.asarray(x_he), np.asarray(u_he)
    xdiff = np.max(np.abs(x_pt - x_he), axis=0)
    udiff = np.max(np.abs(u_pt - u_he), axis=0)
    log(f"max |x_pt - x_he| = {xdiff}, max |u_pt - u_he| = {udiff}")
    out = {
        "kind": "flagship_41step_differential_tpu",
        "date": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "preset": "flagship (logN=15, 20 scale limbs, 2 specials, "
                  "width-2 digits, BSGS rotation set)",
        "loop": "N=40 steps (41 records), dt=1 min, horizon 4, +10% "
                "inlet-flow disturbance from k=9 "
                "(reference loop shape src/ctr.c:571-595)",
        "backend": backend,
        "max_abs_deviation_per_channel": {
            "c_kmol_m3": float(xdiff[0]), "T_K": float(xdiff[1]),
            "h_m": float(xdiff[2]), "Tc_K": float(udiff[0]),
            "F_m3_min": float(udiff[1])},
        "reference_artifact_bar": {
            "note": "reference cstr-cmp.bin at logn=12",
            "c": 3.193e-13, "T": 9.72e-11, "h": 8.55e-12,
            "Tc": 9.675e-11, "F": 1.108e-12},
        "noise_canary_max_imag": float(c2),
        "compile_plus_first_run_seconds": round(t_first, 1),
        "full_loop_seconds_on_chip": round(t_loop, 2),
        "steps_per_s": round(N / t_loop, 3),
        "final_state": [round(float(v), 4) for v in x_he[-1]],
    }
    d = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "results", "flagship41_tpu")
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "summary.json"), "w") as fjs:
        json.dump(out, fjs, indent=1)
    np.savetxt(os.path.join(d, "cstr-hempc-x.txt"), x_he)
    np.savetxt(os.path.join(d, "cstr-hempc-u.txt"), u_he)
    np.savetxt(os.path.join(d, "cstr-mpc-x.txt"), x_pt)
    np.savetxt(os.path.join(d, "cstr-mpc-u.txt"), u_pt)
    if backend == "tpu":
        _cache_store("hempc_41step_loop_logn15_L20", N / t_loop,
                     extra={"mode": "full closed loop on chip (plant + "
                                    "estimator + selector + encrypted "
                                    "regulator in one scan)"})
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
