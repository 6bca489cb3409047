"""Run the FLAGSHIP_QP constrained encrypted closed loop end-to-end and
record the artifact (VERDICT r3 #5).

FLAGSHIP_QP (hectr_tpu.config): logN=15, 30 scale limbs + 2 base, 2
specials, width-2 digits, logQP = 870 < the 881-bit HE-standard 128-bit
ceiling at this degree.  This is the configuration the preset exists
for -- the default deg-7 / 2-iteration encrypted projected-gradient QP
(depth ledger pgd_limbs_required(7, 2, "w_scaled") = 28 <= k_in = 30)
-- which had never executed a closed loop before this script.

Differential twin: the plaintext PGD mirror (same fixed-iteration
polynomial control law); bar < 1e-4 per channel, box honored over
ciphertext, decode-imaginary canary < 1e-5 (src/ctr.c:493-494 parity).
Reference anchor: the plaintext-only constrained path src/mpc.c:411;
the encrypted loop shape src/ctr.c:571-595.

Usage:  JAX_PLATFORMS=cpu python scripts/run_flagship_qp.py [N_steps]
Writes: results/flagship_qp{N}/summary.json (+ trajectories .txt)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from hectr_tpu.config import FLAGSHIP_QP
from hectr_tpu.ckks import scheme as S
from hectr_tpu.ckks.context import make_context
from hectr_tpu.ckks.keyswitch import gen_relin_key, gen_rotation_keys
from hectr_tpu.ckks.security import security_report
from hectr_tpu.control.mpc import MPCBounds
from hectr_tpu.control.simulate import simulate
from hectr_tpu.hempc import hempc_init_state, make_hempc_regulator
from hectr_tpu.hempc.qp_enc import make_pgd_mirror_regulator, pgd_limbs_required
from tests.test_cstr import make_cstr_setup

BOUNDS = MPCBounds(dumin=np.array([-0.25, -0.004]),
                   dumax=np.array([0.25, 0.004]))
B0 = 4.0
ITERS, DEGREE = 2, 7          # the FLAGSHIP_QP design point


def main(N: int = 6) -> dict:
    t0 = time.time()
    need = pgd_limbs_required(DEGREE, ITERS, "w_scaled")
    ctx = make_context(FLAGSHIP_QP)
    k_in = ctx.max_limbs - 2
    assert need <= k_in, (need, k_in)
    sec = security_report(FLAGSHIP_QP)

    model, plant, p_seq, dt, _ = make_cstr_setup()
    p_seq = p_seq[:N].copy()
    p_seq[:, 0] = 0.0
    p_seq[2:, 0] = 0.1 * plant.ps[0]

    mirror = make_pgd_mirror_regulator(model, plant, 4, BOUNDS,
                                       iters=ITERS, degree=DEGREE,
                                       input_bound=B0)
    x_m, u_m, cert = simulate(
        model, plant, p_seq, dt, N, regulator=mirror, horizon=4,
        regulator_state=jnp.zeros((), jnp.float64), return_state=True)
    assert float(cert) <= B0, float(cert)
    print(f"[flagship-qp] mirror loop done ({time.time()-t0:.0f}s), "
          f"certificate {float(cert):.3f} <= {B0}", flush=True)

    keys = S.keygen(ctx, jax.random.PRNGKey(51))
    relin = gen_relin_key(ctx, keys, jax.random.PRNGKey(52))
    rot_keys = gen_rotation_keys(ctx, keys, jax.random.PRNGKey(53))
    reg = make_hempc_regulator(ctx, keys, rot_keys, model, plant, 4,
                               bounds=BOUNDS, relin_key=relin,
                               qp_iters=ITERS, qp_degree=DEGREE,
                               qp_input_bound=B0)
    print(f"[flagship-qp] keys ready ({time.time()-t0:.0f}s); "
          f"running encrypted loop...", flush=True)
    t1 = time.time()
    x_he, u_he, (_, canary) = simulate(
        model, plant, p_seq, dt, N, regulator=reg, horizon=4,
        regulator_state=hempc_init_state(jax.random.PRNGKey(54)),
        return_state=True)
    x_he = np.asarray(x_he)
    t_loop = time.time() - t1

    xdiff = np.max(np.abs(np.asarray(x_m) - x_he), axis=0)
    udiff = np.max(np.abs(np.asarray(u_m) - np.asarray(u_he)), axis=0)
    du = np.diff(np.asarray(u_he), axis=0)
    box_ok = bool(np.all(du <= np.asarray(BOUNDS.dumax) + 1e-4)
                  and np.all(du >= np.asarray(BOUNDS.dumin) - 1e-4))
    active = float(np.max(np.abs(du[:, 0])) / BOUNDS.dumax[0])

    out = {
        "kind": "flagship_qp_differential",
        "date": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "preset": (f"flagship-qp (logN=15, {ctx.max_limbs} data limbs, "
                   f"2 specials, width-2 digits, logQP={sec.log_qp} < "
                   f"{sec.max_logqp_128} ceiling, ~{sec.est_bits:.0f}-bit)"),
        "qp": {"iters": ITERS, "degree": DEGREE, "input_bound": B0,
               "depth_ledger": {"needed": need, "k_in": k_in},
               "bounds_dumin": BOUNDS.dumin.tolist(),
               "bounds_dumax": BOUNDS.dumax.tolist()},
        "loop": (f"N={N} steps, dt=1 min, horizon 4, +10% inlet "
                 f"disturbance from k=2 (loop shape src/ctr.c:571-595; "
                 f"constrained path plaintext-only in the reference, "
                 f"src/mpc.c:411)"),
        "backend": jax.devices()[0].platform,
        "max_abs_dev_vs_mirror": {
            "c_kmol_m3": float(xdiff[0]), "T_K": float(xdiff[1]),
            "h_m": float(xdiff[2]), "Tc_K": float(udiff[0]),
            "F_m3_min": float(udiff[1])},
        "box_honored": box_ok,
        "box_activity_frac": active,
        "input_certificate": float(cert),
        "noise_canary_max_imag": float(canary),
        "encrypted_loop_seconds": round(t_loop, 1),
        "steps_per_s": round(N / t_loop, 4),
    }
    assert np.all(xdiff < 1e-4) and np.all(udiff < 1e-4), (xdiff, udiff)
    assert box_ok and float(canary) < 1e-5

    d = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "results", f"flagship_qp{N}")
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "summary.json"), "w") as f:
        json.dump(out, f, indent=1)
    for name, arr in (("x_mirror", x_m), ("u_mirror", u_m),
                      ("x_encrypted", x_he), ("u_encrypted", u_he)):
        np.savetxt(os.path.join(d, name + ".txt"), np.asarray(arr))
    print(json.dumps(out, indent=1))
    return out


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 6)
