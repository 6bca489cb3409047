"""FLAGSHIP configuration: encrypted CSTR MPC at logN=15, L=20.

BASELINE.json configs[4] -- the stated end goal.  Same differential-twin
structure as the acceptance test (loop shape of reference
src/ctr.c:571-595), but at the deep-chain scale target: ring degree
2^15, 20 scale limbs (10 composite rescale levels), hybrid key switching
with 2 special primes and width-2 digits.

The loop runs a shortened horizon (8 steps, disturbance at k=3) so the
CPU backend finishes in CI time; the full 41-step run is the TPU bench
(bench.py hempc_step_logn15_L20).  What this proves that logn<=12 tests
cannot: the L=20 scale schedule, level-20 key-switch noise, deep-chain
encode/decode headroom, and the gemv pair at 22 data limbs all hold the
reference's differential bar.
"""

import jax
import numpy as np
import pytest

from hectr_tpu.config import FLAGSHIP
from hectr_tpu.ckks import scheme as S
from hectr_tpu.ckks.context import make_context
from hectr_tpu.ckks.keyswitch import gen_rotation_keys
from hectr_tpu.control.simulate import simulate
from hectr_tpu.hempc import hempc_init_state, make_hempc_regulator
from tests.test_cstr import make_cstr_setup

pytestmark = pytest.mark.slow


def test_flagship_encrypted_vs_plaintext():
    model, plant, p_seq, dt, _ = make_cstr_setup()
    N = 8
    p_seq = p_seq[:N].copy()
    p_seq[:, 0] = 0.0
    p_seq[3:, 0] = 0.1 * plant.ps[0]     # disturbance from k=3
    horizon = 4

    x_pt, u_pt = simulate(model, plant, p_seq, dt, N, horizon=horizon)

    ctx = make_context(FLAGSHIP)
    assert ctx.n == 1 << 15 and len(ctx.scale_primes) == 20
    keys = S.keygen(ctx, jax.random.PRNGKey(2026))
    rot_keys = gen_rotation_keys(ctx, keys, jax.random.PRNGKey(2027))
    reg = make_hempc_regulator(ctx, keys, rot_keys, model, plant, horizon)
    x_he, u_he, (_, canary) = simulate(
        model, plant, p_seq, dt, N, regulator=reg, horizon=horizon,
        regulator_state=hempc_init_state(jax.random.PRNGKey(17)),
        return_state=True)

    xdiff = np.max(np.abs(x_pt - x_he), axis=0)
    udiff = np.max(np.abs(u_pt - u_he), axis=0)
    print("flagship max |x_pt - x_he| per channel:", xdiff)
    print("flagship max |u_pt - u_he| per channel:", udiff)
    assert np.all(xdiff < 5e-10), xdiff
    assert np.all(udiff < 5e-10), udiff
    # per-decode imaginary-residue canary (src/ctr.c:493-494 parity)
    assert float(canary) < 1e-5, float(canary)
