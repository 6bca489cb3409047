"""Encrypted model-predictive control (the crown-jewel capability).

Reference: src/hempc.c `ctr_hempc` + src/ctr.c `hectr_simulate`.  The
regulator evaluates the unconstrained-MPC update entirely over CKKS
ciphertexts:

    du = -(K_A (xhat - xr) + K_B (uhat - ur))      [2 encrypted gemvs]
    u  = moddown(uhat) + du

with the gain matrices K_A = H^-1 Th' CC' QQ CC AA and K_B = ... BB
precomputed in plaintext ONCE (fixing the reference's per-step
recompute, src/hempc.c:232-238) and zero-embedded into the slot layout
(d2z_matrix parity).  Plaintext state enters through `enc`, the control
leaves through `dec` -- the trust boundary crosses exactly twice per
step (src/ctr.c:587-590).
"""

from hectr_tpu.hempc.regulator import hempc_init_state, make_hempc_regulator

__all__ = ["hempc_init_state", "make_hempc_regulator"]
