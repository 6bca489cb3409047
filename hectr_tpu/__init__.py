"""HECTR-TPU: a TPU-native homomorphically-encrypted control framework.

A from-scratch rebuild of the capabilities of OChicken/HECTR (a C
control-engineering + CKKS homomorphic-encryption stack) designed for
TPU hardware: the CKKS cryptographic compute path is JAX/XLA (with
Pallas kernels for the hot modular-arithmetic ops), polynomial state is
RNS-limb `uint32[L, N]` arrays that shard across a `jax.sharding.Mesh`,
and the control stack is float64 JAX/NumPy.

Layer map (mirrors /root/reference layering, reimagined TPU-first):

  hectr_tpu.control   -- ODE integrators, linearization, Riccati/LQR/LQE,
                         active-set QP, condensed MPC, closed-loop simulate
                         (reference: src/{ode,cstr,matrices,dare,dlqr,dlqe,
                          quadprog,mpc,ctr}.c)
  hectr_tpu.ckks      -- leveled RNS-CKKS: negacyclic NTT, encode/decode,
                         keygen, enc/dec, add/sub/neg, ct-pt & ct-ct mult,
                         rescale, mod-down, key switching, slot rotation,
                         plaintext-matrix x ciphertext-vector (he_gemv)
                         (reference: the GPQHE submodule's he_* API,
                          reconstructed from HECTR call sites)
  hectr_tpu.hempc     -- the encrypted MPC regulator + closed loop
                         (reference: src/hempc.c, src/ctr.c:hectr_simulate)
  hectr_tpu.parallel  -- device-mesh sharding of RNS limbs / coefficients /
                         ciphertext batches (no reference equivalent; the
                         reference is single-threaded C)
  hectr_tpu.ops       -- Pallas TPU kernels for the modular hot loops
  hectr_tpu.utils     -- profiling (libpmu-equivalent), trajectory IO

Importing this package enables JAX x64 mode: the control math requires
float64 to hit the reference's 1e-10 closed-loop accuracy bar.
"""

from hectr_tpu import config as _config  # noqa: F401  (applies jax x64)

__version__ = "0.1.0"
