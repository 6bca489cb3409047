"""TPU-native leveled RNS-CKKS homomorphic encryption.

A from-scratch rebuild of the capabilities of the GPQHE submodule the
reference links against (API reconstructed from HECTR call sites --
SURVEY.md §2.3).  Where GPQHE is C + libgcrypt bignums (polynomials as
`poly_mpi_t` big-integer coefficient vectors mod q = 2^109), this
library is residue-number-system (RNS) native: a polynomial is a
`uint32[L, N]` array of residues against a chain of < 2^30 NTT-friendly
primes, every operation is a vectorized JAX computation over the limb
and coefficient axes, and those two axes are exactly the ones that
shard across a TPU mesh (hectr_tpu.parallel).

Layers (bottom-up):
  primes    -- prime-chain / root-of-unity generation (host, exact ints)
  modmath   -- vectorized Barrett/Shoup modular arithmetic (jittable)
  ntt       -- negacyclic NTT/iNTT over [L, N] residue arrays
  encoding  -- CKKS canonical-embedding encode/decode (slots <= N/2)
  context   -- parameter presets -> derived constant tables
  scheme    -- keygen, encrypt/decrypt, add/sub/neg, mult, rescale,
               mod-down (mirrors the observable he_* API of GPQHE)
  keyswitch -- digit-decomposition key switching, Galois rotations
  gemv      -- plaintext-matrix x ciphertext-vector products (he_gemv)
"""
