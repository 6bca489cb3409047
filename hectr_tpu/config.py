"""Global configuration and named parameter presets.

The reference configures everything at compile time (src/config.h,
constants in src/hectr.h:39-41, CKKS parameters hardcoded at
src/ctr.c:514-517, plant constants at src/cstr.c:26-38).  Here the same
knobs are runtime dataclasses with the reference values as named
presets, plus a real CLI (hectr_tpu.cli) that actually parses the
--logn/--logq style flags the reference only advertised
(tests/hectr.c:936-938 parses nothing).
"""

from __future__ import annotations

import dataclasses

import jax

# float64 is required for the control stack: DARE convergence to 1e-10
# and the closed-loop parity bar of ~1e-10 vs the reference trajectories
# (reference uses C doubles throughout).  On TPU f64 is emulated (slow)
# but the control math is tiny; the CKKS compute path is uint32 and
# unaffected.
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache -- OPT-IN via HECTR_JAX_CACHE=1.
# On the CPU backend it works and helps; on the remote-TPU (axon)
# plugin, serialising executables that embed multi-MB twiddle-table
# literals hangs indefinitely (observed: a ct-ct mult graph that
# compiles in ~90s with the cache disabled never finished with it on).
import os as _os
import pathlib as _pathlib

if _os.environ.get("HECTR_JAX_CACHE") == "1":
    _cache_dir = _pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"
    jax.config.update("jax_compilation_cache_dir", str(_cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

# Algorithm constants (reference: src/hectr.h:39-41).
TOLERANCE = 1e-10   # DARE / QP convergence tolerance  (HECTR_TOLERANCE)
SMALL = 1e-5        # noise weights, imag-residue canary (HECTR_SMALL)
ITER_MAX = 10000    # DARE / QP iteration cap           (HECTR_ITER_MAX)

# Single-precision epsilon: the reference's active-set QP uses
# FLT_EPSILON for feasibility / working-set thresholds (src/quadprog.c).
FLT_EPSILON = 1.1920928955078125e-07


@dataclasses.dataclass(frozen=True)
class CKKSPreset:
    """Named CKKS parameter preset (see ckks.params.CKKSParams for the
    full derived context)."""

    name: str
    logn: int               # ring degree N = 2**logn
    slots: int              # packed complex slots (<= N/2)
    scale_bits: int         # log2(Delta)
    limb_bits: int          # target RNS prime size (< 31 for uint32 path)
    mult_depth: int         # supported ct levels (in *rescale groups*)
    special_limbs: int = 1  # key-switch special primes (ns)
    digit_width: int = 1    # key-switch digit group width in limbs
                            # (hybrid 'dnum grouping'; the key-switch
                            # inner product has ceil(L/digit_width)
                            # terms; noise needs the special-prime
                            # product to dominate every group product)


# The reference encrypted-MPC parameters: logn=12, q=2^109, Delta=2^50,
# slots=16 (src/ctr.c:511-518).  Our RNS equivalent uses a chain of
# ~25-bit primes with composite (two-prime) rescaling so Delta=2^50
# survives the 32-bit arithmetic path.
REFERENCE_HEMPC = CKKSPreset(
    name="reference-hempc", logn=12, slots=16, scale_bits=50,
    limb_bits=25, mult_depth=1,
)

# BASELINE.json config #3: enc/dec + ct-ct mult/rescale at logN=14, L=10.
# Two special primes + width-2 digit grouping halve the key-switch
# inner-product term count vs the classic per-limb decomposition.
# Full packing (slots = N/2) via the FFT encode path
# (hectr_tpu.ckks.encoding).
MEDIUM = CKKSPreset(
    name="medium", logn=14, slots=8192, scale_bits=50,
    limb_bits=25, mult_depth=5, special_limbs=2, digit_width=2,
)

# Security-hardened variant of the reference parameters.  The
# reference's own q=2^109 at N=4096 sits exactly at the HE standard's
# 128-bit ceiling (src/ctr.c:514-517); our RNS realization of the
# parity preset needs 140 modulus bits (2x30 base + 50-bit scale pair
# + 30-bit special), which at N=4096 is only ~101-bit estimated -- see
# hectr_tpu.ckks.security.  Same scale/depth at logN=13 clears the
# 218-bit ceiling with a wide margin; use this for deployments, and
# REFERENCE_HEMPC only for reference-parity testing.
REFERENCE_HEMPC_SECURE = CKKSPreset(
    name="reference-hempc-secure", logn=13, slots=16, scale_bits=50,
    limb_bits=25, mult_depth=1,
)

# BASELINE.json flagship: encrypted MPC at logN=15, L=20.  The QP
# depth ledger (hempc.qp_enc.pgd_limbs_required, DESIGN.md §2.2): the
# gemv pair leaves k_in=20, so constrained MPC fits with deg-7 clips
# at ONE projected-gradient iteration (18 limbs, exact fit).
FLAGSHIP = CKKSPreset(
    name="flagship", logn=15, slots=16, scale_bits=50,
    limb_bits=25, mult_depth=10, special_limbs=2, digit_width=2,
)

# Constrained-MPC flagship: 5 more rescale levels buy the default
# deg-7 / 2-iteration encrypted QP (k_in=30, ledger 28, exact fit)
# while logQP = 870 stays under the 128-bit ceiling (881 at logN=15).
FLAGSHIP_QP = CKKSPreset(
    name="flagship-qp", logn=15, slots=16, scale_bits=50,
    limb_bits=25, mult_depth=15, special_limbs=2, digit_width=2,
)

PRESETS = {p.name: p for p in (REFERENCE_HEMPC, REFERENCE_HEMPC_SECURE,
                               MEDIUM, FLAGSHIP, FLAGSHIP_QP)}
