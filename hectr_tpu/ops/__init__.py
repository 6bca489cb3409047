"""Pallas TPU kernels for the CKKS hot ops.

The portable XLA paths live in hectr_tpu.ckks.*; these kernels
implement the same contracts fused into single Pallas launches so each
polynomial transform touches HBM exactly once (read + write) instead of
once per butterfly stage.  Selected at runtime via
hectr_tpu.ops.dispatch (TPU backend + supported shape -> Pallas;
anything else -> XLA path).
"""

from hectr_tpu.ops.ntt_pallas import (  # noqa: F401
    intt_pallas,
    ntt_pallas,
    pallas_supported,
)
from hectr_tpu.ops.dispatch import use_pallas  # noqa: F401
