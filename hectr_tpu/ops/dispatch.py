"""Runtime dispatch between the fused Pallas kernels and the XLA path.

Policy: Pallas on TPU-class backends for supported ring sizes; the
portable XLA path everywhere else (CPU tests, tiny rings, shard_map
bodies that need collective-friendly tracing).  Override with
HECTR_PALLAS=0/1.
"""

from __future__ import annotations

import functools
import os


@functools.lru_cache(maxsize=1)
def _backend_is_tpu() -> bool:
    import jax

    try:
        platform = jax.devices()[0].platform
    except Exception:  # backend init failure -> portable path
        return False
    return platform not in ("cpu", "gpu")


def use_pallas(n: int) -> bool:
    """Whether the fused Pallas NTT kernels should run for ring size n."""
    from hectr_tpu.ops.ntt_pallas import pallas_supported

    env = os.environ.get("HECTR_PALLAS")
    if env == "0":
        return False
    if not pallas_supported(n):
        return False
    if env == "1":
        return True
    return _backend_is_tpu()
