"""Test harness configuration.

Tests run on the CPU backend with 8 virtual devices so multi-chip
sharding paths compile and execute without TPU hardware (SURVEY.md §4).
Must run before jax is imported anywhere.
"""

import os

# Force CPU: the session environment presets JAX_PLATFORMS=axon (the
# real-TPU tunnel); unit tests run on the virtual-device CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# The fast gate is compile-bound on small hosts; the persistent
# compilation cache (safe on the CPU backend -- see hectr_tpu/config.py)
# makes re-runs start warm.  Opt out with HECTR_JAX_CACHE=0.
os.environ.setdefault("HECTR_JAX_CACHE", "1")

import pathlib

import jax
import numpy as np
import pytest

# The session sitecustomize registers the axon (TPU tunnel) PJRT plugin
# and forces jax_platforms="axon,cpu" via jax.config, which overrides
# the env var -- counter-override before any backend initialises.
jax.config.update("jax_platforms", "cpu")

GOLDEN_DIR = pathlib.Path(__file__).parent / "golden"


@pytest.fixture(scope="session")
def golden_dir() -> pathlib.Path:
    return GOLDEN_DIR


def load_golden_txt(name: str) -> np.ndarray:
    """Load a whitespace-separated golden .txt (reference tests write
    them via fprintf, e.g. tests/hectr.c:617-620)."""
    return np.loadtxt(GOLDEN_DIR / name)


def load_golden_traj_bin(name: str, nx: int = 3, nu: int = 2) -> np.ndarray:
    """Load a golden .bin trajectory: records of (uint32 k, nx doubles x,
    nu doubles u) (writer: reference tests/hectr.c:751-757).  Returns
    [steps, nx+nu] float64 (k column dropped)."""
    raw = (GOLDEN_DIR / name).read_bytes()
    rec = 4 + 8 * (nx + nu)
    assert len(raw) % rec == 0, (len(raw), rec)
    out = []
    for off in range(0, len(raw), rec):
        vals = np.frombuffer(raw, dtype="<f8", count=nx + nu, offset=off + 4)
        out.append(vals)
    return np.array(out)
