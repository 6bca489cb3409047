"""Device-mesh parallelism for the CKKS compute path.

The reference is a single-threaded, single-process C program (SURVEY.md
§2.6); parallelism is a new first-class capability of the TPU rebuild.
The parallel axes of the CKKS math map onto a `jax.sharding.Mesh`:

  "limb"  -- RNS limbs (the tensor-parallel analogue): NTTs, pointwise
             products, additions and automorphisms are independent per
             limb; rescale / key-switch base-extension broadcast one
             limb's coefficients to the others (XLA inserts the
             all-gather over ICI).
  "batch" -- independent ciphertexts / control loops (the data-parallel
             analogue): vmapped and sharded on a leading axis.

This module provides mesh construction plus sharding helpers that put
ciphertext arrays [(B,) 2, L, N] on a mesh with those axes.  The
entire jitted computation is then GSPMD-partitioned; no communication
code appears here because the collectives are derived by XLA from the
sharding annotations (the TPU-first design: annotate, don't hand-wire).

A shard_map NTT with explicit ppermute stages for coefficient-axis
("coeff") sharding of very large rings is the planned optimisation for
multi-host scale-out (SURVEY.md §7 Phase 5).
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(batch: int = 1, limb: int = 1, devices=None) -> Mesh:
    """A (batch, limb) mesh over the available devices."""
    devices = np.array(jax.devices() if devices is None else devices)
    assert devices.size >= batch * limb, (devices.size, batch, limb)
    return Mesh(devices[: batch * limb].reshape(batch, limb),
                ("batch", "limb"))


def ct_sharding(mesh: Mesh, batched: bool = False) -> NamedSharding:
    """Sharding for ciphertext data [2, L, N] (or [B, 2, L, N])."""
    if batched:
        return NamedSharding(mesh, P("batch", None, "limb", None))
    return NamedSharding(mesh, P(None, "limb", None))


def pt_sharding(mesh: Mesh, batched: bool = False) -> NamedSharding:
    """Sharding for plaintext/poly data [L, N] (or [B, L, N])."""
    if batched:
        return NamedSharding(mesh, P("batch", "limb", None))
    return NamedSharding(mesh, P("limb", None))


def key_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for switching keys [K, 2, K+S, N]: shard the extended
    limb axis, replicate digits."""
    return NamedSharding(mesh, P(None, None, "limb", None))


def shard_ciphertext(ct, mesh: Mesh, batched: bool = False):
    """Place a Ciphertext's data on the mesh (scale metadata is static)."""
    import dataclasses

    return dataclasses.replace(
        ct, data=jax.device_put(ct.data, ct_sharding(mesh, batched)))
