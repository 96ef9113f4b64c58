"""Mesh construction and sharding policy.

The reference is strictly single-GPU (SURVEY.md section 2.5); parallelism is
a new first-class design here:

- ``data`` axis: data parallelism over cameras — each device renders a
  different view of the (replicated) scene; parameter gradients are
  all-reduced by XLA (pjit inserts the psum from the sharding annotations).
- ``tile`` axis: the sequence-parallel analog for splatting — the image's
  tile grid (leading axis of every per-tile array in the blend) is sharded,
  so each device blends its strip of tiles; the splat gather that feeds a
  tile rides an all-gather over ICI that XLA inserts from the constraint.

Single-process multi-device only (one TPU slice); multi-host extends this
by constructing the same mesh over jax.distributed-initialized devices.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None,
              data: int | None = None) -> Mesh:
    """Mesh over available devices with ('data', 'tile') axes.

    ``data`` defaults to 2 when the device count is even and > 1 else 1;
    the rest go to ``tile``.
    """
    devs = jax.devices()
    n = n_devices or len(devs)
    devs = devs[:n]
    if data is None:
        data = 2 if (n % 2 == 0 and n > 1) else 1
    tile = n // data
    assert data * tile == n, (data, tile, n)
    arr = np.array(devs).reshape(data, tile)
    return Mesh(arr, ('data', 'tile'))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh) -> NamedSharding:
    """Leading axis over the data axis (camera batches)."""
    return NamedSharding(mesh, P('data'))


def tile_sharded(mesh: Mesh) -> NamedSharding:
    """Leading axis over the tile axis (per-tile blend arrays)."""
    return NamedSharding(mesh, P('tile'))


def shard_batch(batch, mesh: Mesh):
    """Put a pytree of [B, ...] arrays onto the data axis."""
    return jax.device_put(batch, data_sharded(mesh))
