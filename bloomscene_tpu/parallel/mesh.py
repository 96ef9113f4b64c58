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

Multi-host: ``init_distributed`` brings up the jax.distributed runtime
(one process per host), ``make_host_mesh`` lays hosts on the OUTER mesh
axis so that data-parallel gradient all-reduces ride DCN (infrequent,
latency-tolerant) while the tile axis stays within a host's chips on ICI
(the per-step all-gathers of splat data are latency-sensitive). Validated
by tests/test_multihost.py: 2 real processes x 4 virtual CPU devices
running the same DP and tile-parallel train steps as single-process.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Bring up the multi-host runtime (idempotent).

    On TPU pods with standard env (TPU_WORKER_HOSTNAMES etc.) all args
    auto-detect; for CPU multi-process tests pass them explicitly. The
    reference has no distributed path at all (SURVEY.md section 2.5).
    """
    if num_processes is not None and num_processes <= 1:
        return                       # single-process run: nothing to do
    # do NOT query jax.devices()/process_count() here: that would
    # initialize the XLA backend and make initialize() illegal
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except RuntimeError as e:        # idempotent re-entry
        if 'already' not in str(e):
            raise


def make_host_mesh(data: int | None = None) -> Mesh:
    """('data', 'tile') mesh over ALL hosts' devices, process-major.

    Devices are ordered by (process_index, id) and reshaped so the
    ``data`` axis splits across processes first: with data == process
    count each host owns one data-parallel replica and its chips form the
    tile axis (tile collectives on ICI, grad psum on DCN).
    """
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    n = len(devs)
    if data is None:
        data = max(jax.process_count(), 1)
    tile = n // data
    assert data * tile == n, (data, tile, n)
    arr = np.array(devs).reshape(data, tile)
    return Mesh(arr, ('data', 'tile'))


def make_global_array(host_value, mesh: Mesh, spec: P):
    """Build a GLOBAL array from an identical host-local value on every
    process (multi-process safe; plain device_put cannot span hosts)."""
    import jax.numpy as jnp
    val = np.asarray(host_value)
    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(
        val.shape, sharding, lambda idx: val[idx])


def make_global_tree(tree, mesh: Mesh, spec: P):
    """make_global_array over a pytree (same spec for every leaf)."""
    return jax.tree.map(lambda x: make_global_array(x, mesh, spec), tree)


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
