"""Tile binning for the TPU rasterizer — static shapes, no atomics.

Replaces the CUDA pipeline duplicateWithKeys -> cub radix sort ->
identifyTileRanges (reference submodules/depth-diff-gaussian-rasterization/
cuda_rasterizer/rasterizer_impl.cu:70-138, 278-338) with an XLA-friendly
formulation:

1. Per-Gaussian tile rectangle (same rounding as getRect, auxiliary.h:46-56).
2. Pair expansion into a *static-capacity* pair buffer: pair slot k maps to
   (gaussian, local tile) via a searchsorted over the exclusive cumsum of
   tiles_touched — no dynamic allocation, no scatter.
3. Stable lexicographic sort by (tile_id, depth) via jax.lax.sort with two
   keys — exactly the CUDA 64-bit key order (tile<<32 | float_bits(depth)),
   including the tie-break by original pair order (both sorts are stable and
   pairs are emitted in Gaussian-id order).
4. Tile ranges via searchsorted, then a fixed-capacity per-tile gather.

Overflow policy: pairs beyond ``pair_capacity`` and per-tile entries beyond
``tile_capacity`` are dropped back-to-front in depth order is NOT guaranteed
for pair overflow (it truncates by Gaussian id), so capacities must be sized
generously; both overflow counts are returned for diagnostics.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax import lax

from .projection import ProjectedSplats


class TileBins(NamedTuple):
    entries: jnp.ndarray        # [num_tiles, tile_capacity] int32 gaussian ids
    entry_mask: jnp.ndarray     # [num_tiles, tile_capacity] bool
    num_pairs: jnp.ndarray      # [] int32 total (untruncated) pair count
    pair_overflow: jnp.ndarray  # [] int32 pairs dropped by pair_capacity
    tile_overflow: jnp.ndarray  # [] int32 entries dropped by tile_capacity


def tile_grid(W: int, H: int, tile: int) -> tuple[int, int]:
    return (-(-W // tile), -(-H // tile))


def compute_tile_rects(proj: ProjectedSplats, W: int, H: int, tile: int):
    """Per-Gaussian clamped tile rectangle [x0,x1)x[y0,y1) + touched count."""
    gx, gy = tile_grid(W, H, tile)
    r = proj.radius.astype(jnp.float32)
    x, y = proj.mean2d[:, 0], proj.mean2d[:, 1]
    # (int) cast in CUDA truncates toward zero, but values are clamped to
    # [0, grid] afterwards, so floor vs trunc only differs for negatives that
    # clamp to 0 anyway.
    x0 = jnp.clip(jnp.floor((x - r) / tile), 0, gx).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor((y - r) / tile), 0, gy).astype(jnp.int32)
    x1 = jnp.clip(jnp.floor((x + r + tile - 1) / tile), 0, gx).astype(jnp.int32)
    y1 = jnp.clip(jnp.floor((y + r + tile - 1) / tile), 0, gy).astype(jnp.int32)
    touched = jnp.where(proj.valid, (x1 - x0) * (y1 - y0), 0)
    return x0, y0, x1, y1, touched


def bin_splats(proj: ProjectedSplats, W: int, H: int, tile: int,
               pair_capacity: int, tile_capacity: int) -> TileBins:
    """Build per-tile depth-sorted splat lists (static shapes throughout)."""
    gx, gy = tile_grid(W, H, tile)
    num_tiles = gx * gy
    n = proj.mean2d.shape[0]
    if n == 0:
        return TileBins(
            entries=jnp.zeros((num_tiles, tile_capacity), jnp.int32),
            entry_mask=jnp.zeros((num_tiles, tile_capacity), bool),
            num_pairs=jnp.int32(0), pair_overflow=jnp.int32(0),
            tile_overflow=jnp.int32(0))

    x0, y0, x1, _y1, touched = compute_tile_rects(proj, W, H, tile)
    offsets = jnp.cumsum(touched)                      # inclusive
    total = offsets[-1] if n > 0 else jnp.int32(0)
    starts = offsets - touched                         # exclusive cumsum

    # pair slot k -> owning gaussian: first index with inclusive-cumsum > k
    k = jnp.arange(pair_capacity, dtype=jnp.int32)
    gauss = jnp.searchsorted(offsets, k, side='right').astype(jnp.int32)
    gauss_c = jnp.minimum(gauss, max(n - 1, 0))
    local = k - starts[gauss_c]
    width = jnp.maximum(x1[gauss_c] - x0[gauss_c], 1)
    tx = x0[gauss_c] + local % width
    ty = y0[gauss_c] + local // width
    pair_valid = k < total
    tile_id = jnp.where(pair_valid, ty * gx + tx, num_tiles).astype(jnp.int32)
    depth = jnp.where(pair_valid, proj.depth[gauss_c], jnp.inf)

    # stable two-key sort: (tile, depth); ties keep pair order (gaussian id).
    tile_s, _depth_s, gauss_s = lax.sort(
        (tile_id, depth.astype(jnp.float32), gauss_c), num_keys=2,
        is_stable=True)

    # tile ranges in the sorted pair list
    tids = jnp.arange(num_tiles, dtype=jnp.int32)
    t_start = jnp.searchsorted(tile_s, tids, side='left').astype(jnp.int32)
    t_end = jnp.searchsorted(tile_s, tids, side='right').astype(jnp.int32)

    # fixed-capacity gather per tile
    c = jnp.arange(tile_capacity, dtype=jnp.int32)
    idx = t_start[:, None] + c[None, :]                 # [num_tiles, cap]
    entry_mask = idx < t_end[:, None]
    idx_c = jnp.minimum(idx, pair_capacity - 1)
    entries = jnp.where(entry_mask, gauss_s[idx_c], 0).astype(jnp.int32)

    counts = t_end - t_start
    tile_overflow = jnp.sum(jnp.maximum(counts - tile_capacity, 0))
    pair_overflow = jnp.maximum(total - pair_capacity, 0)
    return TileBins(entries=entries, entry_mask=entry_mask,
                    num_pairs=total.astype(jnp.int32),
                    pair_overflow=pair_overflow.astype(jnp.int32),
                    tile_overflow=tile_overflow.astype(jnp.int32))
