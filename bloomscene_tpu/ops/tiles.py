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

import jax
import jax.numpy as jnp
from jax import lax

from .projection import ProjectedSplats


class TileBins(NamedTuple):
    entries: jnp.ndarray        # [num_tiles, tile_capacity] int32 gaussian ids
    entry_mask: jnp.ndarray     # [num_tiles, tile_capacity] bool
    num_pairs: jnp.ndarray      # [] int32 total (untruncated) pair count
    pair_overflow: jnp.ndarray  # [] int32 pairs dropped by pair_capacity
    tile_overflow: jnp.ndarray  # [] int32 entries dropped by tile_capacity
    gauss_sorted: jnp.ndarray   # [pair_capacity] int32 tile-then-depth order
    tile_sorted: jnp.ndarray    # [pair_capacity] int32 tile id per pair
    t_start: jnp.ndarray        # [num_tiles] int32 range starts into above
    counts: jnp.ndarray         # [num_tiles] int32 clamped to tile_capacity


def tile_grid(W: int, H: int, tile: int) -> tuple[int, int]:
    return (-(-W // tile), -(-H // tile))


def pltpu_bitcast_f32_to_i32(x: jnp.ndarray) -> jnp.ndarray:
    """f32 -> raw bits; order-preserving for positive floats (the CUDA
    binning packs depth float bits into its sort key the same way,
    rasterizer_impl.cu:70-111)."""
    return lax.bitcast_convert_type(x, jnp.int32)


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
            tile_overflow=jnp.int32(0),
            gauss_sorted=jnp.zeros((pair_capacity,), jnp.int32),
            tile_sorted=jnp.full((pair_capacity,), num_tiles, jnp.int32),
            t_start=jnp.zeros((num_tiles,), jnp.int32),
            counts=jnp.zeros((num_tiles,), jnp.int32))

    x0, y0, x1, _y1, touched = compute_tile_rects(proj, W, H, tile)
    # f32 scans: integer scans are slow on the TPU VPU, and every quantity
    # here fits exactly in f32 (counts < 2^24)
    offsets = jnp.cumsum(touched.astype(jnp.float32)).astype(jnp.int32)
    total = offsets[-1]
    starts = offsets - touched                         # exclusive cumsum

    # pair slot k -> owning gaussian. Equivalent to
    # searchsorted(offsets, k, 'right') but O(P) scatter + cummax instead of
    # P binary searches (searchsorted was ~100ms at 800K pairs on TPU):
    # drop a marker (gauss_id + 1) at each gaussian's start slot and take
    # the running max; slots before the first marker clamp to gaussian 0.
    gid = jnp.arange(n, dtype=jnp.int32)
    markers = jnp.zeros((pair_capacity,), jnp.float32).at[
        jnp.where(touched > 0, starts, pair_capacity)].max(
        (gid + 1).astype(jnp.float32), mode='drop')
    gauss_c = jnp.maximum(
        jax.lax.cummax(markers).astype(jnp.int32) - 1, 0)

    # one packed gather for all per-gaussian pair data (5 separate row
    # gathers cost ~4x more than one 5-column gather at this size)
    width = jnp.maximum(x1 - x0, 1)
    packed = jnp.stack(
        [starts, x0, y0, width,
         pltpu_bitcast_f32_to_i32(proj.depth)], -1)     # [n, 5] int32
    pg = packed[gauss_c]                                # [P_cap, 5]

    k = jnp.arange(pair_capacity, dtype=jnp.int32)
    local = k - pg[:, 0]
    w = pg[:, 3]
    # local // width via exact float-reciprocal trick (integer div lowers
    # to a slow VPU loop): local <= ~2^13, width <= 2^7 => f32 exact with a
    # 2^-10 nudge (error < 2^-9 < min fraction 1/width)
    q = jnp.floor(local.astype(jnp.float32)
                  * (1.0 / w.astype(jnp.float32))
                  + 0.0009765625).astype(jnp.int32)
    tx = pg[:, 1] + (local - q * w)
    ty = pg[:, 2] + q
    pair_valid = k < total
    tile_id = jnp.where(pair_valid, ty * gx + tx, num_tiles).astype(jnp.int32)
    # sort by (tile, depth): depth compared via its f32 bit pattern, which
    # is order-preserving for the positive depths that survive culling
    depth_bits = jnp.where(pair_valid, pg[:, 4], jnp.int32(0x7F800000))

    # stable two-key sort: (tile, depth); ties keep pair order (gaussian id).
    tile_s, _depth_s, gauss_s = lax.sort(
        (tile_id, depth_bits, gauss_c), num_keys=2, is_stable=True)

    # tile ranges: 1K binary searches over the sorted pair list (cheap;
    # the scatter-min formulation serializes on collisions and costs 3x)
    tids = jnp.arange(num_tiles, dtype=jnp.int32)
    t_start = jnp.searchsorted(tile_s, tids, side='left').astype(jnp.int32)
    t_end = jnp.searchsorted(tile_s, tids, side='right').astype(jnp.int32)

    # fixed-capacity per-tile lists: tile ranges are CONTIGUOUS in the
    # sorted pair list, so use vmapped dynamic slices (a 1M-element random
    # gather costs 3x more than the strided slice reads)
    gpad = jnp.concatenate(
        [gauss_s, jnp.zeros((tile_capacity,), jnp.int32)])
    sliced = jax.vmap(
        lambda s: lax.dynamic_slice(gpad, (s,), (tile_capacity,)))(
        jnp.minimum(t_start, pair_capacity))
    c = jnp.arange(tile_capacity, dtype=jnp.int32)
    entry_mask = (t_start[:, None] + c[None, :]) < t_end[:, None]
    entries = jnp.where(entry_mask, sliced, 0).astype(jnp.int32)

    counts = t_end - t_start
    tile_overflow = jnp.sum(jnp.maximum(counts - tile_capacity, 0))
    pair_overflow = jnp.maximum(total - pair_capacity, 0)
    return TileBins(entries=entries, entry_mask=entry_mask,
                    num_pairs=total.astype(jnp.int32),
                    pair_overflow=pair_overflow.astype(jnp.int32),
                    tile_overflow=tile_overflow.astype(jnp.int32),
                    gauss_sorted=gauss_s,
                    tile_sorted=tile_s,
                    t_start=t_start,
                    counts=jnp.minimum(counts, tile_capacity))
