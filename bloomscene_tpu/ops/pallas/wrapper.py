"""custom_vjp wrapper around the Pallas blend kernels.

Mirrors ops.tile_rasterizer.tile_blend's interface/semantics; used as the
TPU fast path by rasterize_tiles(backend='pallas'). Unified 5-channel
cotangents (r, g, b, depth-value, ones) exactly as the XLA backward.

Load balancing: tiles are processed in OCCUPANCY-SORTED order (descending
splat count). The kernels' per-group splat loop runs to the group max, so
grouping similar-count tiles together removes the wasted iterations that
arbitrary grouping pays on skewed scenes (the CUDA kernel has no such
issue — its blocks are per-tile — but the TPU vector unit wants 128 tiles
per program). The permutation is undone on the pixel outputs; the
gradient path works entirely in permuted "position" space.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..reference_rasterizer import ACC_GATE, ACC_SEED, RenderOutput
from . import blend as pb


def _pt_to_image(x, gx, gy, tile, W, H):
    """[P, T] -> [H, W]. pixel sublane p = ly*tile+lx; tile lane t."""
    P, T = x.shape
    img = x.reshape(tile, tile, gy, gx)          # (ly, lx, ty, tx)
    img = jnp.transpose(img, (2, 0, 3, 1)).reshape(gy * tile, gx * tile)
    return img[:H, :W]


def _image_to_pt(x, gx, gy, tile):
    H, W = x.shape
    xp = jnp.pad(x, ((0, gy * tile - H), (0, gx * tile - W)))
    xp = xp.reshape(gy, tile, gx, tile)          # (ty, ly, tx, lx)
    return jnp.transpose(xp, (1, 3, 0, 2)).reshape(tile * tile, gy * gx)


def _occupancy_perm(counts):
    """perm: position -> tile id, descending count; pos: tile id -> position."""
    T = counts.shape[0]
    iota = jnp.arange(T, dtype=jnp.int32)
    _, perm = lax.sort((-counts, iota), num_keys=1, is_stable=True)
    pos = jnp.zeros((T,), jnp.int32).at[perm].set(iota)
    return perm, pos


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4, 5))
def tile_blend_pallas(tile, gx, gy, W, H, cap, mean2d, conic, depth, color,
                      opac, bg, gauss_sorted, tile_sorted, t_start, counts):
    out, _ = _fwd_impl(tile, gx, gy, W, H, cap, mean2d, conic, depth, color,
                       opac, bg, gauss_sorted, tile_sorted, t_start, counts)
    return out


def _fwd_impl(tile, gx, gy, W, H, cap, mean2d, conic, depth, color, opac,
              bg, gauss_sorted, tile_sorted, t_start, counts):
    perm, pos = _occupancy_perm(counts)
    counts_p = counts[perm]
    data = pb.pack_splat_data_sorted(mean2d, conic, depth, color, opac,
                                     gauss_sorted, t_start[perm], cap)
    r, g, b, D, acc, Tf, ncon = pb.blend_forward_pallas(
        data, counts_p, tile, gx, gy, tid=perm)
    # outputs are in position space; column for tile t is pos[t]
    to_img = lambda x: _pt_to_image(x[:, pos], gx, gy, tile, W, H)
    color_img = jnp.stack([to_img(r), to_img(g), to_img(b)], -1) \
        + to_img(Tf)[..., None] * bg
    acc_img = to_img(acc)
    depth_img = jnp.where(acc_img > ACC_GATE, to_img(D) / acc_img, 0.0)
    out = RenderOutput(color=color_img, depth=depth_img,
                       alpha=acc_img - ACC_SEED, final_T=to_img(Tf))
    return out, (data, counts_p, perm, pos, Tf, acc, D, ncon)


def _fwd(tile, gx, gy, W, H, cap, mean2d, conic, depth, color, opac, bg,
         gauss_sorted, tile_sorted, t_start, counts):
    out, res = _fwd_impl(tile, gx, gy, W, H, cap, mean2d, conic, depth,
                         color, opac, bg, gauss_sorted, tile_sorted,
                         t_start, counts)
    return out, (res, bg, gauss_sorted, tile_sorted, t_start,
                 mean2d.shape[0])


def _bwd(tile, gx, gy, W, H, cap, saved, gout: RenderOutput):
    ((data, counts_p, perm, pos, Tf, acc, D, ncon), bg, gauss_sorted,
     tile_sorted, t_start, n) = saved
    # cotangent images -> permuted position space (match fwd residuals);
    # batched: one tiling transpose + ONE lane-permutation gather for all
    # six cotangent planes instead of six
    H_, W_img = gout.depth.shape
    planes = jnp.stack([gout.color[..., 0], gout.color[..., 1],
                        gout.color[..., 2], gout.depth, gout.alpha,
                        gout.final_T], 0)              # [6, H, W]
    pad = ((0, 0), (0, gy * tile - H_), (0, gx * tile - W_img))
    pp = jnp.pad(planes, pad).reshape(6, gy, tile, gx, tile)
    pp = jnp.transpose(pp, (0, 2, 4, 1, 3)).reshape(
        6, tile * tile, gy * gx)[:, :, perm]           # [6, P, T_pos]
    g_r, g_g, g_b, g_depth, g_alpha, g_finalT = (
        pp[0], pp[1], pp[2], pp[3], pp[4], pp[5])

    gate = acc > ACC_GATE
    u_d = jnp.where(gate, g_depth / acc, 0.0)
    u_one = jnp.where(gate, -g_depth * D / (acc * acc), 0.0) + g_alpha
    bg_dot = bg[0] * g_r + bg[1] * g_g + bg[2] * g_b
    bg_term = bg_dot + g_finalT

    grad = pb.blend_backward_pallas(
        data, counts_p, tile, gx, gy, Tf, ncon, g_r, g_g, g_b, u_d, u_one,
        bg_term, tid=perm)                      # [cap, GRAD_W, T_pos]

    # reduce per-entry grads to per-gaussian in two moves:
    # 1. [cap, W, T] -> sorted-pair-compact [n_pairs, W] with ONE window
    #    scatter-add: each tile's [cap, W] slab lands at its t_start (tile
    #    ranges are contiguous in the sorted pair list; slots beyond the
    #    tile count are zeroed, so the overlap into the next tile's range
    #    adds zeros). 1024 big windows beat 524K random row gathers ~4x
    #    on TPU (gathers/scatters are row-latency-bound).
    # 2. one segment-sum over the pair list keyed by gaussian id.
    n_pairs = gauss_sorted.shape[0]
    # no masking needed: the kernel writes EXACT zeros for every entry a
    # tile doesn't own (blended=false zeroes all channels), so the window
    # overlap into the next tile's range adds zeros by construction.
    # LAYOUT: the scatter runs in FLAT 1D pair-major space — a [T, cap, W]
    # update tensor would pad its 16-wide minor dim to 128 lanes (470MB of
    # hidden HBM traffic at bench size); [T, cap*W] and a 1D operand are
    # tight.
    W_ = pb.GRAD_W
    updates = jnp.transpose(grad, (2, 0, 1)).reshape(
        grad.shape[2], cap * W_)                # [T_pos, cap*W] (tight)
    starts_p = jnp.minimum(t_start[perm], n_pairs) * W_
    dnums = lax.ScatterDimensionNumbers(
        update_window_dims=(1,), inserted_window_dims=(),
        scatter_dims_to_operand_dims=(0,))
    buf = lax.scatter_add(
        jnp.zeros(((n_pairs + cap) * W_,), jnp.float32),
        starts_p[:, None], updates, dnums)
    pair_grad = buf.reshape(n_pairs + cap, W_)[:n_pairs, :10]
    pair_ok = tile_sorted < Tf.shape[1]
    seg = jnp.where(pair_ok, gauss_sorted, n)
    sums = jax.ops.segment_sum(pair_grad, seg, n + 1)[:n]   # [n, 10]
    d_mean2d = sums[:, 0:2]
    d_conic = sums[:, 2:5]
    d_opac = sums[:, 5]
    d_depth = sums[:, 6]
    d_color = sums[:, 7:10]

    d_bg = jnp.stack([jnp.sum(Tf * g_r), jnp.sum(Tf * g_g),
                      jnp.sum(Tf * g_b)])

    zero = lambda shape: np.zeros(shape, dtype=jax.dtypes.float0)
    return (d_mean2d, d_conic, d_depth, d_color, d_opac, d_bg,
            zero((n_pairs,)), zero((n_pairs,)), zero(counts_p.shape),
            zero(counts_p.shape))


tile_blend_pallas.defvjp(_fwd, _bwd)
