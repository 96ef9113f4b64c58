"""custom_vjp wrapper around the Pallas blend kernels.

Mirrors ops.tile_rasterizer.tile_blend's interface/semantics; used as the
TPU fast path by rasterize_tiles(backend='pallas'). Unified 5-channel
cotangents (r, g, b, depth-value, ones) exactly as the XLA backward.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

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


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4, 5))
def tile_blend_pallas(tile, gx, gy, W, H, cap, mean2d, conic, depth, color,
                      opac, bg, gauss_sorted, tile_sorted, t_start, counts):
    out, _ = _fwd_impl(tile, gx, gy, W, H, cap, mean2d, conic, depth, color,
                       opac, bg, gauss_sorted, tile_sorted, t_start, counts)
    return out


def _fwd_impl(tile, gx, gy, W, H, cap, mean2d, conic, depth, color, opac,
              bg, gauss_sorted, tile_sorted, t_start, counts):
    data = pb.pack_splat_data_sorted(mean2d, conic, depth, color, opac,
                                     gauss_sorted, t_start, cap)
    r, g, b, D, acc, Tf, ncon = pb.blend_forward_pallas(
        data, counts, tile, gx, gy)
    to_img = lambda x: _pt_to_image(x, gx, gy, tile, W, H)
    color_img = jnp.stack([to_img(r), to_img(g), to_img(b)], -1) \
        + to_img(Tf)[..., None] * bg
    depth_img = jnp.where(to_img(acc) > ACC_GATE, to_img(D) / to_img(acc),
                          0.0)
    out = RenderOutput(color=color_img, depth=depth_img,
                       alpha=to_img(acc) - ACC_SEED, final_T=to_img(Tf))
    return out, (data, counts, Tf, acc, D, ncon)


def _fwd(tile, gx, gy, W, H, cap, mean2d, conic, depth, color, opac, bg,
         gauss_sorted, tile_sorted, t_start, counts):
    out, res = _fwd_impl(tile, gx, gy, W, H, cap, mean2d, conic, depth,
                         color, opac, bg, gauss_sorted, tile_sorted,
                         t_start, counts)
    return out, (res, bg, gauss_sorted, tile_sorted, t_start,
                 mean2d.shape[0])


def _bwd(tile, gx, gy, W, H, cap, saved, gout: RenderOutput):
    ((data, counts, Tf, acc, D, ncon), bg, gauss_sorted, tile_sorted,
     t_start, n) = saved
    to_pt = lambda x: _image_to_pt(x, gx, gy, tile)

    g_r = to_pt(gout.color[..., 0])
    g_g = to_pt(gout.color[..., 1])
    g_b = to_pt(gout.color[..., 2])
    g_depth = to_pt(gout.depth)
    g_alpha = to_pt(gout.alpha)
    g_finalT = to_pt(gout.final_T)

    gate = acc > ACC_GATE
    u_d = jnp.where(gate, g_depth / acc, 0.0)
    u_one = jnp.where(gate, -g_depth * D / (acc * acc), 0.0) + g_alpha
    bg_dot = bg[0] * g_r + bg[1] * g_g + bg[2] * g_b
    bg_term = bg_dot + g_finalT

    grad = pb.blend_backward_pallas(
        data, counts, tile, gx, gy, Tf, ncon, g_r, g_g, g_b, u_d, u_one,
        bg_term)                                # [cap, GRAD_W, T]

    # reduce per-entry grads to per-gaussian: gather each PAIR's grad row
    # (slot, tile) from the [cap, T, W]-flattened tensor, then one
    # segment-sum over the pair list (half the rows of an entries-shaped
    # scatter-add, and gathers beat scatters on TPU)
    num_tiles = Tf.shape[1]
    gT = jnp.transpose(grad, (0, 2, 1)).reshape(-1, pb.GRAD_W)
    n_pairs = gauss_sorted.shape[0]
    k = jnp.arange(n_pairs, dtype=jnp.int32)
    tile_k = jnp.minimum(tile_sorted, num_tiles - 1)
    slot_k = k - t_start[tile_k]
    pair_ok = (tile_sorted < num_tiles) & (slot_k >= 0) & (slot_k < cap)
    rows = jnp.clip(slot_k, 0, cap - 1) * num_tiles + tile_k
    pair_grad = jnp.where(pair_ok[:, None], gT[rows], 0.0)
    seg = jnp.where(pair_ok, gauss_sorted, n)
    sums = jax.ops.segment_sum(pair_grad, seg, n + 1)[:n]   # [n, GRAD_W]
    d_mean2d = sums[:, 0:2]
    d_conic = sums[:, 2:5]
    d_opac = sums[:, 5]
    d_depth = sums[:, 6]
    d_color = sums[:, 7:10]

    d_bg = jnp.stack([jnp.sum(Tf * g_r), jnp.sum(Tf * g_g),
                      jnp.sum(Tf * g_b)])

    zero = lambda shape: np.zeros(shape, dtype=jax.dtypes.float0)
    return (d_mean2d, d_conic, d_depth, d_color, d_opac, d_bg,
            zero((n_pairs,)), zero((n_pairs,)), zero(counts.shape),
            zero(counts.shape))


tile_blend_pallas.defvjp(_fwd, _bwd)
