"""Production tile rasterizer: XLA scan blend with a hand-written VJP.

The TPU replacement for the CUDA ``renderCUDA`` forward/backward pair
(reference .../cuda_rasterizer/forward.cu:338-471, backward.cu:398-586).
Design:

- The image is split into a static tile grid; every tile processes its
  depth-sorted splat list (from ``ops.tiles.bin_splats``) with a
  ``lax.scan`` over the static tile capacity — sequential over splats,
  vectorized over (tiles x pixels) on the VPU. Per-pixel semantics are
  bit-for-bit the golden model's (alpha clamp 0.99, skip < 1/255, sticky
  termination at T < 1e-4, depth/acc accumulators).
- The backward re-walks splats back-to-front (the CUDA recurrence,
  backward.cu:477-585) using only O(pixels) residuals (final_T, acc, D,
  n_contrib), recomputing alphas — no per-step activation storage. Unlike
  the reference CUDA backward it ALSO propagates the depth-output gradient
  (the reference accepts dL_ddepths but drops it, backward.cu:539-554).
- Per-Gaussian gradients are accumulated with a deterministic
  ``segment_sum`` over the tile entry lists instead of atomicAdd.

Colors/depth are treated as a unified 5-channel blend (r, g, b, depth, 1)
so one recurrence serves color, depth, and the alpha-accumulator outputs.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .reference_rasterizer import (ACC_GATE, ACC_SEED, ALPHA_MAX, ALPHA_MIN,
                                   RenderOutput, T_EPS)
from .tiles import TileBins, bin_splats
from .projection import ProjectedSplats


def _on_tpu() -> bool:
    """True when the default device is a TPU (incl. the axon plugin)."""
    try:
        dev = jax.devices()[0]
        return 'tpu' in (dev.platform + str(dev)).lower()
    except Exception:
        return False


def _tile_pixel_coords(gx: int, gy: int, tile: int):
    """Pixel coordinates for every tile: two [num_tiles, tile*tile] arrays."""
    t = np.arange(gx * gy)
    tx0 = (t % gx) * tile
    ty0 = (t // gx) * tile
    lp = np.arange(tile * tile)
    lx = lp % tile
    ly = lp // tile
    px = tx0[:, None] + lx[None, :]
    py = ty0[:, None] + ly[None, :]
    return (jnp.asarray(px, jnp.float32), jnp.asarray(py, jnp.float32))


def _tiles_to_image(x: jnp.ndarray, gx: int, gy: int, tile: int,
                    W: int, H: int) -> jnp.ndarray:
    """[num_tiles, tile*tile, ...] -> [H, W, ...] (crops tile padding)."""
    trail = x.shape[2:]
    img = x.reshape(gy, gx, tile, tile, *trail)
    img = jnp.moveaxis(img, 2, 1).reshape(gy * tile, gx * tile, *trail)
    return img[:H, :W]


def _image_to_tiles(x: jnp.ndarray, gx: int, gy: int, tile: int) -> jnp.ndarray:
    """[H, W, ...] -> [num_tiles, tile*tile, ...] (zero-pads to the grid)."""
    H, W = x.shape[:2]
    trail = x.shape[2:]
    pad = [(0, gy * tile - H), (0, gx * tile - W)] + [(0, 0)] * len(trail)
    xp = jnp.pad(x, pad)
    xp = xp.reshape(gy, tile, gx, tile, *trail)
    xp = jnp.moveaxis(xp, 1, 2).reshape(gy * gx, tile * tile, *trail)
    return xp


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def tile_blend(tile: int, gx: int, gy: int, W: int, H: int,
               mean2d, conic, depth, color, opac, bg, entries, entry_mask):
    out, _ = _blend_fwd_impl(tile, gx, gy, W, H, mean2d, conic, depth,
                             color, opac, bg, entries, entry_mask)
    return out


BLEND_CHUNK = 16


def _chunk_size(cap: int) -> int:
    ch = min(BLEND_CHUNK, cap)
    while cap % ch:
        ch -= 1
    return ch


def _chunk(x, cap):
    """[T, cap, ...] -> [cap//CH, CH, T, ...] scan layout."""
    ch = _chunk_size(cap)
    x = jnp.moveaxis(x, 1, 0)                             # [cap, T, ...]
    return x.reshape((cap // ch, ch) + x.shape[1:]), ch


def _blend_fwd_impl(tile, gx, gy, W, H, mean2d, conic, depth, color, opac,
                    bg, entries, entry_mask):
    num_tiles, cap = entries.shape
    P = tile * tile
    pxg, pyg = _tile_pixel_coords(gx, gy, tile)          # [T, P]

    # pre-gather per-entry splat data: [T, cap, ...]
    m2 = mean2d[entries]          # [T, cap, 2]
    co = conic[entries]           # [T, cap, 3]
    de = depth[entries]           # [T, cap]
    cl = color[entries]           # [T, cap, 3]
    op = opac[entries]            # [T, cap]

    # scan over chunks of splats; the within-chunk recurrence is unrolled so
    # XLA fuses ~CH splat updates per loop iteration (the rolled 1-splat
    # scan was loop-overhead-bound on TPU).
    xs_m2, ch = _chunk(m2, cap)
    xs_co, _ = _chunk(co, cap)
    xs_de, _ = _chunk(de, cap)
    xs_cl, _ = _chunk(cl, cap)
    xs_op, _ = _chunk(op, cap)
    xs_mk, _ = _chunk(entry_mask, cap)
    ks = jnp.arange(cap // ch, dtype=jnp.int32) * ch

    def step(carry, inp):
        T, C, D, acc, done, ncon = carry
        m2k, cok, dek, clk, opk, mk, k0 = inp
        for j in range(ch):
            dx = m2k[j, :, 0:1] - pxg                     # [T, P]
            dy = m2k[j, :, 1:2] - pyg
            power = (-0.5 * (cok[j, :, 0:1] * dx * dx
                             + cok[j, :, 2:3] * dy * dy)
                     - cok[j, :, 1:2] * dx * dy)
            alpha = jnp.minimum(ALPHA_MAX,
                                opk[j, :, None] * jnp.exp(power))
            contrib = (mk[j, :, None] & (power <= 0.0)
                       & (alpha >= ALPHA_MIN) & ~done)
            test_T = T * (1.0 - alpha)
            terminate = contrib & (test_T < T_EPS)
            blend = contrib & ~terminate
            done = done | terminate
            w = jnp.where(blend, alpha * T, 0.0)
            C = C + w[..., None] * clk[j, :, None, :]
            D = D + w * dek[j, :, None]
            acc = acc + w
            T = jnp.where(blend, test_T, T)
            ncon = jnp.where(blend, k0 + j + 1, ncon)
        return (T, C, D, acc, done, ncon), None

    T0 = jnp.ones((num_tiles, P), jnp.float32)
    C0 = jnp.zeros((num_tiles, P, 3), jnp.float32)
    D0 = jnp.zeros((num_tiles, P), jnp.float32)
    a0 = jnp.full((num_tiles, P), ACC_SEED, jnp.float32)
    d0 = jnp.zeros((num_tiles, P), bool)
    n0 = jnp.zeros((num_tiles, P), jnp.int32)
    (Tf, C, D, acc, _, ncon), _ = lax.scan(
        step, (T0, C0, D0, a0, d0, n0),
        (xs_m2, xs_co, xs_de, xs_cl, xs_op, xs_mk, ks))

    out_color_t = C + Tf[..., None] * bg
    out_depth_t = jnp.where(acc > ACC_GATE, D / acc, 0.0)
    out = RenderOutput(
        color=_tiles_to_image(out_color_t, gx, gy, tile, W, H),
        depth=_tiles_to_image(out_depth_t, gx, gy, tile, W, H),
        alpha=_tiles_to_image(acc - ACC_SEED, gx, gy, tile, W, H),
        final_T=_tiles_to_image(Tf, gx, gy, tile, W, H))
    residuals = (Tf, acc, D, ncon)
    return out, residuals


def _blend_fwd(tile, gx, gy, W, H, mean2d, conic, depth, color, opac, bg,
               entries, entry_mask):
    out, res = _blend_fwd_impl(tile, gx, gy, W, H, mean2d, conic, depth,
                               color, opac, bg, entries, entry_mask)
    saved = (mean2d, conic, depth, color, opac, bg, entries, entry_mask, res)
    return out, saved


def _blend_bwd(tile, gx, gy, W, H, saved, g: RenderOutput):
    mean2d, conic, depth, color, opac, bg, entries, entry_mask, res = saved
    (Tf, acc, D, ncon) = res
    num_tiles, cap = entries.shape
    P = tile * tile
    n = mean2d.shape[0]
    pxg, pyg = _tile_pixel_coords(gx, gy, tile)

    # incoming cotangents -> tile layout
    g_color = _image_to_tiles(g.color, gx, gy, tile)        # [T, P, 3]
    g_depth = _image_to_tiles(g.depth, gx, gy, tile)        # [T, P]
    g_alpha = _image_to_tiles(g.alpha, gx, gy, tile)        # [T, P]
    g_finalT = _image_to_tiles(g.final_T, gx, gy, tile)     # [T, P]

    gate = acc > ACC_GATE
    # unified per-channel pixel cotangents: (r, g, b, depth_value, ones)
    u_rgb = g_color                                          # [T, P, 3]
    u_d = jnp.where(gate, g_depth / acc, 0.0)                # [T, P]
    u_one = jnp.where(gate, -g_depth * D / (acc * acc), 0.0) + g_alpha
    u = jnp.concatenate([u_rgb, u_d[..., None], u_one[..., None]], -1)

    m2 = mean2d[entries]
    co = conic[entries]
    de = depth[entries]
    cl = color[entries]
    op = opac[entries]

    bg_dot = jnp.einsum('tpc,c->tp', u_rgb, bg)              # [T, P]

    xs_m2, ch = _chunk(m2, cap)
    xs_co, _ = _chunk(co, cap)
    xs_de, _ = _chunk(de, cap)
    xs_cl, _ = _chunk(cl, cap)
    xs_op, _ = _chunk(op, cap)
    xs_mk, _ = _chunk(entry_mask, cap)
    ks = jnp.arange(cap // ch, dtype=jnp.int32) * ch

    def step(carry, inp):
        T, accum_rec, last_alpha, last_vals = carry
        m2k, cok, dek, clk, opk, mk, k0 = inp
        outs = [None] * ch
        for j in reversed(range(ch)):
            dx = m2k[j, :, 0:1] - pxg
            dy = m2k[j, :, 1:2] - pyg
            power = (-0.5 * (cok[j, :, 0:1] * dx * dx
                             + cok[j, :, 2:3] * dy * dy)
                     - cok[j, :, 1:2] * dx * dy)
            G = jnp.exp(power)
            oG = opk[j, :, None] * G
            alpha = jnp.minimum(ALPHA_MAX, oG)
            blended = (mk[j, :, None] & (power <= 0.0)
                       & (alpha >= ALPHA_MIN) & (k0 + j < ncon))

            T = jnp.where(blended, T / (1.0 - alpha), T)
            w = jnp.where(blended, alpha * T, 0.0)           # [T, P]

            # channel values of this splat: (rgb, depth, 1)
            vals = jnp.concatenate(
                [jnp.broadcast_to(clk[j, :, None, :], (num_tiles, P, 3)),
                 jnp.broadcast_to(dek[j, :, None, None], (num_tiles, P, 1)),
                 jnp.ones((num_tiles, P, 1), jnp.float32)], -1)  # [T, P, 5]

            # suffix accumulator: what is blended BEHIND this splat
            accum_rec = jnp.where(
                blended[..., None],
                last_alpha[..., None] * last_vals
                + (1.0 - last_alpha[..., None]) * accum_rec,
                accum_rec)
            dL_dalpha = jnp.sum((vals - accum_rec) * u, -1)  # [T, P]
            dL_dalpha = dL_dalpha * T
            # background shows through less when alpha grows
            dL_dalpha = dL_dalpha + jnp.where(
                blended, (-Tf / (1.0 - alpha)) * (bg_dot + g_finalT), 0.0)
            dL_dalpha = jnp.where(blended, dL_dalpha, 0.0)

            # per-splat channel grads, reduced over pixels immediately
            d_color_k = jnp.einsum('tp,tpc->tc', w, u_rgb)   # [T, 3]
            d_depth_k = jnp.sum(w * u_d, -1)                 # [T]

            unclamped = oG < ALPHA_MAX
            dL_dG = jnp.where(unclamped, opk[j, :, None], 0.0) * dL_dalpha
            d_opac_k = jnp.sum(jnp.where(unclamped, G, 0.0) * dL_dalpha, -1)

            gdx = G * dx
            gdy = G * dy
            # dG/dmean_x = G*(-a*dx - b*dy); dG/dmean_y = G*(-c*dy - b*dx)
            d_mean2d_k = jnp.stack([
                jnp.sum(dL_dG * (-gdx * cok[j, :, 0:1]
                                 - gdy * cok[j, :, 1:2]), -1),
                jnp.sum(dL_dG * (-gdy * cok[j, :, 2:3]
                                 - gdx * cok[j, :, 1:2]), -1),
            ], -1)
            d_conic_k = jnp.stack([
                jnp.sum(-0.5 * gdx * dx * dL_dG, -1),
                jnp.sum(-gdx * dy * dL_dG, -1),
                jnp.sum(-0.5 * gdy * dy * dL_dG, -1),
            ], -1)

            # bookkeeping for next (earlier) splat
            last_vals = jnp.where(blended[..., None], vals, last_vals)
            last_alpha = jnp.where(blended, alpha, last_alpha)
            outs[j] = (d_mean2d_k, d_conic_k, d_depth_k, d_color_k,
                       d_opac_k)
        ys = tuple(jnp.stack([o[q] for o in outs])          # [CH, T, ...]
                   for q in range(5))
        return (T, accum_rec, last_alpha, last_vals), ys

    carry0 = (Tf,
              jnp.zeros((num_tiles, P, 5), jnp.float32),
              jnp.zeros((num_tiles, P), jnp.float32),
              jnp.zeros((num_tiles, P, 5), jnp.float32))
    xs = (xs_m2, xs_co, xs_de, xs_cl, xs_op, xs_mk, ks)
    _, ys = lax.scan(step, carry0, xs, reverse=True)
    # ys: [cap//CH, CH, T, ...] -> flatten to pair list aligned w/ entries.T
    d_mean2d_s, d_conic_s, d_depth_s, d_color_s, d_opac_s = (
        y.reshape((cap * num_tiles,) + y.shape[3:]) for y in ys)
    seg = entries.T.reshape(-1)                              # [cap*T]
    d_mean2d = jax.ops.segment_sum(d_mean2d_s, seg, n)
    d_conic = jax.ops.segment_sum(d_conic_s, seg, n)
    d_depth = jax.ops.segment_sum(d_depth_s, seg, n)
    d_color = jax.ops.segment_sum(d_color_s, seg, n)
    d_opac = jax.ops.segment_sum(d_opac_s, seg, n)

    d_bg = jnp.einsum('tp,tpc->c', Tf, u_rgb)

    zero_i = np.zeros(entries.shape, dtype=jax.dtypes.float0)
    zero_b = np.zeros(entry_mask.shape, dtype=jax.dtypes.float0)
    return (d_mean2d, d_conic, d_depth, d_color, d_opac, d_bg,
            zero_i, zero_b)


tile_blend.defvjp(_blend_fwd, _blend_bwd)


def rasterize_tiles(proj: ProjectedSplats,
                    colors: jnp.ndarray,
                    opacities: jnp.ndarray,
                    bg: jnp.ndarray,
                    W: int, H: int,
                    tile: int = 16,
                    pair_capacity: int | None = None,
                    tile_capacity: int = 1024,
                    packed_capacity: int | None = None,
                    tile_sharding=None,
                    backend: str | None = None) -> tuple[RenderOutput,
                                                         TileBins]:
    """Bin + blend. Binning indices carry no gradients (stop_gradient).

    ``packed_capacity`` sizes the post-cull sorted pair list (see
    ops.tiles.bin_splats) — the exact-zero pair cull typically drops
    20-40% of rect pairs, so a snug packed buffer shrinks the pack /
    blend / gradient-reduction stages by that factor. Defaults to
    pair_capacity (always safe).

    ``tile_sharding``: optional NamedSharding whose leading axis shards the
    tile grid over a mesh axis (the sequence-parallel analog for
    splatting; SURVEY.md section 2.5). With backend='xla' GSPMD partitions
    the blend scan; with backend='pallas' the Mosaic kernels run per-device
    via shard_map over round-robin-dealt tile positions (ops/pallas/blend),
    falling back to the XLA blend when the grid doesn't divide the axis.
    """
    n = proj.mean2d.shape[0]
    gx, gy = (-(-W // tile), -(-H // tile))
    if pair_capacity is None:
        # Overflow is depth-aware at BOTH levels (ops.tiles depth pre-sort):
        # pairs beyond pair_capacity drop the farthest Gaussians, per-tile
        # lists keep the nearest tile_capacity splats. Budget 2x the total
        # tile capacity (big early-training splats can demand ~10x the tile
        # budget); overflow is reported in TileBins.
        limit = 2 * gx * gy * tile_capacity
        want = 1 << max(16, int(np.ceil(np.log2(max(4 * n, 1)))))
        pair_capacity = max(1024, min(want, limit))
    if backend is None:
        backend = 'pallas' if _on_tpu() else 'xla'
    mesh = axis = None
    tile_shards = 1
    if backend == 'pallas' and tile_sharding is not None:
        # shard_map the Mosaic kernels over the tile/position axis: each
        # device blends its strip of (round-robin-dealt) tile columns
        # (SURVEY.md section 5.7 — the sequence-parallel analog). Falls
        # back to the XLA blend when the grid doesn't divide the axis.
        m = tile_sharding.mesh
        ax = tile_sharding.spec[0] if len(tile_sharding.spec) else None
        n_sh = m.shape[ax] if ax is not None else 1
        if ax is not None and n_sh > 1 and (gx * gy) % n_sh == 0:
            mesh, axis, tile_shards = m, ax, n_sh
        elif ax is not None and n_sh > 1:
            backend = 'xla'
    pallas_path = backend == 'pallas'
    opac_sg = lax.stop_gradient(jnp.where(proj.valid, opacities, 0.0))
    attr_rows = None
    if pallas_path and n > 0:
        # blend-attribute VALUES ride the binning gather/sort into the
        # kernel slab (TileBins.slab) — stop-gradient; the custom_vjp
        # defines gradients to the real tensors analytically
        p_sg = lax.stop_gradient(proj)
        attr_rows = jnp.stack([
            p_sg.mean2d[:, 0], p_sg.mean2d[:, 1], p_sg.conic[:, 0],
            p_sg.conic[:, 1], p_sg.conic[:, 2], opac_sg,
            p_sg.depth, *(lax.stop_gradient(colors[:, i])
                          for i in range(3))], 0)         # [10, N]
    bins = bin_splats(
        ProjectedSplats(*(lax.stop_gradient(x) for x in proj)),
        W, H, tile, pair_capacity, tile_capacity,
        opacities=opac_sg,
        packed_capacity=packed_capacity,
        grad_index=pallas_path, need_entries=not pallas_path,
        attr_rows=attr_rows, tile_shards=tile_shards)
    if tile_sharding is not None and bins.entries is not None:
        bins = bins._replace(
            entries=lax.with_sharding_constraint(bins.entries, tile_sharding),
            entry_mask=lax.with_sharding_constraint(bins.entry_mask,
                                                    tile_sharding))
    if n == 0:
        # empty scene: both blend paths gather per-entry splat data and
        # cannot gather from zero-length arrays — the composite is just
        # the background (found by config fuzzing; the reference never
        # rasterizes an empty model either)
        out = RenderOutput(
            color=jnp.broadcast_to(bg.astype(jnp.float32), (H, W, 3)),
            depth=jnp.zeros((H, W), jnp.float32),
            alpha=jnp.zeros((H, W), jnp.float32),
            final_T=jnp.ones((H, W), jnp.float32))
        return out, bins
    # neutralize contributions of invalid splats (mirrors radius-0 cull)
    opac_eff = jnp.where(proj.valid, opacities, 0.0)
    if backend == 'pallas':
        from .pallas.wrapper import tile_blend_pallas
        out = tile_blend_pallas(tile, gx, gy, W, H, tile_capacity,
                                mesh, axis,
                                proj.mean2d, proj.conic, proj.depth,
                                colors, opac_eff, bg, bins.gauss_sorted,
                                bins.t_start, bins.counts, bins.perm,
                                bins.pos, bins.src_lane,
                                bins.starts_by_id, bins.ends_by_id,
                                bins.slab)
    else:
        out = tile_blend(tile, gx, gy, W, H, proj.mean2d, proj.conic,
                         proj.depth, colors, opac_eff, bg, bins.entries,
                         bins.entry_mask)
    return out, bins
