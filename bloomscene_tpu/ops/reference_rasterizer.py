"""Golden-model rasterizer: dense, pure JAX, fully differentiable.

This is the executable specification for the production tile rasterizer
(``bloomscene_tpu.ops.rasterizer``). It replicates, per pixel, the exact
front-to-back blend of the reference CUDA kernel ``renderCUDA``
(submodules/depth-diff-gaussian-rasterization/cuda_rasterizer/forward.cu:
338-471):

- Gaussians processed in globally depth-sorted order.
- power = -0.5*(a*dx^2 + c*dy^2) - b*dx*dy; skip if power > 0.
- alpha = min(0.99, opacity * exp(power)); skip if alpha < 1/255.
- stop (per pixel) when T*(1-alpha) < 1e-4 — the triggering Gaussian is NOT
  blended.
- color_out = sum(c_i * alpha_i * T_i) + T_final * bg.
- depth accumulators: D += depth_i*alpha_i*T_i, acc += alpha_i*T_i with acc
  seeded at 1e-6; depth_out = D/acc if acc > 0.5 else 0 (forward.cu:385-468).

Unlike the shipped CUDA backward (backward.cu:539-554, which drops the depth
gradient path entirely), this model is differentiated by JAX autodiff, so
depth gradients flow to every parameter — the north-star extension required
by BASELINE.json. O(pixels * gaussians): use only for tests / tiny scenes.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .projection import ProjectedSplats

ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99
T_EPS = 1e-4
ACC_SEED = 1e-6
ACC_GATE = 0.5


class RenderOutput(NamedTuple):
    color: jnp.ndarray    # [H, W, 3]
    depth: jnp.ndarray    # [H, W]
    alpha: jnp.ndarray    # [H, W] accumulated alpha (acc, without seed gate)
    final_T: jnp.ndarray  # [H, W]


def rasterize_reference(proj: ProjectedSplats,
                        colors: jnp.ndarray,
                        opacities: jnp.ndarray,
                        bg: jnp.ndarray,
                        W: int, H: int,
                        tile: int | None = None) -> RenderOutput:
    """Dense O(N*P) rasterization with exact reference blend semantics.

    If ``tile`` is given, a pixel only sees Gaussians whose 3-sigma tile
    rectangle covers the pixel's tile — the CUDA binning visibility rule
    (getRect, auxiliary.h:46-56). With ``tile=None`` every valid Gaussian is
    considered everywhere (pure mathematical blend).
    """
    n = proj.mean2d.shape[0]
    # Globally depth-sort; push invalid Gaussians to the back and mask them.
    sort_depth = jnp.where(proj.valid, proj.depth, jnp.inf)
    order = jnp.argsort(sort_depth)  # stable: ties keep index order
    mean2d = proj.mean2d[order]
    conic = proj.conic[order]
    depth = proj.depth[order]
    valid = proj.valid[order]
    color = colors[order]
    opac = opacities[order]
    radius = proj.radius[order].astype(jnp.float32)

    px = jnp.arange(W, dtype=jnp.float32)
    py = jnp.arange(H, dtype=jnp.float32)
    pxg, pyg = jnp.meshgrid(px, py)             # [H, W]
    if tile is not None:
        ptx = (pxg // tile).astype(jnp.int32)   # pixel's tile coords
        pty = (pyg // tile).astype(jnp.int32)

    def step(carry, splat):
        T, C, D, acc, done = carry
        m2d, con, dep, val, col, op, rad = splat
        dx = m2d[0] - pxg
        dy = m2d[1] - pyg
        power = -0.5 * (con[0] * dx * dx + con[2] * dy * dy) - con[1] * dx * dy
        alpha = jnp.minimum(ALPHA_MAX, op * jnp.exp(power))
        contrib = val & (power <= 0.0) & (alpha >= ALPHA_MIN) & ~done
        if tile is not None:
            gxn, gyn = -(-W // tile), -(-H // tile)
            rx0 = jnp.clip(jnp.floor((m2d[0] - rad) / tile), 0, gxn)
            ry0 = jnp.clip(jnp.floor((m2d[1] - rad) / tile), 0, gyn)
            rx1 = jnp.clip(jnp.floor((m2d[0] + rad + tile - 1) / tile), 0, gxn)
            ry1 = jnp.clip(jnp.floor((m2d[1] + rad + tile - 1) / tile), 0, gyn)
            in_rect = ((ptx >= rx0) & (ptx < rx1) & (pty >= ry0) & (pty < ry1))
            contrib = contrib & in_rect
        test_T = T * (1.0 - alpha)
        # the contributing Gaussian that would push T below T_EPS is skipped
        # AND terminates the pixel (sticky 'done', forward.cu:430-435).
        terminate = contrib & (test_T < T_EPS)
        blend = contrib & ~terminate
        done = done | terminate
        w = jnp.where(blend, alpha * T, 0.0)
        C = C + w[..., None] * col
        D = D + w * dep
        acc = acc + w
        T = jnp.where(blend, test_T, T)
        return (T, C, D, acc, done), None

    T0 = jnp.ones((H, W), jnp.float32)
    C0 = jnp.zeros((H, W, 3), jnp.float32)
    D0 = jnp.zeros((H, W), jnp.float32)
    a0 = jnp.full((H, W), ACC_SEED, jnp.float32)
    done0 = jnp.zeros((H, W), bool)
    (T, C, D, acc, _), _ = jax.lax.scan(
        step, (T0, C0, D0, a0, done0),
        (mean2d, conic, depth, valid, color, opac, radius))

    out_color = C + T[..., None] * bg
    out_depth = jnp.where(acc > ACC_GATE, D / acc, 0.0)
    return RenderOutput(color=out_color, depth=out_depth,
                        alpha=acc - ACC_SEED, final_T=T)
