"""Sharded training/render steps over a device mesh.

Two first-class SPMD strategies (absent from the single-GPU reference;
SURVEY.md section 2.5 maps the analogies):

1. **Data parallel** (``make_dp_train_step``): a batch of cameras is
   sharded over the ``data`` axis; the model/optimizer are replicated; the
   per-view losses are averaged, so XLA all-reduces parameter gradients
   across the mesh. This is the full training step — decode, rasterize
   (fwd+bwd), rate loss, optax update — under one pjit.

2. **Tile parallel** (``make_tile_parallel_render``): one view, the tile
   grid of the blend sharded over the ``tile`` axis — each device blends
   its strip of image tiles; the per-tile splat gathers become XLA
   all-gathers over ICI. This is the sequence-parallel analog for
   splatting (pixel-tile sharding).

Pipeline parallelism is intentionally not implemented: the whole model is
KB-scale MLPs (SURVEY.md section 2.5 "not warranted"); there is no MoE, so
no expert parallelism either.
"""
from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import GSConfig
from ..models.model import Model
from ..models.render import prefilter_anchors, render
from ..scene.cameras import CameraArrays, Intrinsics
from ..train.loop import compute_losses
from .mesh import data_sharded, replicated


def make_dp_train_step(cfg: GSConfig, intr: Intrinsics, optimizer,
                       bg, mesh: Mesh, *, phase: int = 0):
    """jit(step)(model, opt_state, cam_batch, gt_images, gt_depths, keys)
    with cam/gt batches sharded over the mesh 'data' axis."""

    def per_view_loss(model: Model, cam: CameraArrays, gt_image, gt_depth,
                      key):
        visible = prefilter_anchors(model, intr, cam)
        res = render(model, intr, cam, cfg, phase=phase, mode='train',
                     key=key, bg=bg, visible=visible)
        loss, aux = compute_losses(res, gt_image, gt_depth, cfg)
        return loss

    def step(model, opt_state, cams: CameraArrays, gt_images, gt_depths,
             keys):
        def batch_loss(m):
            losses = jax.vmap(per_view_loss, in_axes=(None, 0, 0, 0, 0))(
                m, cams, gt_images, gt_depths, keys)
            return jnp.mean(losses)

        loss, grads = jax.value_and_grad(batch_loss, allow_int=True)(model)
        grads = jax.tree.map(
            lambda p, g: (jnp.zeros_like(p)
                          if not jnp.issubdtype(p.dtype, jnp.floating)
                          else g), model, grads)
        updates, opt_state = optimizer.update(grads, opt_state, model)
        model = jax.tree.map(
            lambda p, u: p + u if jnp.issubdtype(p.dtype, jnp.floating)
            else p, model, updates)
        return model, opt_state, loss

    rep = replicated(mesh)
    dat = data_sharded(mesh)
    return jax.jit(
        step,
        in_shardings=(rep, rep, dat, dat, dat, dat),
        out_shardings=(rep, rep, rep))


def make_tile_parallel_render(cfg: GSConfig, intr: Intrinsics, mesh: Mesh,
                              *, phase: int = 0, mode: str = 'train'):
    """jit(render1)(model, cam, key) with the blend's tile grid sharded
    over the mesh 'tile' axis."""
    tile_sharding = NamedSharding(mesh, P('tile', None))
    rep = replicated(mesh)

    def render1(model: Model, cam: CameraArrays, key):
        res = render(model, intr, cam, cfg, phase=phase, mode=mode, key=key,
                     tile_sharding=tile_sharding)
        return res.out

    return jax.jit(render1, in_shardings=(rep, rep, rep),
                   out_shardings=rep)


def make_tile_parallel_train_step(cfg: GSConfig, intr: Intrinsics,
                                  optimizer, bg, mesh: Mesh, *,
                                  phase: int = 0):
    """Full train step on ONE view with tile-sharded blend (fwd AND bwd
    partitioned over the 'tile' axis; per-Gaussian grads reduce-scattered
    by XLA from the segment-sum)."""
    tile_sharding = NamedSharding(mesh, P('tile', None))
    rep = replicated(mesh)

    def step(model, opt_state, cam: CameraArrays, gt_image, gt_depth, key):
        def loss_fn(m):
            visible = prefilter_anchors(m, intr, cam)
            res = render(m, intr, cam, cfg, phase=phase, mode='train',
                         key=key, bg=bg, visible=visible,
                         tile_sharding=tile_sharding)
            loss, _ = compute_losses(res, gt_image, gt_depth, cfg)
            return loss

        loss, grads = jax.value_and_grad(loss_fn, allow_int=True)(model)
        grads = jax.tree.map(
            lambda p, g: (jnp.zeros_like(p)
                          if not jnp.issubdtype(p.dtype, jnp.floating)
                          else g), model, grads)
        updates, opt_state = optimizer.update(grads, opt_state, model)
        model = jax.tree.map(
            lambda p, u: p + u if jnp.issubdtype(p.dtype, jnp.floating)
            else p, model, updates)
        return model, opt_state, loss

    return jax.jit(step, in_shardings=(rep, rep, rep, rep, rep, rep),
                   out_shardings=(rep, rep, rep))
