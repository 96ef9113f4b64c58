"""Sharded training/render steps over a device mesh.

Two first-class SPMD strategies (absent from the single-GPU reference;
SURVEY.md section 2.5 maps the analogies):

1. **Data parallel** (``make_dp_train_step``, implemented in train.loop
   and re-exported here; ``Trainer(mesh=..., dp_batch=...)`` drives it):
   a batch of cameras is sharded over the ``data`` axis; the
   model/optimizer are replicated; the per-view losses are averaged, so
   XLA all-reduces parameter gradients across the mesh. This is the FULL
   training step — decode, rasterize (fwd+bwd), rate loss, optax update,
   densification statistics, metrics, NaN guard — under one pjit.

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


# The PRODUCTION data-parallel step lives in train.loop (it is the full
# Trainer step — densify stats, metrics, NaN guard — not a demo); it is
# re-exported here so the parallel API surface stays in one module.
from ..train.loop import make_dp_train_step  # noqa: F401  (re-export)


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
