"""The full model bundle: anchor state + MLP heads + hash-grid context.

One pytree, jit-friendly; the TPU analog of the reference GaussianModel
(scene/gaussian_model.py:107-267) re-organized as explicit functional state.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import GSConfig
from ..ops import hashgrid
from . import heads as heads_lib
from .anchors import AnchorBounds, AnchorState, init_from_points


class Model(NamedTuple):
    state: AnchorState
    heads: dict
    grid: dict            # mix-3D2D hash tables
    bounds: AnchorBounds


def mix_spec(cfg: GSConfig) -> hashgrid.Mix3D2DSpec:
    return hashgrid.Mix3D2DSpec(
        n_features=cfg.n_features_per_level,
        resolutions_3d=cfg.resolutions_3d,
        log2_hashmap_size_3d=cfg.log2_hashmap_size_3d,
        resolutions_2d=cfg.resolutions_2d,
        log2_hashmap_size_2d=cfg.log2_hashmap_size_2d,
        ste_binary=True)


def context_dim(cfg: GSConfig) -> int:
    return mix_spec(cfg).output_dim


def init_model(key, points: np.ndarray, cfg: GSConfig,
               capacity: int | None = None) -> tuple["Model", float]:
    k_heads, k_grid = jax.random.split(key)
    state, voxel_size = init_from_points(
        points, n_offsets=cfg.n_offsets, feat_dim=cfg.feat_dim,
        voxel_size=cfg.voxel_size, capacity=capacity)
    spec = mix_spec(cfg)
    model = Model(
        state=state,
        heads=heads_lib.init_heads(k_heads, cfg.feat_dim, cfg.n_offsets,
                                   spec.output_dim, cfg.use_feat_bank,
                                   color_mode=cfg.color_mode,
                                   sh_degree=cfg.sh_degree),
        grid=hashgrid.init_mix_params(spec, k_grid),
        bounds=AnchorBounds.initial(),
    )
    return model, voxel_size


def calc_interp_feat(model: Model, anchor: jnp.ndarray,
                     cfg: GSConfig) -> jnp.ndarray:
    """Hash-context features for anchors (calc_interp_feat,
    gaussian_model.py:413-419)."""
    x = (anchor - model.bounds.x_min) / (model.bounds.x_max
                                         - model.bounds.x_min)
    return hashgrid.mix_encode(model.grid, x, mix_spec(cfg))
