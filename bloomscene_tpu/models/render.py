"""Full neural render: anchor decode -> project -> tile rasterize.

The TPU equivalent of gaussian_renderer.render + prefilter_voxel
(gaussian_renderer/__init__.py:211-349). Everything is jit-compatible:
static camera intrinsics + traced camera matrices, static phase/mode.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import GSConfig
from ..ops import projection
from ..ops.projection import ProjectedSplats
from ..ops.reference_rasterizer import RenderOutput
from ..ops.tile_rasterizer import rasterize_tiles
from ..scene.cameras import CameraArrays, Intrinsics
from .anchors import get_scaling
from .decode import DecodedGaussians, RateInfo, decode_neural_gaussians
from .model import Model


class RenderResult(NamedTuple):
    out: RenderOutput
    dec: DecodedGaussians
    rate: RateInfo
    proj: ProjectedSplats
    tile_overflow: jnp.ndarray
    pair_overflow: jnp.ndarray


def prefilter_anchors(model: Model, intr: Intrinsics,
                      cam: CameraArrays) -> jnp.ndarray:
    """Anchor-visibility mask via a radii-only projection pass.

    Mirrors prefilter_voxel (gaussian_renderer:294-349): anchors projected
    as Gaussians with the offset-scale (scaling[:, :3]) and the raw stored
    rotation, visible iff radius > 0 after frustum/near culling.
    """
    st = model.state
    scales3 = get_scaling(st)[:, :3]
    cov6 = projection.build_cov3d(scales3, st.rotation)
    proj = projection.project_gaussians(
        st.anchor, cov6, cam.viewmat, cam.full_proj,
        intr.width, intr.height, intr.focal_x, intr.focal_y,
        intr.tan_fovx, intr.tan_fovy)
    return proj.valid & st.alive


def render(model: Model, intr: Intrinsics, cam: CameraArrays,
           cfg: GSConfig, *, phase: int = 0, mode: str = 'train',
           key: jax.Array | None = None,
           bg: jnp.ndarray | None = None,
           visible: jnp.ndarray | None = None,
           mean2d_offset: jnp.ndarray | None = None,
           tile_capacity: int | None = None,
           tile_sharding=None) -> RenderResult:
    """Render one view. ``mean2d_offset`` is a zeros [C*K, 2] input whose
    gradient equals dL/dmean2d in pixel units — the functional analog of the
    reference's retain_grad screenspace_points (gaussian_renderer:224-229),
    used for densification statistics."""
    if bg is None:
        bg = jnp.zeros(3)
    dec, rate = decode_neural_gaussians(model, cam.camera_center, cfg,
                                        phase=phase, mode=mode,
                                        visible=visible, key=key)
    cov6 = projection.build_cov3d(dec.scaling, dec.rotation)
    proj = projection.project_gaussians(
        dec.xyz, cov6, cam.viewmat, cam.full_proj,
        intr.width, intr.height, intr.focal_x, intr.focal_y,
        intr.tan_fovx, intr.tan_fovy)
    if mean2d_offset is not None:
        proj = proj._replace(mean2d=proj.mean2d + mean2d_offset)
    proj = proj._replace(valid=proj.valid & dec.valid)
    out, bins = rasterize_tiles(
        proj, dec.color, dec.opacity, bg,
        intr.width, intr.height, tile=cfg.tile_size,
        tile_capacity=tile_capacity or cfg.max_splats_per_tile,
        tile_sharding=tile_sharding)
    return RenderResult(out=out, dec=dec, rate=rate, proj=proj,
                        tile_overflow=bins.tile_overflow,
                        pair_overflow=bins.pair_overflow)
