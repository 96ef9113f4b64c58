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
    packed_overflow: jnp.ndarray
    # anchor indices of the visible-compacted set ([visible_capacity] int32,
    # entries == capacity are padding), or None when decode ran dense
    visible_idx: jnp.ndarray | None = None


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


def count_pairs(model: Model, intr: Intrinsics, cam: CameraArrays,
                cfg: GSConfig, *, mode: str = 'eval',
                visible: jnp.ndarray | None = None,
                visible_capacity: int | None = None) -> jnp.ndarray:
    """Total splat-tile pair count (pre-cull upper bound) for one view.

    Runs the same compaction + decode + projection head as render() and
    sums the per-child touched-tile rectangle counts — the measuring
    pass _render_model uses to size the eval binning buffers snugly.
    """
    from ..ops.tiles import compute_tile_rects
    if (visible_capacity is not None and visible is not None
            and model.state.capacity > visible_capacity):
        st = model.state
        C = st.capacity
        visible_idx = jnp.nonzero(visible, size=visible_capacity,
                                  fill_value=C)[0].astype(jnp.int32)
        ok = visible_idx < C
        safe = jnp.minimum(visible_idx, C - 1)
        model = model._replace(state=st.gather_rows(safe,
                                                    ok & st.alive[safe]))
        visible = None
    dec, _ = decode_neural_gaussians(model, cam.camera_center, cfg,
                                     phase=0, mode=mode, visible=visible)
    cov6 = projection.build_cov3d(dec.scaling, dec.rotation)
    proj = projection.project_gaussians(
        dec.xyz, cov6, cam.viewmat, cam.full_proj,
        intr.width, intr.height, intr.focal_x, intr.focal_y,
        intr.tan_fovx, intr.tan_fovy)
    proj = proj._replace(valid=proj.valid & dec.valid)
    opac_eff = jnp.where(proj.valid, dec.opacity, 0.0)
    *_, touched = compute_tile_rects(proj, intr.width, intr.height,
                                     cfg.tile_size, opacities=opac_eff)
    return jnp.sum(touched)


def render(model: Model, intr: Intrinsics, cam: CameraArrays,
           cfg: GSConfig, *, phase: int = 0, mode: str = 'train',
           key: jax.Array | None = None,
           bg: jnp.ndarray | None = None,
           visible: jnp.ndarray | None = None,
           mean2d_offset: jnp.ndarray | None = None,
           tile_capacity: int | None = None,
           tile_sharding=None,
           backend: str | None = None,
           visible_capacity: int | None = None,
           pair_capacity: int | None = None,
           packed_capacity: int | None = None) -> RenderResult:
    """Render one view. ``mean2d_offset`` is a FLAT zeros [n_child*2]
    input whose gradient equals dL/dmean2d in pixel units — the functional
    analog of the reference's retain_grad screenspace_points
    (gaussian_renderer:224-229), used for densification statistics. (Flat
    because a persistent [n_child, 2] buffer pads 64x under TPU tiling.)

    ``visible_capacity``/``pair_capacity``/``packed_capacity`` override
    the cfg values — the eval render sizes them snugly from a measuring
    pass over the orbit (pipeline._render_model) so binning work scales
    with the actual scene rather than capacity-derived defaults."""
    if bg is None:
        bg = jnp.zeros(3)
    visible_idx = None
    if visible_capacity is None:
        visible_capacity = cfg.visible_capacity
    attr_means = None
    if (visible_capacity is not None and visible is not None
            and model.state.capacity > visible_capacity):
        # visible-anchor compaction (the reference gathers by visible_mask
        # before decoding, gaussian_renderer/__init__.py:33-44): bound the
        # decoded set to a static bucket; grads scatter back to the full
        # state through the gather VJP. Overflowing anchors (visible count
        # > bucket) are dropped for this step.
        st = model.state
        C = st.capacity
        vcap = visible_capacity
        if mode == 'eval' or phase == 2:
            # quantization-centering means come from the FULL state (the
            # reference centers on pc-wide means before visibility
            # gathering) so the render is compaction-invariant
            from .decode import _masked_mean
            from .anchors import get_scaling as _gs
            aw = st.alive.astype(jnp.float32)
            attr_means = (
                _masked_mean(st.feat, aw[:, None]),
                _masked_mean(_gs(st), aw[:, None]),
                _masked_mean(st.offset, aw[:, None, None]))
        visible_idx = jnp.nonzero(visible, size=vcap,
                                  fill_value=C)[0].astype(jnp.int32)
        ok = visible_idx < C
        safe = jnp.minimum(visible_idx, C - 1)
        # row-gather on the FLAT leaves (not the 3D views): see
        # AnchorState.gather_rows — the padded view layout OOMs at
        # multi-million-anchor capacity
        sub = st.gather_rows(safe, ok & st.alive[safe])
        model = model._replace(state=sub)
        visible = None           # the compacted set IS the visible set
    dec, rate = decode_neural_gaussians(model, cam.camera_center, cfg,
                                        phase=phase, mode=mode,
                                        visible=visible, key=key,
                                        attr_means=attr_means)
    cov6 = projection.build_cov3d(dec.scaling, dec.rotation)
    proj = projection.project_gaussians(
        dec.xyz, cov6, cam.viewmat, cam.full_proj,
        intr.width, intr.height, intr.focal_x, intr.focal_y,
        intr.tan_fovx, intr.tan_fovy)
    if mean2d_offset is not None:
        proj = proj._replace(
            mean2d=proj.mean2d + mean2d_offset.reshape(-1, 2))
    proj = proj._replace(valid=proj.valid & dec.valid)
    out, bins = rasterize_tiles(
        proj, dec.color, dec.opacity, bg,
        intr.width, intr.height, tile=cfg.tile_size,
        pair_capacity=pair_capacity or cfg.pair_capacity,
        tile_capacity=tile_capacity or cfg.max_splats_per_tile,
        packed_capacity=packed_capacity or cfg.packed_capacity,
        tile_sharding=tile_sharding, backend=backend)
    return RenderResult(out=out, dec=dec, rate=rate, proj=proj,
                        tile_overflow=bins.tile_overflow,
                        pair_overflow=bins.pair_overflow,
                        packed_overflow=bins.packed_overflow,
                        visible_idx=visible_idx)
