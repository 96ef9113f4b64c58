"""Anchor -> neural Gaussian decode (generate_neural_gaussians equivalent).

Replicates the reference decode (gaussian_renderer/__init__.py:26-208) with
static shapes: instead of boolean-gather compaction, invalid children keep
opacity 0 and are culled by the rasterizer's validity mask (identical render
output — alpha < 1/255 splats never blend; see forward.cu:427-429).

Training phases (static ``phase`` argument, re-jitted per phase):
- phase 0 (step <= noise_from):   raw attributes.
- phase 1 (noise_from < step <= context_from): additive N(0, Q_base) noise
  (gaussian_renderer:56-67).
- phase 2 (step > context_from):  hash-context entropy params, adaptive Q
  noise, and the rate loss on a ~5% anchor subsample
  (gaussian_renderer:73-127).
Eval mode quantizes attributes with STE_multistep at the adaptive Q
(gaussian_renderer:131-145); decoded mode uses attributes as-is.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import GSConfig
from ..ops.entropy import entropy_gaussian_bits
from ..ops.quantization import ste_multistep
from ..ops.graphics import normalize_quat
from ..ops.sh import eval_sh, num_sh_coeffs
from . import heads as heads_lib
from .anchors import (get_anchor_quantized, get_mask, get_mask_anchor,
                      get_scaling)
from .model import Model, calc_interp_feat


class DecodedGaussians(NamedTuple):
    """Per-child-Gaussian arrays, all [C*K, ...] with a validity mask."""
    xyz: jnp.ndarray          # [M, 3]
    color: jnp.ndarray        # [M, 3]
    opacity: jnp.ndarray      # [M]
    scaling: jnp.ndarray      # [M, 3]
    rotation: jnp.ndarray     # [M, 4] (normalized)
    valid: jnp.ndarray        # [M] bool (alive & mask & opacity > 0)
    neural_opacity: jnp.ndarray  # [M] pre-mask tanh opacity (densif. stats)


class RateInfo(NamedTuple):
    bit_per_param: jnp.ndarray
    bit_per_feat_param: jnp.ndarray
    bit_per_scaling_param: jnp.ndarray
    bit_per_offsets_param: jnp.ndarray
    mask_anchor_rate: jnp.ndarray


def _masked_mean(x, w):
    return jnp.sum(x * w) / jnp.maximum(jnp.sum(w), 1.0)


def decode_neural_gaussians(model: Model, cam_center: jnp.ndarray,
                            cfg: GSConfig, *, phase: int,
                            mode: str = 'train',
                            visible: jnp.ndarray | None = None,
                            key: jax.Array | None = None,
                            attr_means: tuple | None = None
                            ) -> tuple[DecodedGaussians, RateInfo]:
    """mode in {'train', 'eval', 'decoded'}; phase in {0, 1, 2} (train).

    ``attr_means`` (feat_mean, scal_mean, off_mean) overrides the
    quantization-centering means. The reference centers on the FULL
    anchor set's means (gaussian_renderer:131-145 uses pc attributes
    before visibility gathering); when render() compacts to the visible
    bucket it computes the means from the full state and passes them
    here so quantized eval renders are compaction-invariant.
    """
    st = model.state
    C, K = st.capacity, st.n_offsets
    anchor = get_anchor_quantized(st, model.bounds)
    feat = st.feat
    grid_scaling = get_scaling(st)              # [C, 6]
    grid_offsets = st.offset                    # [C, K, 3]
    binary_mask = get_mask(st)                  # [C, K, 1]
    mask_anchor = get_mask_anchor(st)           # [C]
    alive = st.alive
    if visible is None:
        visible = alive
    else:
        visible = visible & alive
    # Reference computes mask_anchor_rate over the VISIBLE-compacted set
    # (gaussian_renderer/__init__.py:44-46: pc.get_mask_anchor[visible_mask]
    # then .sum()/.numel()), not over all anchors.
    mask_anchor_rate = jax.lax.stop_gradient(
        _masked_mean(mask_anchor, visible.astype(jnp.float32)))

    zero = jnp.zeros(())
    rate = RateInfo(zero, zero, zero, zero, mask_anchor_rate)

    q_feat = jnp.full((C, 1), cfg.q_base_feat)
    q_scaling = jnp.full((C, 1), cfg.q_base_scaling)
    q_offsets = jnp.full((C, 1), cfg.q_base_offsets)

    if mode == 'train' and phase == 1:
        k1, k2, k3 = jax.random.split(key, 3)
        feat = feat + jax.random.normal(k1, feat.shape) * cfg.q_base_feat
        grid_scaling = (grid_scaling
                        + jax.random.normal(k2, grid_scaling.shape)
                        * cfg.q_base_scaling)
        grid_offsets = (grid_offsets
                        + jax.random.normal(k3, grid_offsets.shape)
                        * cfg.q_base_offsets)

    if (mode == 'train' and phase == 2) or mode == 'eval':
        ctx = calc_interp_feat(model, anchor, cfg)              # [C, ctx]
        out = heads_lib.apply_grid(model.heads, ctx)
        F = cfg.feat_dim
        import numpy as _np
        splits = _np.cumsum([F, F, 6, 6, 3 * K, 3 * K, 1, 1, 1])[:-1]
        (mean_f, scale_f, mean_s, scale_s, mean_o, scale_o,
         q_feat_adj, q_scaling_adj, q_offsets_adj) = jnp.split(
            out, splits.tolist(), axis=-1)
        q_feat = cfg.q_base_feat * (1 + jnp.tanh(q_feat_adj))
        q_scaling = cfg.q_base_scaling * (1 + jnp.tanh(q_scaling_adj))
        q_offsets = cfg.q_base_offsets * (1 + jnp.tanh(q_offsets_adj))

    if mode == 'train' and phase == 2:
        k1, k2, k3, k4 = jax.random.split(key, 4)
        feat = feat + jax.random.normal(k1, feat.shape) * (q_feat + 1e-6)
        grid_scaling = (grid_scaling + jax.random.normal(k2,
                        grid_scaling.shape) * (q_scaling + 1e-6))
        grid_offsets = (grid_offsets + jax.random.normal(k3,
                        grid_offsets.shape) * (q_offsets + 1e-6)[:, :, None])

        # rate loss on a ~5% random subsample of VISIBLE-and-masked anchors
        # (gaussian_renderer:102-103: choose_idx drawn over the visible-
        # compacted set, & mask_anchor_bool) — computed densely, weighted.
        choose = ((jax.random.uniform(k4, (C,)) <= cfg.rate_subsample)
                  & (mask_anchor > 0) & visible)
        cw = choose.astype(jnp.float32)
        if attr_means is not None:
            feat_mean, scal_mean, off_mean = attr_means
        else:
            feat_mean = _masked_mean(st.feat,
                                     alive[:, None].astype(jnp.float32))
            scal_mean = _masked_mean(get_scaling(st),
                                     alive[:, None].astype(jnp.float32))
            off_mean = _masked_mean(st.offset,
                                    alive[:, None, None].astype(jnp.float32))
        bit_feat = entropy_gaussian_bits(feat, mean_f, scale_f, q_feat,
                                         feat_mean)             # [C, F]
        bit_scaling = entropy_gaussian_bits(grid_scaling, mean_s, scale_s,
                                            q_scaling, scal_mean)  # [C, 6]
        off_flat = grid_offsets.reshape(C, 3 * K)
        bit_offsets = entropy_gaussian_bits(off_flat, mean_o, scale_o,
                                            q_offsets, off_mean)  # [C, 3K]
        bmask3 = jnp.repeat(binary_mask[:, :, 0], 3, axis=-1)     # [C, 3K]
        bit_offsets = bit_offsets * bmask3

        n_chosen = jnp.maximum(jnp.sum(cw), 1.0)
        sum_feat = jnp.sum(bit_feat * cw[:, None])
        sum_scaling = jnp.sum(bit_scaling * cw[:, None])
        sum_offsets = jnp.sum(bit_offsets * cw[:, None])
        denom_feat = n_chosen * feat.shape[1]
        denom_scaling = n_chosen * 6
        denom_offsets = n_chosen * 3 * K
        rate = RateInfo(
            bit_per_param=((sum_feat + sum_scaling + sum_offsets)
                           / (denom_feat + denom_scaling + denom_offsets)
                           * mask_anchor_rate),
            bit_per_feat_param=sum_feat / denom_feat * mask_anchor_rate,
            bit_per_scaling_param=(sum_scaling / denom_scaling
                                   * mask_anchor_rate),
            bit_per_offsets_param=(sum_offsets / denom_offsets
                                   * mask_anchor_rate),
            mask_anchor_rate=mask_anchor_rate)

    if mode == 'eval':
        if attr_means is not None:
            feat_mean, scal_mean, off_mean = attr_means
        else:
            feat_mean = _masked_mean(st.feat,
                                     alive[:, None].astype(jnp.float32))
            scal_mean = _masked_mean(get_scaling(st),
                                     alive[:, None].astype(jnp.float32))
            off_mean = _masked_mean(st.offset,
                                    alive[:, None, None].astype(jnp.float32))
        feat = jax.lax.stop_gradient(
            ste_multistep(feat, q_feat, feat_mean))
        grid_scaling = jax.lax.stop_gradient(
            ste_multistep(grid_scaling, q_scaling, scal_mean))
        grid_offsets = jax.lax.stop_gradient(
            ste_multistep(grid_offsets, q_offsets[:, :, None], off_mean))

    # --- view-conditioned heads (gaussian_renderer:151-203) ---
    ob_view = anchor - cam_center[None, :]
    ob_dist = jnp.linalg.norm(ob_view, axis=1, keepdims=True)
    ob_view = ob_view / jnp.maximum(ob_dist, 1e-12)

    if cfg.use_feat_bank:
        # View-adaptive feature bank (gaussian_renderer/__init__.py:156-167):
        # softmax bank weights from (ob_view, ob_dist) blend coarse/medium/
        # fine strided views of feat. The reference tiles feat[:, ::4] x4 and
        # feat[:, ::2] x2 (torch .repeat); for feat_dim not divisible by 4
        # (the forced feat_dim=50, gaussian_model.py:149) the torch code
        # would shape-error — we crop the tiled views back to F (documented
        # generalization).
        F = feat.shape[1]
        bank_w = heads_lib.apply_feature_bank(
            model.heads, jnp.concatenate([ob_view, ob_dist], -1))  # [C, 3]
        feat = (jnp.tile(feat[:, ::4], (1, 4))[:, :F] * bank_w[:, 0:1]
                + jnp.tile(feat[:, ::2], (1, 2))[:, :F] * bank_w[:, 1:2]
                + feat * bank_w[:, 2:3])

    cat_view = jnp.concatenate([feat, ob_view, ob_dist], -1)    # [C, F+4]

    neural_opacity = heads_lib.apply_opacity(model.heads, cat_view)  # [C, K]
    neural_opacity = neural_opacity.reshape(-1)                 # [C*K]
    neural_opacity = neural_opacity * binary_mask.reshape(-1)
    child_valid = ((neural_opacity > 0.0)
                   & jnp.repeat(visible, K))
    opacity = jnp.where(child_valid, neural_opacity, 0.0)

    scale_rot = heads_lib.apply_cov(model.heads, cat_view).reshape(-1, 7)

    scaling6 = jnp.repeat(grid_scaling, K, axis=0)              # [C*K, 6]
    anchors_rep = jnp.repeat(anchor, K, axis=0)                 # [C*K, 3]
    offsets = grid_offsets.reshape(-1, 3)

    scaling = scaling6[:, 3:] * jax.nn.sigmoid(scale_rot[:, :3])
    rot = normalize_quat(scale_rot[:, 3:7])
    xyz = anchors_rep + offsets * scaling6[:, :3]

    if cfg.color_mode == 'sh':
        # per-child SH coefficients from the view-independent feature;
        # eval_sh supplies view dependence (and gradients to BOTH the
        # coefficients and xyz through the normalized direction — the
        # full reference contract, backward.cu:20-142)
        m = num_sh_coeffs(cfg.sh_degree)
        coeffs = heads_lib.apply_color_sh(model.heads, feat).reshape(
            -1, m, 3)                                           # [C*K, M, 3]
        color = eval_sh(cfg.sh_degree, coeffs, xyz, cam_center)
    else:
        color = heads_lib.apply_color(model.heads, cat_view).reshape(-1, 3)

    dec = DecodedGaussians(xyz=xyz, color=color, opacity=opacity,
                           scaling=scaling, rotation=rot,
                           valid=child_valid,
                           neural_opacity=neural_opacity)
    return dec, rate
