"""Optimizer: 13 parameter groups with per-group log-lerp LR schedules.

Mirrors the reference's single Adam (eps=1e-15) with per-group scheduled
learning rates (gaussian_model.py:482-615) as an optax.multi_transform.
``rotation`` and ``opacity_raw`` are present but frozen, exactly like the
reference's requires_grad_(False) params (:477-478).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from ..config import GSConfig
from ..models.model import Model
from .schedules import expon_lr

FROZEN = 'frozen'


def param_labels(model: Model) -> Model:
    """A Model-shaped pytree of group-name strings."""
    st = model.state
    state_labels = st._replace(
        anchor='anchor', offset='offset', mask_logit='mask',
        feat='anchor_feat', scaling_log='scaling', rotation=FROZEN,
        opacity_raw=FROZEN, alive=FROZEN)
    head_names = {'opacity': 'mlp_opacity', 'cov': 'mlp_cov',
                  'color': 'mlp_color', 'grid': 'mlp_grid',
                  'deform': 'mlp_deform', 'feature_bank': 'mlp_featurebank'}
    heads_labels = {
        name: jax.tree.map(lambda _: head_names[name], layers)
        for name, layers in model.heads.items()}
    grid_labels = jax.tree.map(lambda _: 'encoding_xyz', model.grid)
    bounds_labels = jax.tree.map(lambda _: FROZEN, model.bounds)
    return Model(state=state_labels, heads=heads_labels, grid=grid_labels,
                 bounds=bounds_labels)


def make_optimizer(cfg: GSConfig, spatial_lr_scale: float,
                   model: Model) -> optax.GradientTransformation:
    s = spatial_lr_scale

    def adam(schedule):
        return optax.adam(learning_rate=schedule, eps=1e-15)

    transforms = {
        'anchor': adam(expon_lr(cfg.position_lr_init * s,
                                cfg.position_lr_final * s,
                                lr_delay_mult=cfg.position_lr_delay_mult,
                                max_steps=cfg.position_lr_max_steps)),
        'offset': adam(expon_lr(cfg.offset_lr_init * s,
                                cfg.offset_lr_final * s,
                                lr_delay_mult=cfg.offset_lr_delay_mult,
                                max_steps=cfg.offset_lr_max_steps)),
        'mask': adam(expon_lr(cfg.mask_lr_init * s, cfg.mask_lr_final * s,
                              lr_delay_mult=cfg.mask_lr_delay_mult,
                              max_steps=cfg.mask_lr_max_steps)),
        'anchor_feat': adam(cfg.feature_lr),
        'scaling': adam(cfg.scaling_lr),
        'mlp_opacity': adam(expon_lr(
            cfg.mlp_opacity_lr_init, cfg.mlp_opacity_lr_final,
            lr_delay_mult=cfg.mlp_opacity_lr_delay_mult,
            max_steps=cfg.mlp_opacity_lr_max_steps)),
        'mlp_cov': adam(expon_lr(
            cfg.mlp_cov_lr_init, cfg.mlp_cov_lr_final,
            lr_delay_mult=cfg.mlp_cov_lr_delay_mult,
            max_steps=cfg.mlp_cov_lr_max_steps)),
        'mlp_color': adam(expon_lr(
            cfg.mlp_color_lr_init, cfg.mlp_color_lr_final,
            lr_delay_mult=cfg.mlp_color_lr_delay_mult,
            max_steps=cfg.mlp_color_lr_max_steps)),
        'mlp_grid': adam(expon_lr(
            cfg.mlp_grid_lr_init, cfg.mlp_grid_lr_final,
            lr_delay_mult=cfg.mlp_grid_lr_delay_mult,
            max_steps=cfg.mlp_grid_lr_max_steps)),
        'mlp_deform': adam(expon_lr(
            cfg.mlp_deform_lr_init, cfg.mlp_deform_lr_final,
            lr_delay_mult=cfg.mlp_deform_lr_delay_mult,
            max_steps=cfg.mlp_deform_lr_max_steps)),
        'encoding_xyz': adam(expon_lr(
            cfg.encoding_xyz_lr_init, cfg.encoding_xyz_lr_final,
            lr_delay_mult=cfg.encoding_xyz_lr_delay_mult,
            max_steps=cfg.encoding_xyz_lr_max_steps)),
        'mlp_featurebank': adam(expon_lr(
            cfg.mlp_featurebank_lr_init, cfg.mlp_featurebank_lr_final,
            lr_delay_mult=cfg.mlp_featurebank_lr_delay_mult,
            max_steps=cfg.mlp_featurebank_lr_max_steps)),
        FROZEN: optax.set_to_zero(),
    }
    return optax.multi_transform(transforms, param_labels(model))


def zero_float_like(params):
    """Gradient template with zeros for non-float leaves (alive mask etc)."""
    return jax.tree.map(
        lambda p: (jnp.zeros_like(p)
                   if not jnp.issubdtype(p.dtype, jnp.floating) else p),
        params)
