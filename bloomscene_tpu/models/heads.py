"""Tiny MLP heads of the anchor model — functional params, MXU-friendly.

Architectures mirror the reference (scene/gaussian_model.py:224-265):
opacity (F+4 -> F -> K, tanh), cov (F+4 -> F -> 7K), color (F+4 -> F -> 3K,
sigmoid), grid/context (ctx -> 2F -> 2*(F+6+3K)+3), deform (ctx -> 2F -> 2K,
bias[0::2] += 10 — trained but never used in the render path; kept for
behavioral parity), optional feature bank (4 -> F -> 3, softmax).

Weights use torch's default Linear init (U(-1/sqrt(fan_in), +1/sqrt(fan_in)))
so training dynamics are comparable.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


def _linear_init(key, fan_in: int, fan_out: int):
    kw, kb = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(fan_in)
    w = jax.random.uniform(kw, (fan_in, fan_out), jnp.float32, -bound, bound)
    b = jax.random.uniform(kb, (fan_out,), jnp.float32, -bound, bound)
    return {'w': w, 'b': b}


def init_mlp(key, dims):
    """dims = (in, hidden, ..., out); returns list of layer params."""
    keys = jax.random.split(key, len(dims) - 1)
    return [_linear_init(k, dims[i], dims[i + 1])
            for i, k in enumerate(keys)]


def mlp_apply(params, x, final_act=None):
    for i, layer in enumerate(params):
        x = x @ layer['w'] + layer['b']
        if i < len(params) - 1:
            x = jax.nn.relu(x)
    if final_act is not None:
        x = final_act(x)
    return x


def init_heads(key, feat_dim: int, n_offsets: int, ctx_dim: int,
               use_feat_bank: bool = False, color_mode: str = 'mlp',
               sh_degree: int = 1) -> Dict:
    if color_mode not in ('mlp', 'sh'):
        raise ValueError(f"color_mode must be 'mlp' or 'sh', "
                         f"got {color_mode!r}")
    ks = jax.random.split(key, 6)
    if color_mode == 'sh':
        # per-child SH coefficients from the VIEW-INDEPENDENT anchor
        # feature: view dependence comes exclusively from the SH basis
        # (ops/sh.py; reference contract forward.cu:20-72), not from a
        # view-conditioned MLP input
        m = (sh_degree + 1) ** 2
        color = init_mlp(ks[2], (feat_dim, feat_dim, 3 * m * n_offsets))
    else:
        color = init_mlp(ks[2], (feat_dim + 4, feat_dim, 3 * n_offsets))
    heads = {
        'opacity': init_mlp(ks[0], (feat_dim + 4, feat_dim, n_offsets)),
        'cov': init_mlp(ks[1], (feat_dim + 4, feat_dim, 7 * n_offsets)),
        'color': color,
        'grid': init_mlp(ks[3], (ctx_dim, feat_dim * 2,
                                 (feat_dim + 6 + 3 * n_offsets) * 2 + 3)),
        'deform': init_mlp(ks[4], (ctx_dim, feat_dim * 2, 2 * n_offsets)),
    }
    # reference quirk: mlp_deform[-1].bias[0::2] += 10 (gaussian_model.py:265)
    b = heads['deform'][-1]['b']
    heads['deform'][-1]['b'] = b.at[0::2].add(10.0)
    if use_feat_bank:
        heads['feature_bank'] = init_mlp(ks[5], (4, feat_dim, 3))
    return heads


def apply_opacity(heads, x):
    return mlp_apply(heads['opacity'], x, jnp.tanh)


def apply_cov(heads, x):
    return mlp_apply(heads['cov'], x)


def apply_color(heads, x):
    return mlp_apply(heads['color'], x, jax.nn.sigmoid)


def apply_color_sh(heads, feat):
    """Raw per-child SH coefficients [C, 3*M*K] (no activation — eval_sh
    applies the reference's +0.5 offset and >=0 clamp, forward.cu:63-70)."""
    return mlp_apply(heads['color'], feat)


def apply_grid(heads, x):
    return mlp_apply(heads['grid'], x)


def apply_feature_bank(heads, x):
    return mlp_apply(heads['feature_bank'], x,
                     lambda y: jax.nn.softmax(y, axis=1))


def mlp_param_bits(heads: Dict, bits_per_param: int = 32) -> int:
    """Size of the codec-relevant MLPs (excludes deform, like
    get_mlp_size, gaussian_model.py:283-288)."""
    total = 0
    for name, layers in heads.items():
        if name == 'deform':
            continue
        for layer in layers:
            total += layer['w'].size + layer['b'].size
    return total * bits_per_param
