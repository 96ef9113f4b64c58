"""Straight-through quantizers (custom_vjp), matching reference semantics.

Reference: utils/encodings.py:177-227 (STE_binary, STE_multistep,
Quantize_anchor) and utils/entropy_models.py:35-50 (Low_bound). Each is a
jax.custom_vjp with the same forward values and the same (non-autodiff)
straight-through backward rules.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

ANCHOR_ROUND_DIGITS = 16                      # encodings.py:12
Q_ANCHOR = 1.0 / (2 ** ANCHOR_ROUND_DIGITS - 1)
USE_CLAMP = True                              # encodings.py:14
STE_CLAMP_RANGE = 15_000                      # encodings.py:202-203


@jax.custom_vjp
def ste_binary(x: jnp.ndarray) -> jnp.ndarray:
    """sign(x) in {-1, +1}; grad passes through only inside [-1, 1]."""
    return jnp.where(x >= 0, 1.0, -1.0).astype(x.dtype)


def _ste_binary_fwd(x):
    return ste_binary(x), x


def _ste_binary_bwd(x, g):
    # reference masks grad where clamp(x) != x, i.e. |x| > 1
    mask = (jnp.abs(x) <= 1.0).astype(g.dtype)
    return (g * mask,)


ste_binary.defvjp(_ste_binary_fwd, _ste_binary_bwd)


@jax.custom_vjp
def ste_multistep(x: jnp.ndarray, q, x_mean, tau: float = 1.0) -> jnp.ndarray:
    """Round x to the grid q*Z with a tanh soft fractional part.

    Matches STE_multistep.forward (encodings.py:196-209): clamp to
    mean +- 15000*q, hard round, plus tanh((x - round)/tau)*q soft residual.
    Gradient is identity to x (none to q / x_mean).
    """
    if USE_CLAMP:
        x = jnp.clip(x, x_mean - STE_CLAMP_RANGE * q,
                     x_mean + STE_CLAMP_RANGE * q)
    q_round = jnp.round(x / q)
    q_q = q_round * q
    return q_q + jnp.tanh((x - q_q) / tau) * q


def _ste_multistep_fwd(x, q, x_mean, tau=1.0):
    return ste_multistep(x, q, x_mean, tau), None


def _ste_multistep_bwd(res, g):
    return (g, None, None, None)


ste_multistep.defvjp(_ste_multistep_fwd, _ste_multistep_bwd)


@jax.custom_vjp
def quantize_anchor(anchors: jnp.ndarray, min_v: jnp.ndarray,
                    max_v: jnp.ndarray):
    """16-bit uniform quantization of anchor positions inside [min_v, max_v].

    Returns (anchors_q, quantized_int). Matches Quantize_anchor
    (encodings.py:215-227): floor division by the interval, clamped to the
    16-bit code range; straight-through gradient to ``anchors`` only.

    The floor gets a 0.02-cell nudge so quantization is IDEMPOTENT: a
    reconstructed value q*interval+min re-quantizes to exactly q despite
    f32 cancellation error (up to ~0.005 cells at q near 2^16; the codec
    re-encode path depends on this; the boundary shift vs the reference is
    2% of one 16-bit cell).
    """
    interval = (max_v - min_v) * Q_ANCHOR + 1e-6
    q = jnp.floor((anchors - min_v) / interval + 0.02)
    q = jnp.clip(q, 0, 2 ** ANCHOR_ROUND_DIGITS - 1)
    return q * interval + min_v, q


def _quantize_anchor_fwd(anchors, min_v, max_v):
    return quantize_anchor(anchors, min_v, max_v), None


def _quantize_anchor_bwd(res, g):
    g_anchor, _g_q = g
    return (g_anchor, None, None)


quantize_anchor.defvjp(_quantize_anchor_fwd, _quantize_anchor_bwd)


@jax.custom_vjp
def low_bound(x: jnp.ndarray, bound: float = 1e-6) -> jnp.ndarray:
    """clamp(x, min=bound) with grads passed when x >= bound OR g < 0.

    Matches Low_bound (entropy_models.py:35-50): below the bound, only
    gradients that would push x up (negative cotangent) pass.
    """
    return jnp.maximum(x, bound)


def _low_bound_fwd(x, bound=1e-6):
    return jnp.maximum(x, bound), (x, bound)


def _low_bound_bwd(res, g):
    x, bound = res
    pass_through = (x >= bound) | (g < 0.0)
    return (jnp.where(pass_through, g, 0.0), None)


low_bound.defvjp(_low_bound_fwd, _low_bound_bwd)


def ste_round(x: jnp.ndarray) -> jnp.ndarray:
    """Plain straight-through round (helper, not in the reference)."""
    return x + jax.lax.stop_gradient(jnp.round(x) - x)
