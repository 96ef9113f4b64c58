"""Entropy models for the rate loss and codec size estimation.

Reference: utils/entropy_models.py:10-31 (Entropy_gaussian) and
utils/encodings.py:17-33 (get_binary_vxl_size).
"""
from __future__ import annotations

import jax.numpy as jnp
import jax.scipy.stats as jstats

from .quantization import low_bound, USE_CLAMP, STE_CLAMP_RANGE

_LOG2 = 0.6931471805599453


def gaussian_cdf(x, mean, scale):
    return jstats.norm.cdf(x, loc=mean, scale=scale)


def entropy_gaussian_bits(x, mean, scale, q, x_mean):
    """Per-element bits: -log2(Phi(x+Q/2) - Phi(x-Q/2)).

    Matches Entropy_gaussian.forward: clamp x to x_mean +- 15000*Q, clamp
    scale to >= 1e-9, likelihood low-bounded at 1e-6 with the grad-safe
    Low_bound rule.
    """
    if USE_CLAMP:
        x = jnp.clip(x, x_mean - STE_CLAMP_RANGE * q,
                     x_mean + STE_CLAMP_RANGE * q)
    scale = jnp.maximum(scale, 1e-9)
    lower = gaussian_cdf(x - 0.5 * q, mean, scale)
    upper = gaussian_cdf(x + 0.5 * q, mean, scale)
    likelihood = low_bound(jnp.abs(upper - lower))
    return -jnp.log2(likelihood)


def binary_entropy_bits(binary_pm1: jnp.ndarray):
    """Total bits to code a {-1,+1} (or {0,1}) tensor with its empirical
    Bernoulli probability; returns (p_one, total_bits).

    Matches get_binary_vxl_size (encodings.py:17-33) including the +32 bits
    for storing the probability itself.
    """
    x01 = (binary_pm1 > 0).astype(jnp.float32)
    n = x01.size
    pos = jnp.sum(x01)
    p = jnp.clip(pos / n, 1e-6, 1.0 - 1e-6)
    bits = pos * (-jnp.log2(p)) + (n - pos) * (-jnp.log2(1.0 - p))
    return p, bits + 32.0
