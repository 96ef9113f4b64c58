"""Spherical-harmonics view-dependent color (degrees 0-3), differentiable.

The reference rasterizer evaluates SH per Gaussian inside preprocess when
``colors_precomp`` is not given (computeColorFromSH,
submodules/depth-diff-gaussian-rasterization/cuda_rasterizer/forward.cu:20-72,
called at :243) and back-propagates through the clamp, the basis, and the
direction-normalization chain to both the SH coefficients and the means
(computeColorFromSH backward, backward.cu:20-142). BloomScene itself always
passes precomputed MLP colors so the path is dead in its pipeline
(gaussian_renderer/__init__.py:257-258) — but it is part of the rasterizer
contract (BASELINE.json north star: full analytic gradients incl. SH), so it
exists here as a first-class op.

TPU-native design: one fused jnp expression over [N, M, 3] coefficient
arrays (a handful of VPU-friendly elementwise ops + one weighted reduction
over the basis axis — XLA fuses the whole thing into the surrounding decode),
with plain autodiff supplying exactly the reference's analytic gradients:
``max(result, 0)`` reproduces the clamp-mask zeroing of backward.cu:29-37,
and differentiating through ``dir/|dir|`` reproduces dnormvdv
(backward.cu:116-140). No custom VJP needed — the math is closed-form.
"""
from __future__ import annotations

import jax.numpy as jnp

# basis constants (auxiliary.h:27-46)
SH_C0 = 0.28209479177387814
SH_C1 = 0.4886025119029199
SH_C2 = (1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
         -1.0925484305920792, 0.5462742152960396)
SH_C3 = (-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
         0.3731763325901154, -0.4570457994644658, 1.445305721320277,
         -0.5900435899266435)


def num_sh_coeffs(degree: int) -> int:
    return (degree + 1) ** 2


def sh_basis(degree: int, dirs: jnp.ndarray) -> jnp.ndarray:
    """SH basis values for unit directions ``dirs`` [N, 3] -> [N, M].

    Matches the (hard-coded, not Condon-Shortley-general) polynomial of
    forward.cu:30-60 term by term.
    """
    if not 0 <= degree <= 3:
        raise ValueError(f"SH degree must be in [0, 3], got {degree}")
    x, y, z = dirs[:, 0], dirs[:, 1], dirs[:, 2]
    one = jnp.ones_like(x)
    cols = [SH_C0 * one]
    if degree >= 1:
        cols += [-SH_C1 * y, SH_C1 * z, -SH_C1 * x]
    if degree >= 2:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        cols += [SH_C2[0] * xy, SH_C2[1] * yz,
                 SH_C2[2] * (2.0 * zz - xx - yy),
                 SH_C2[3] * xz, SH_C2[4] * (xx - yy)]
    if degree >= 3:
        cols += [SH_C3[0] * y * (3.0 * xx - yy),
                 SH_C3[1] * xy * z,
                 SH_C3[2] * y * (4.0 * zz - xx - yy),
                 SH_C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy),
                 SH_C3[4] * x * (4.0 * zz - xx - yy),
                 SH_C3[5] * z * (xx - yy),
                 SH_C3[6] * x * (xx - 3.0 * yy)]
    return jnp.stack(cols, axis=-1)


def eval_sh(degree: int, sh_coeffs: jnp.ndarray, means: jnp.ndarray,
            campos: jnp.ndarray) -> jnp.ndarray:
    """View-dependent RGB from SH coefficients (computeColorFromSH).

    sh_coeffs [N, M, 3] with M >= (degree+1)^2 (extra coefficients are
    ignored, like the reference's max_coeffs vs deg split), means [N, 3],
    campos [3] -> colors [N, 3] in [0, inf), clamped at 0 from below with
    the +0.5 offset of forward.cu:63. Differentiable w.r.t. sh_coeffs AND
    means (through the normalized view direction), reproducing
    backward.cu:20-142 semantics via autodiff.
    """
    d = means - campos[None, :]
    dir = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    basis = sh_basis(degree, dir)                          # [N, M]
    m = num_sh_coeffs(degree)
    result = jnp.einsum('nm,nmc->nc', basis, sh_coeffs[:, :m, :]) + 0.5
    return jnp.maximum(result, 0.0)


def sh_clamp_mask(degree: int, sh_coeffs: jnp.ndarray, means: jnp.ndarray,
                  campos: jnp.ndarray) -> jnp.ndarray:
    """The per-channel clamp flags the reference records for its backward
    (forward.cu:66-70). Exposed for parity tests; autodiff through
    eval_sh's max() applies the identical masking implicitly."""
    d = means - campos[None, :]
    dir = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    basis = sh_basis(degree, dir)
    m = num_sh_coeffs(degree)
    result = jnp.einsum('nm,nmc->nc', basis, sh_coeffs[:, :m, :]) + 0.5
    return result < 0.0
