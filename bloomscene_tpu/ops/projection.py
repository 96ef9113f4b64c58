"""Per-Gaussian projection ("preprocess") — vectorized, differentiable.

Computes, for every Gaussian: view depth, 2D pixel mean, 2D conic (inverse
covariance) via EWA splatting, 3-sigma screen radius, and validity mask.

Semantics replicate the reference CUDA preprocess
(submodules/depth-diff-gaussian-rasterization/cuda_rasterizer/forward.cu:
118-152 ``computeCov3D``, :74-113 ``computeCov2D``, :156-256
``preprocessCUDA``) exactly:

- cov3D = R diag(s)^2 R^T with the quaternion taken as-is (the neural decode
  normalizes it beforehand, as the reference renderer does).
- EWA: view point clamped to 1.3*tan(fov) frustum cone before the Jacobian,
  cov2D = J W Sigma W^T J^T with the +0.3 px low-pass on the diagonal.
- radius = ceil(3 * sqrt(max eigenvalue)), eigenvalues via
  mid +- sqrt(max(0.1, mid^2 - det)).
- near-cull at view z <= 0.2 (auxiliary.h:154).

Instead of the CUDA early-return control flow we compute everything densely
and return a boolean ``valid`` mask — invalid Gaussians get radius 0 and
contribute exactly zero downstream (XLA-friendly static shapes).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .graphics import quat_to_rotmat


class ProjectedSplats(NamedTuple):
    """Per-Gaussian screen-space quantities (all [N, ...])."""
    mean2d: jnp.ndarray    # [N, 2] pixel coords
    depth: jnp.ndarray     # [N] view-space z
    conic: jnp.ndarray     # [N, 3] inverse 2D covariance (a, b, c)
    radius: jnp.ndarray    # [N] int32 3-sigma pixel radius (0 = culled)
    valid: jnp.ndarray     # [N] bool


def build_cov3d(scales: jnp.ndarray, quats: jnp.ndarray,
                scale_modifier: float = 1.0) -> jnp.ndarray:
    """3D covariance upper-triangular packing [N, 6]: (xx, xy, xz, yy, yz, zz).

    Matches CUDA ``computeCov3D`` (forward.cu:118-152): Sigma = R S^2 R^T.
    """
    R = quat_to_rotmat(quats)                       # [N, 3, 3]
    S2 = (scale_modifier * scales) ** 2             # [N, 3]
    cov = jnp.einsum('nij,nj,nkj->nik', R, S2, R)   # R S^2 R^T
    return jnp.stack([cov[:, 0, 0], cov[:, 0, 1], cov[:, 0, 2],
                      cov[:, 1, 1], cov[:, 1, 2], cov[:, 2, 2]], -1)


def _cov3d_to_mat(cov6: jnp.ndarray) -> jnp.ndarray:
    xx, xy, xz, yy, yz, zz = (cov6[:, i] for i in range(6))
    return jnp.stack([
        jnp.stack([xx, xy, xz], -1),
        jnp.stack([xy, yy, yz], -1),
        jnp.stack([xz, yz, zz], -1)], -2)


def ewa_cov2d(means3d: jnp.ndarray, cov6: jnp.ndarray, viewmat: jnp.ndarray,
              focal_x: float, focal_y: float,
              tan_fovx: float, tan_fovy: float) -> jnp.ndarray:
    """Project 3D covariance to 2D screen covariance [N, 3] = (a, b, c).

    Matches CUDA ``computeCov2D`` (forward.cu:74-113) including the frustum
    clamp and +0.3 low-pass filter.
    """
    W = viewmat[:3, :3]                              # world->view rotation
    t = means3d @ W.T + viewmat[:3, 3]               # view-space positions
    tz = t[:, 2]
    limx, limy = 1.3 * tan_fovx, 1.3 * tan_fovy
    tx = jnp.clip(t[:, 0] / tz, -limx, limx) * tz
    ty = jnp.clip(t[:, 1] / tz, -limy, limy) * tz

    # Jacobian of perspective projection (row-major math convention).
    zero = jnp.zeros_like(tz)
    J = jnp.stack([
        jnp.stack([focal_x / tz, zero, -(focal_x * tx) / (tz * tz)], -1),
        jnp.stack([zero, focal_y / tz, -(focal_y * ty) / (tz * tz)], -1),
    ], -2)                                           # [N, 2, 3]

    Sigma = _cov3d_to_mat(cov6)                      # [N, 3, 3]
    JW = jnp.einsum('nij,jk->nik', J, W)             # [N, 2, 3]
    cov2d = jnp.einsum('nij,njk,nlk->nil', JW, Sigma, JW)  # [N, 2, 2]
    a = cov2d[:, 0, 0] + 0.3
    b = cov2d[:, 0, 1]
    c = cov2d[:, 1, 1] + 0.3
    return jnp.stack([a, b, c], -1)


def project_gaussians(means3d: jnp.ndarray,
                      cov6: jnp.ndarray,
                      viewmat: jnp.ndarray,
                      projmat: jnp.ndarray,
                      W: int, H: int,
                      focal_x: float, focal_y: float,
                      tan_fovx: float, tan_fovy: float,
                      near: float = 0.2) -> ProjectedSplats:
    """Full preprocess. ``projmat`` is proj @ viewmat (math convention)."""
    ones = jnp.ones_like(means3d[:, :1])
    hom = jnp.concatenate([means3d, ones], -1)       # [N, 4]
    p_view = hom @ viewmat.T                         # [N, 4]
    depth = p_view[:, 2]

    p_hom = hom @ projmat.T                          # [N, 4]
    p_w = 1.0 / (p_hom[:, 3] + 1e-7)
    p_proj = p_hom[:, :3] * p_w[:, None]

    mean2d = jnp.stack([((p_proj[:, 0] + 1.0) * W - 1.0) * 0.5,
                        ((p_proj[:, 1] + 1.0) * H - 1.0) * 0.5], -1)

    cov2d = ewa_cov2d(means3d, cov6, viewmat, focal_x, focal_y,
                      tan_fovx, tan_fovy)
    a, b, c = cov2d[:, 0], cov2d[:, 1], cov2d[:, 2]
    det = a * c - b * b
    det_safe = jnp.where(det == 0.0, 1.0, det)
    conic = jnp.stack([c, -b, a], -1) / det_safe[:, None]

    mid = 0.5 * (a + c)
    lam = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius_f = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lam, 0.0)))

    # on-screen test: does the 3-sigma box intersect the image at all?
    # (CUDA derives this from the tile rect being non-empty, getRect
    # auxiliary.h:46-56 with grid clamping; equivalent to a box test.)
    x, y = mean2d[:, 0], mean2d[:, 1]
    on_screen = ((x + radius_f >= 0) & (x - radius_f < W) &
                 (y + radius_f >= 0) & (y - radius_f < H))
    valid = (depth > near) & (det > 0.0) & on_screen & (radius_f > 0)

    radius = jnp.where(valid, radius_f, 0.0).astype(jnp.int32)
    return ProjectedSplats(mean2d=mean2d, depth=depth, conic=conic,
                           radius=radius, valid=valid)
