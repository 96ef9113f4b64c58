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

TPU note: all the small matrix products here are EXPANDED into per-component
1D arithmetic on [N] arrays. Batched [N,3,3]-style einsums lower to tiny MXU
matmuls with 42-64x layout padding AND bf16 default precision — measured
8.3 ms at N=100K on a v5e, vs 0.3 ms (and full f32 accuracy) for the
expanded form. Do not "clean this up" back into einsums.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

__all__ = ['ProjectedSplats', 'build_cov3d', 'ewa_cov2d',
           'project_gaussians']


class ProjectedSplats(NamedTuple):
    """Per-Gaussian screen-space quantities (all [N, ...])."""
    mean2d: jnp.ndarray    # [N, 2] pixel coords
    depth: jnp.ndarray     # [N] view-space z
    conic: jnp.ndarray     # [N, 3] inverse 2D covariance (a, b, c)
    radius: jnp.ndarray    # [N] int32 3-sigma pixel radius (0 = culled)
    valid: jnp.ndarray     # [N] bool


def _rot_components(quats: jnp.ndarray):
    """Rotation-matrix components for [N, 4] quaternions (w, x, y, z) —
    same formulas as graphics.quat_to_rotmat, kept 1D per component."""
    r, x, y, z = quats[:, 0], quats[:, 1], quats[:, 2], quats[:, 3]
    return (1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y),
            2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x),
            2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y))


def build_cov3d(scales: jnp.ndarray, quats: jnp.ndarray,
                scale_modifier: float = 1.0) -> jnp.ndarray:
    """3D covariance upper-triangular packing [N, 6]: (xx, xy, xz, yy, yz, zz).

    Matches CUDA ``computeCov3D`` (forward.cu:118-152): Sigma = R S^2 R^T.
    """
    (R00, R01, R02, R10, R11, R12, R20, R21, R22) = _rot_components(quats)
    sm = scale_modifier
    s0 = (sm * scales[:, 0]) ** 2
    s1 = (sm * scales[:, 1]) ** 2
    s2 = (sm * scales[:, 2]) ** 2
    xx = R00 * R00 * s0 + R01 * R01 * s1 + R02 * R02 * s2
    xy = R00 * R10 * s0 + R01 * R11 * s1 + R02 * R12 * s2
    xz = R00 * R20 * s0 + R01 * R21 * s1 + R02 * R22 * s2
    yy = R10 * R10 * s0 + R11 * R11 * s1 + R12 * R12 * s2
    yz = R10 * R20 * s0 + R11 * R21 * s1 + R12 * R22 * s2
    zz = R20 * R20 * s0 + R21 * R21 * s1 + R22 * R22 * s2
    return jnp.stack([xx, xy, xz, yy, yz, zz], -1)


def _ewa_cov2d_components(means3d, cov6, viewmat, focal_x, focal_y,
                          tan_fovx, tan_fovy):
    """(a, b, c) 2D-covariance components, each [N] (forward.cu:74-113)."""
    V = viewmat
    mx, my, mz = means3d[:, 0], means3d[:, 1], means3d[:, 2]
    tx_v = V[0, 0] * mx + V[0, 1] * my + V[0, 2] * mz + V[0, 3]
    ty_v = V[1, 0] * mx + V[1, 1] * my + V[1, 2] * mz + V[1, 3]
    tz_v = V[2, 0] * mx + V[2, 1] * my + V[2, 2] * mz + V[2, 3]

    limx, limy = 1.3 * tan_fovx, 1.3 * tan_fovy
    txc = jnp.clip(tx_v / tz_v, -limx, limx) * tz_v
    tyc = jnp.clip(ty_v / tz_v, -limy, limy) * tz_v

    inv_z = 1.0 / tz_v
    inv_z2 = inv_z * inv_z
    # Jacobian of perspective projection (row-major math convention):
    # J = [[fx/z, 0, -fx x/z^2], [0, fy/z, -fy y/z^2]]
    J00 = focal_x * inv_z
    J02 = -(focal_x * txc) * inv_z2
    J11 = focal_y * inv_z
    J12 = -(focal_y * tyc) * inv_z2

    # T = J @ W (2x3), W the world->view rotation
    T00 = J00 * V[0, 0] + J02 * V[2, 0]
    T01 = J00 * V[0, 1] + J02 * V[2, 1]
    T02 = J00 * V[0, 2] + J02 * V[2, 2]
    T10 = J11 * V[1, 0] + J12 * V[2, 0]
    T11 = J11 * V[1, 1] + J12 * V[2, 1]
    T12 = J11 * V[1, 2] + J12 * V[2, 2]

    xx, xy, xz = cov6[:, 0], cov6[:, 1], cov6[:, 2]
    yy, yz, zz = cov6[:, 3], cov6[:, 4], cov6[:, 5]
    # St = Sigma @ T^T (3x2), then cov2d = T @ St (2x2 symmetric)
    St00 = xx * T00 + xy * T01 + xz * T02
    St10 = xy * T00 + yy * T01 + yz * T02
    St20 = xz * T00 + yz * T01 + zz * T02
    St01 = xx * T10 + xy * T11 + xz * T12
    St11 = xy * T10 + yy * T11 + yz * T12
    St21 = xz * T10 + yz * T11 + zz * T12
    a = T00 * St00 + T01 * St10 + T02 * St20 + 0.3
    b = T00 * St01 + T01 * St11 + T02 * St21
    c = T10 * St01 + T11 * St11 + T12 * St21 + 0.3
    return a, b, c


def ewa_cov2d(means3d: jnp.ndarray, cov6: jnp.ndarray, viewmat: jnp.ndarray,
              focal_x: float, focal_y: float,
              tan_fovx: float, tan_fovy: float) -> jnp.ndarray:
    """Project 3D covariance to 2D screen covariance [N, 3] = (a, b, c).

    Matches CUDA ``computeCov2D`` (forward.cu:74-113) including the frustum
    clamp and +0.3 low-pass filter.
    """
    a, b, c = _ewa_cov2d_components(means3d, cov6, viewmat, focal_x,
                                    focal_y, tan_fovx, tan_fovy)
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
    V, F = viewmat, projmat
    mx, my, mz = means3d[:, 0], means3d[:, 1], means3d[:, 2]
    depth = V[2, 0] * mx + V[2, 1] * my + V[2, 2] * mz + V[2, 3]

    hx = F[0, 0] * mx + F[0, 1] * my + F[0, 2] * mz + F[0, 3]
    hy = F[1, 0] * mx + F[1, 1] * my + F[1, 2] * mz + F[1, 3]
    hw = F[3, 0] * mx + F[3, 1] * my + F[3, 2] * mz + F[3, 3]
    p_w = 1.0 / (hw + 1e-7)
    x = ((hx * p_w + 1.0) * W - 1.0) * 0.5      # ndc2Pix (auxiliary.h:41-44)
    y = ((hy * p_w + 1.0) * H - 1.0) * 0.5

    a, b, c = _ewa_cov2d_components(means3d, cov6, viewmat, focal_x,
                                    focal_y, tan_fovx, tan_fovy)
    det = a * c - b * b
    det_safe = jnp.where(det == 0.0, 1.0, det)
    inv_det = 1.0 / det_safe
    conic = jnp.stack([c * inv_det, -b * inv_det, a * inv_det], -1)

    mid = 0.5 * (a + c)
    lam = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius_f = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lam, 0.0)))

    # on-screen test: does the 3-sigma box intersect the image at all?
    # (CUDA derives this from the tile rect being non-empty, getRect
    # auxiliary.h:46-56 with grid clamping; equivalent to a box test.)
    on_screen = ((x + radius_f >= 0) & (x - radius_f < W) &
                 (y + radius_f >= 0) & (y - radius_f < H))
    valid = (depth > near) & (det > 0.0) & on_screen & (radius_f > 0)

    radius = jnp.where(valid, radius_f, 0.0).astype(jnp.int32)
    mean2d = jnp.stack([x, y], -1)
    return ProjectedSplats(mean2d=mean2d, depth=depth, conic=conic,
                           radius=radius, valid=valid)
