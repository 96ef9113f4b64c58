"""Camera and projective-geometry math (pure JAX, differentiable).

Semantics match the reference's conventions so renders are comparable:
- world->view matrix built from (R, t) as in reference utils/graphics.py:35-54
  (R is camera-to-world rotation; the matrix stores R^T and t).
- OpenGL-style asymmetric-free projection with z in [0, zfar/(zfar-znear)]
  range as in reference utils/graphics.py:57-77.
- NDC -> pixel mapping ``((v + 1) * S - 1) / 2`` as in the CUDA rasterizer
  (reference submodules/depth-diff-gaussian-rasterization/cuda_rasterizer/
  auxiliary.h:41-44).

All functions are jnp-native and differentiable; matrices use standard math
convention (``y = M @ x``), NOT torch's transposed storage. Where the
reference multiplies ``p^T @ M_transposed`` we multiply ``M @ p`` — identical
results, idiomatic JAX.
"""
from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion(s) (w, x, y, z) -> rotation matrix (..., 3, 3).

    Same component convention as the reference CUDA ``computeCov3D``
    (forward.cu:127-138): q = (r, x, y, z), NOT normalized here (normalize
    before calling if needed — the renderer normalizes, the cov path does not).
    """
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    R = jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y)], -1),
        jnp.stack([2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x)], -1),
        jnp.stack([2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y)], -1),
    ], -2)
    return R


def normalize_quat(q: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), eps)


def build_scaling_rotation(s: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """L = R @ diag(s): (..., 3, 3). Reference utils/general.py:110-121."""
    R = quat_to_rotmat(normalize_quat(q))
    return R * s[..., None, :]


def world_to_view(R: np.ndarray, t: np.ndarray,
                  translate: np.ndarray | None = None,
                  scale: float = 1.0) -> np.ndarray:
    """4x4 world->view matrix. Reference utils/graphics.py:43-54.

    ``R`` is the camera rotation as stored by the dataset readers (such that
    W2V[:3,:3] = R^T), ``t`` the world->view translation.
    """
    Rt = np.zeros((4, 4), dtype=np.float64)
    Rt[:3, :3] = np.asarray(R).T
    Rt[:3, 3] = np.asarray(t)
    Rt[3, 3] = 1.0
    if translate is not None or scale != 1.0:
        translate = np.zeros(3) if translate is None else translate
        C2W = np.linalg.inv(Rt)
        C2W[:3, 3] = (C2W[:3, 3] + translate) * scale
        Rt = np.linalg.inv(C2W)
    return Rt.astype(np.float32)


def projection_matrix(znear: float, zfar: float,
                      fovx: float, fovy: float) -> np.ndarray:
    """4x4 perspective projection. Reference utils/graphics.py:57-77.

    Maps view-space z to [z*zfar/(zfar-znear) - zfar*znear/(zfar-znear)] / z
    with w = z (z_sign=+1, camera looks down +z).
    """
    t = math.tan(fovy / 2)
    r = math.tan(fovx / 2)
    P = np.zeros((4, 4), dtype=np.float32)
    P[0, 0] = 1.0 / r
    P[1, 1] = 1.0 / t
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    P[3, 2] = 1.0
    return P


def fov2focal(fov: float, pixels: int) -> float:
    return pixels / (2 * math.tan(fov / 2))


def focal2fov(focal: float, pixels: int) -> float:
    return 2 * math.atan(pixels / (2 * focal))


def ndc_to_pix(v: jnp.ndarray, size: int) -> jnp.ndarray:
    """NDC [-1,1] -> pixel center coords. CUDA auxiliary.h:41-44."""
    return ((v + 1.0) * size - 1.0) * 0.5


def transform_points(M: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply 4x4 ``M`` to (..., 3) points, returning homogeneous (..., 4)."""
    return pts @ M[:3, :3].T + M[:3, 3] if M.shape == (3, 4) else (
        jnp.concatenate([pts, jnp.ones_like(pts[..., :1])], -1) @ M.T)
