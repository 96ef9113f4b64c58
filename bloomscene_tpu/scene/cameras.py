"""Camera containers (reference scene/cameras.py:20-78) — functional.

A ``Camera`` bundles static ints (W, H) with jnp matrices in *math*
convention (``y = M @ x``): where the reference stores transposed matrices
for torch's row-vector convention (cameras.py:59-61), we keep the plain
world->view and proj @ view products; the rasterizer consumes them directly.
"""
from __future__ import annotations

import dataclasses
import math
from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from ..ops import graphics

ZNEAR = 0.01   # cameras.py:54
ZFAR = 100.0   # cameras.py:53


@dataclasses.dataclass(frozen=True)
class Intrinsics:
    """Hashable static camera parameters (safe as a jit static arg)."""
    width: int
    height: int
    fovx: float
    fovy: float

    @property
    def tan_fovx(self) -> float:
        return math.tan(self.fovx / 2)

    @property
    def tan_fovy(self) -> float:
        return math.tan(self.fovy / 2)

    @property
    def focal_x(self) -> float:
        return graphics.fov2focal(self.fovx, self.width)

    @property
    def focal_y(self) -> float:
        return graphics.fov2focal(self.fovy, self.height)


@dataclasses.dataclass(frozen=True)
class Camera:
    """One (possibly supervised) viewpoint."""
    width: int
    height: int
    fovx: float
    fovy: float
    viewmat: np.ndarray            # [4,4] world -> view
    image: Optional[np.ndarray] = None    # [H, W, 3] float in [0,1]
    depth: Optional[np.ndarray] = None    # [H, W] supervision depth
    name: str = ""

    @property
    def projmat(self) -> np.ndarray:
        return graphics.projection_matrix(ZNEAR, ZFAR, self.fovx, self.fovy)

    @property
    def full_proj(self) -> np.ndarray:
        return (self.projmat @ self.viewmat).astype(np.float32)

    @property
    def camera_center(self) -> np.ndarray:
        return np.linalg.inv(self.viewmat)[:3, 3].astype(np.float32)

    @property
    def tan_fovx(self) -> float:
        return math.tan(self.fovx / 2)

    @property
    def tan_fovy(self) -> float:
        return math.tan(self.fovy / 2)

    @property
    def focal_x(self) -> float:
        return graphics.fov2focal(self.fovx, self.width)

    @property
    def focal_y(self) -> float:
        return graphics.fov2focal(self.fovy, self.height)

    @property
    def intrinsics(self) -> Intrinsics:
        return Intrinsics(self.width, self.height, self.fovx, self.fovy)

    def device_arrays(self) -> "CameraArrays":
        return CameraArrays(
            viewmat=jnp.asarray(self.viewmat, jnp.float32),
            full_proj=jnp.asarray(self.full_proj, jnp.float32),
            camera_center=jnp.asarray(self.camera_center, jnp.float32))


class CameraArrays(NamedTuple):
    """Traced camera tensors (NamedTuple = pytree)."""
    viewmat: jnp.ndarray
    full_proj: jnp.ndarray
    camera_center: jnp.ndarray


def camera_from_rt(R: np.ndarray, t: np.ndarray, fovx: float, fovy: float,
                   width: int, height: int, image=None, depth=None,
                   trans=None, scale: float = 1.0, name: str = "") -> Camera:
    """Build from the reference's (R, T) convention (cameras.py:59)."""
    viewmat = graphics.world_to_view(R, t, translate=trans, scale=scale)
    return Camera(width=width, height=height, fovx=fovx, fovy=fovy,
                  viewmat=viewmat, image=image, depth=depth, name=name)
