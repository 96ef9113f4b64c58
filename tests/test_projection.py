"""Projection / camera math unit tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bloomscene_tpu.ops import graphics, projection


def make_camera(W=64, H=64, fovx=1.0, fovy=1.0, znear=0.01, zfar=100.0):
    R = np.eye(3)
    t = np.zeros(3)
    view = graphics.world_to_view(R, t)
    proj = graphics.projection_matrix(znear, zfar, fovx, fovy)
    full = proj @ view
    fx = graphics.fov2focal(fovx, W)
    fy = graphics.fov2focal(fovy, H)
    return view, full, fx, fy, np.tan(fovx / 2), np.tan(fovy / 2)


def test_quat_identity():
    q = jnp.array([1.0, 0, 0, 0])
    np.testing.assert_allclose(graphics.quat_to_rotmat(q), np.eye(3), atol=1e-6)


def test_quat_90deg_z():
    # 90 deg about z: (cos45, 0, 0, sin45)
    s = np.sqrt(0.5)
    q = jnp.array([s, 0.0, 0.0, s])
    R = np.asarray(graphics.quat_to_rotmat(q))
    expected = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], dtype=np.float32)
    np.testing.assert_allclose(R, expected, atol=1e-6)


def test_cov3d_isotropic():
    scales = jnp.array([[0.5, 0.5, 0.5]])
    quats = jnp.array([[1.0, 0, 0, 0]])
    cov6 = projection.build_cov3d(scales, quats)
    np.testing.assert_allclose(
        cov6[0], [0.25, 0, 0, 0.25, 0, 0.25], atol=1e-6)


def test_cov3d_rotation_invariance_isotropic(rng):
    """Isotropic covariance must be invariant to rotation."""
    q = rng.normal(size=(5, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    scales = jnp.full((5, 3), 0.3)
    cov6 = projection.build_cov3d(scales, jnp.asarray(q))
    expected = np.tile([0.09, 0, 0, 0.09, 0, 0.09], (5, 1))
    np.testing.assert_allclose(cov6, expected, atol=1e-3)


def test_cov3d_anisotropic_axis_aligned():
    scales = jnp.array([[1.0, 2.0, 3.0]])
    quats = jnp.array([[1.0, 0, 0, 0]])
    cov6 = projection.build_cov3d(scales, quats)
    np.testing.assert_allclose(cov6[0], [1, 0, 0, 4, 0, 9], atol=1e-5)


def test_project_center_gaussian():
    view, full, fx, fy, tx, ty = make_camera()
    means = jnp.array([[0.0, 0.0, 2.0]])
    cov6 = projection.build_cov3d(jnp.array([[0.1, 0.1, 0.1]]),
                                  jnp.array([[1.0, 0, 0, 0]]))
    out = projection.project_gaussians(means, cov6, jnp.asarray(view),
                                       jnp.asarray(full), 64, 64,
                                       fx, fy, tx, ty)
    assert bool(out.valid[0])
    # image center in the ndc2Pix convention: ((0+1)*64-1)/2 = 31.5
    np.testing.assert_allclose(out.mean2d[0], [31.5, 31.5], atol=1e-4)
    np.testing.assert_allclose(out.depth[0], 2.0, atol=1e-5)
    assert int(out.radius[0]) > 0


def test_near_cull():
    view, full, fx, fy, tx, ty = make_camera()
    means = jnp.array([[0.0, 0.0, 0.1], [0.0, 0.0, -1.0], [0.0, 0.0, 3.0]])
    cov6 = projection.build_cov3d(jnp.full((3, 3), 0.1),
                                  jnp.tile(jnp.array([1.0, 0, 0, 0]), (3, 1)))
    out = projection.project_gaussians(means, cov6, jnp.asarray(view),
                                       jnp.asarray(full), 64, 64,
                                       fx, fy, tx, ty)
    assert not bool(out.valid[0])   # z=0.1 <= 0.2 near plane
    assert not bool(out.valid[1])   # behind camera
    assert bool(out.valid[2])


def test_offscreen_cull():
    view, full, fx, fy, tx, ty = make_camera()
    # x very large: far outside frustum
    means = jnp.array([[100.0, 0.0, 2.0]])
    cov6 = projection.build_cov3d(jnp.array([[0.01, 0.01, 0.01]]),
                                  jnp.array([[1.0, 0, 0, 0]]))
    out = projection.project_gaussians(means, cov6, jnp.asarray(view),
                                       jnp.asarray(full), 64, 64,
                                       fx, fy, tx, ty)
    assert not bool(out.valid[0])


def test_projection_differentiable():
    view, full, fx, fy, tx, ty = make_camera()

    def f(means):
        cov6 = projection.build_cov3d(jnp.array([[0.1, 0.1, 0.1]]),
                                      jnp.array([[1.0, 0, 0, 0]]))
        out = projection.project_gaussians(means, cov6, jnp.asarray(view),
                                           jnp.asarray(full), 64, 64,
                                           fx, fy, tx, ty)
        return jnp.sum(out.mean2d) + jnp.sum(out.depth)

    g = jax.grad(f)(jnp.array([[0.1, -0.2, 2.0]]))
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.abs(np.asarray(g)).sum() > 0
