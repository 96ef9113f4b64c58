"""Golden rasterizer: semantic + gradient (finite-difference) tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bloomscene_tpu.ops import graphics, projection
from bloomscene_tpu.ops.reference_rasterizer import rasterize_reference


def make_camera(W=32, H=32, fovx=1.0, fovy=1.0):
    view = graphics.world_to_view(np.eye(3), np.zeros(3))
    proj = graphics.projection_matrix(0.01, 100.0, fovx, fovy)
    return (jnp.asarray(view), jnp.asarray(proj @ view),
            graphics.fov2focal(fovx, W), graphics.fov2focal(fovy, H),
            np.tan(fovx / 2), np.tan(fovy / 2))


def random_scene(rng, n=50, W=32, H=32):
    means = np.stack([rng.uniform(-1, 1, n), rng.uniform(-1, 1, n),
                      rng.uniform(1.0, 4.0, n)], -1).astype(np.float32)
    scales = rng.uniform(0.05, 0.3, (n, 3)).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    opac = rng.uniform(0.2, 0.95, n).astype(np.float32)
    return means, scales, quats, colors, opac


def render(means, scales, quats, colors, opac, bg=None, W=32, H=32):
    view, full, fx, fy, tx, ty = make_camera(W, H)
    cov6 = projection.build_cov3d(scales, quats)
    proj = projection.project_gaussians(means, cov6, view, full, W, H,
                                        fx, fy, tx, ty)
    bg = jnp.zeros(3) if bg is None else bg
    return rasterize_reference(proj, colors, opac, bg, W, H)


def test_empty_scene_is_background(rng):
    means = jnp.zeros((4, 3)) + jnp.array([0.0, 0.0, -5.0])  # all behind
    out = render(means, jnp.full((4, 3), 0.1),
                 jnp.tile(jnp.array([1.0, 0, 0, 0]), (4, 1)),
                 jnp.ones((4, 3)), jnp.ones(4), bg=jnp.array([0.2, 0.4, 0.6]))
    np.testing.assert_allclose(out.color,
                               np.broadcast_to([0.2, 0.4, 0.6], (32, 32, 3)),
                               atol=1e-6)
    np.testing.assert_allclose(out.depth, 0.0, atol=1e-6)
    np.testing.assert_allclose(out.final_T, 1.0, atol=1e-6)


def test_single_opaque_gaussian_center():
    """A big opaque splat at center: center pixel ~ its color, depth ~ its z."""
    means = jnp.array([[0.0, 0.0, 2.0]])
    out = render(means, jnp.array([[0.5, 0.5, 0.5]]),
                 jnp.array([[1.0, 0, 0, 0]]),
                 jnp.array([[1.0, 0.0, 0.0]]), jnp.array([0.99]))
    c = np.asarray(out.color[15:17, 15:17])
    assert c[..., 0].min() > 0.9
    assert c[..., 1].max() < 0.05
    d = np.asarray(out.depth[15:17, 15:17])
    np.testing.assert_allclose(d, 2.0, atol=1e-3)


def test_occlusion_order():
    """Front opaque splat must hide the back one regardless of input order."""
    means = jnp.array([[0.0, 0.0, 1.5], [0.0, 0.0, 3.0]])
    scales = jnp.full((2, 3), 0.5)
    quats = jnp.tile(jnp.array([1.0, 0, 0, 0]), (2, 1))
    colors = jnp.array([[0.0, 1.0, 0.0], [1.0, 0.0, 0.0]])
    opac = jnp.array([0.99, 0.99])
    out_fwd = render(means, scales, quats, colors, opac)
    out_rev = render(means[::-1], scales, quats, colors[::-1], opac)
    np.testing.assert_allclose(out_fwd.color, out_rev.color, atol=1e-5)
    # center is green (front splat)
    assert float(out_fwd.color[16, 16, 1]) > 0.9
    assert float(out_fwd.color[16, 16, 0]) < 0.05
    # back splat still gets weight ~0.99*(1-0.99) => weighted mean ~1.515
    np.testing.assert_allclose(float(out_fwd.depth[16, 16]), 1.515, atol=2e-2)


def test_alpha_composition_two_layers():
    """Check C = c1*a1 + c2*a2*(1-a1) analytically at the center pixel."""
    means = jnp.array([[0.0, 0.0, 2.0], [0.0, 0.0, 4.0]])
    scales = jnp.full((2, 3), 1.0)
    quats = jnp.tile(jnp.array([1.0, 0, 0, 0]), (2, 1))
    colors = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    opac = jnp.array([0.5, 0.5])
    out = render(means, scales, quats, colors, opac)
    # at the exact projected center, power=0 => alpha=opacity (mean2d=15.5 for
    # W=32; pixel (15,16) has dx=0.5 -> tiny falloff, so allow tolerance)
    c = np.asarray(out.color)[16, 16]
    a1 = a2 = 0.5
    # alpha at pixel slightly below opacity due to 0.5px offset; loose check
    assert abs(c[0] - a1) < 0.05
    assert abs(c[1] - a2 * (1 - a1)) < 0.05


def test_depth_weighted_mean():
    """Depth output is alpha-T-weighted mean of splat depths (acc>0.5)."""
    means = jnp.array([[0.0, 0.0, 2.0], [0.0, 0.0, 4.0]])
    scales = jnp.full((2, 3), 1.0)
    quats = jnp.tile(jnp.array([1.0, 0, 0, 0]), (2, 1))
    colors = jnp.ones((2, 3))
    opac = jnp.array([0.6, 0.9])
    out = render(means, scales, quats, colors, opac)
    d = float(out.depth[16, 16])
    # analytic-ish: w1≈0.6, w2≈0.9*0.4=0.36 -> d≈(0.6*2+0.36*4)/0.96=2.75
    assert 2.4 < d < 3.1


def test_saturated_pixel_terminates():
    """Many stacked opaque splats: T must floor near T_EPS, color bounded."""
    n = 40
    means = jnp.stack([jnp.zeros(n), jnp.zeros(n),
                       jnp.linspace(1.0, 5.0, n)], -1)
    scales = jnp.full((n, 3), 0.8)
    quats = jnp.tile(jnp.array([1.0, 0, 0, 0]), (n, 1))
    colors = jnp.ones((n, 3))
    opac = jnp.full(n, 0.9)
    out = render(means, scales, quats, colors, opac)
    assert float(out.final_T[16, 16]) < 1e-3
    assert np.asarray(out.color).max() <= 1.0 + 1e-4


def test_gradients_finite_difference(rng):
    """Analytic grads (autodiff through the scan) vs central differences,
    including the DEPTH path the reference CUDA backward drops."""
    means, scales, quats, colors, opac = random_scene(rng, n=12)
    view, full, fx, fy, tx, ty = make_camera()
    tgt_c = jnp.asarray(rng.uniform(0, 1, (32, 32, 3)).astype(np.float32))
    tgt_d = jnp.asarray(rng.uniform(1, 4, (32, 32)).astype(np.float32))

    def loss(params):
        m, s, o, c = params
        cov6 = projection.build_cov3d(s, jnp.asarray(quats))
        proj = projection.project_gaussians(m, cov6, view, full, 32, 32,
                                            fx, fy, tx, ty)
        out = rasterize_reference(proj, c, o, jnp.zeros(3), 32, 32)
        return (jnp.mean((out.color - tgt_c) ** 2)
                + 0.5 * jnp.mean((out.depth - tgt_d) ** 2))

    params = (jnp.asarray(means), jnp.asarray(scales),
              jnp.asarray(opac), jnp.asarray(colors))
    g = jax.grad(loss)(params)
    for gi in g:
        assert np.all(np.isfinite(np.asarray(gi)))
    # central finite differences on a few coordinates of means and opacity
    f0 = loss(params)
    eps = 1e-3
    checked = 0
    for (pi, idx) in [(0, (0, 0)), (0, (3, 2)), (2, (1,)), (2, (5,)),
                      (3, (2, 1)), (1, (4, 0))]:
        p_list = [np.array(p) for p in params]
        p_plus = [p.copy() for p in p_list]
        p_minus = [p.copy() for p in p_list]
        p_plus[pi][idx] += eps
        p_minus[pi][idx] -= eps
        fp = loss(tuple(jnp.asarray(p) for p in p_plus))
        fm = loss(tuple(jnp.asarray(p) for p in p_minus))
        fd = (float(fp) - float(fm)) / (2 * eps)
        an = float(np.asarray(g[pi])[idx])
        # blend has hard thresholds; tolerate small abs error near kinks
        assert abs(fd - an) < 5e-3 + 0.05 * abs(fd), (
            f"param {pi} idx {idx}: fd={fd} analytic={an}")
        checked += 1
    assert checked == 6


def test_depth_gradient_nonzero(rng):
    """Depth loss alone must produce nonzero grads on means (z) — this is the
    capability intentionally missing from the reference CUDA backward."""
    means, scales, quats, colors, opac = random_scene(rng, n=8)
    view, full, fx, fy, tx, ty = make_camera()

    def loss(m):
        cov6 = projection.build_cov3d(jnp.asarray(scales), jnp.asarray(quats))
        proj = projection.project_gaussians(m, cov6, view, full, 32, 32,
                                            fx, fy, tx, ty)
        out = rasterize_reference(proj, jnp.asarray(colors),
                                  jnp.asarray(opac), jnp.zeros(3), 32, 32)
        return jnp.mean(out.depth ** 2)

    g = jax.grad(loss)(jnp.asarray(means))
    assert np.abs(np.asarray(g)[:, 2]).sum() > 1e-6
