"""Ring-ppermute splat/strip exchange vs the golden rasterizer (8-dev CPU mesh)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from bloomscene_tpu.ops import graphics, projection
from bloomscene_tpu.ops.reference_rasterizer import rasterize_reference
from bloomscene_tpu.parallel.ring import ring_render


def _scene(n, seed=0, max_opac=0.35):
    rng = np.random.default_rng(seed)
    means = np.stack([rng.uniform(-1.2, 1.2, n), rng.uniform(-1.2, 1.2, n),
                      rng.uniform(0.8, 6.0, n)], -1).astype(np.float32)
    scales = rng.uniform(0.01, 0.08, (n, 3)).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    opac = rng.uniform(0.05, max_opac, n).astype(np.float32)
    return means, scales, quats, colors, opac


def _project(means, scales, quats, W, H):
    fovx = fovy = 1.0
    view = jnp.asarray(graphics.world_to_view(np.eye(3), np.zeros(3)))
    full = jnp.asarray(np.asarray(graphics.projection_matrix(
        0.01, 100.0, fovx, fovy)) @ np.asarray(view))
    fx = graphics.fov2focal(fovx, W)
    fy = graphics.fov2focal(fovy, H)
    tx = ty = float(np.tan(fovx / 2))
    cov6 = projection.build_cov3d(jnp.asarray(scales), jnp.asarray(quats))
    return projection.project_gaussians(jnp.asarray(means), cov6, view,
                                        full, W, H, fx, fy, tx, ty)


@pytest.mark.parametrize("n,seed", [(64, 0), (128, 3)])
def test_ring_render_matches_reference(n, seed):
    n_dev = len(jax.devices())
    assert n_dev == 8, "test expects the 8-device CPU mesh from conftest"
    mesh = Mesh(np.array(jax.devices()), ('ring',))
    W = H = 32
    means, scales, quats, colors, opac = _scene(n, seed)
    proj = _project(means, scales, quats, W, H)
    bg = jnp.asarray([0.1, 0.2, 0.3], jnp.float32)

    ref = rasterize_reference(proj, jnp.asarray(colors), jnp.asarray(opac),
                              bg, W, H, tile=None)
    # precondition for exactness: the reference's early-termination path
    # (T < 1e-4) must never trigger in this scene (see ring.py docstring)
    assert float(jnp.min(ref.final_T)) > 2e-4

    col, dep = ring_render(proj, jnp.asarray(colors), jnp.asarray(opac),
                           bg, W, H, mesh, axis='ring')
    np.testing.assert_allclose(np.asarray(col), np.asarray(ref.color),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(dep), np.asarray(ref.depth),
                               atol=1e-4, rtol=1e-4)


def test_ring_render_rejects_indivisible():
    mesh = Mesh(np.array(jax.devices()), ('ring',))
    W = H = 30  # 30 % 8 != 0
    means, scales, quats, colors, opac = _scene(64)
    proj = _project(means, scales, quats, W, H)
    with pytest.raises(ValueError):
        ring_render(proj, jnp.asarray(colors), jnp.asarray(opac),
                    jnp.zeros(3), W, H, mesh)


@pytest.mark.parametrize("n,seed", [(64, 0), (128, 3)])
def test_ring_render_grads_match_reference(n, seed):
    """BACKWARD ring exchange (VERDICT r4 item 4a): autodiff through the
    ring derives the reverse schedule — grad accumulators ppermute the
    ring backwards while each device back-blends its resident depth
    slice — and the resulting splat gradients must equal the golden
    rasterizer's. Exactness precondition as in the forward test (no
    early termination in the scene)."""
    n_dev = len(jax.devices())
    assert n_dev == 8, "test expects the 8-device CPU mesh from conftest"
    mesh = Mesh(np.array(jax.devices()), ('ring',))
    W = H = 32
    means, scales, quats, colors, opac = _scene(n, seed)
    proj = _project(means, scales, quats, W, H)
    bg = jnp.asarray([0.1, 0.2, 0.3], jnp.float32)
    rng = np.random.default_rng(seed + 100)
    tgt_c = jnp.asarray(rng.uniform(0, 1, (H, W, 3)).astype(np.float32))
    tgt_d = jnp.asarray(rng.uniform(0, 5, (H, W)).astype(np.float32))

    def loss_ring(mean2d, conic, col, op):
        p = proj._replace(mean2d=mean2d, conic=conic)
        c, d = ring_render(p, col, op, bg, W, H, mesh, axis='ring')
        return jnp.mean((c - tgt_c) ** 2) + 0.3 * jnp.mean((d - tgt_d) ** 2)

    def loss_ref(mean2d, conic, col, op):
        p = proj._replace(mean2d=mean2d, conic=conic)
        out = rasterize_reference(p, col, op, bg, W, H, tile=None)
        return (jnp.mean((out.color - tgt_c) ** 2)
                + 0.3 * jnp.mean((out.depth - tgt_d) ** 2))

    args = (proj.mean2d, proj.conic, jnp.asarray(colors),
            jnp.asarray(opac))
    ref_val = loss_ref(*args)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(*args)
    ring_val = loss_ring(*args)
    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2, 3))(*args)

    np.testing.assert_allclose(float(ring_val), float(ref_val),
                               rtol=1e-5, atol=1e-7)
    names = ('mean2d', 'conic', 'colors', 'opac')
    for nm, a, b in zip(names, g_ring, g_ref):
        a, b = np.asarray(a), np.asarray(b)
        assert np.isfinite(a).all(), nm
        scale = np.maximum(np.abs(b).max(), 1e-8)
        np.testing.assert_allclose(a, b, atol=3e-5 * scale, rtol=2e-4,
                                   err_msg=f"grad mismatch: {nm}")
