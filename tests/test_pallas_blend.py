"""Pallas blend kernels vs the XLA path (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bloomscene_tpu.ops import graphics, projection
from bloomscene_tpu.ops.pallas import blend as pallas_blend
from bloomscene_tpu.ops.tile_rasterizer import rasterize_tiles

W = H = 64
TILE = 16


@pytest.fixture(autouse=True)
def interpret_mode():
    pallas_blend.INTERPRET = True
    yield
    pallas_blend.INTERPRET = False


def make_scene(rng, n=120):
    means = np.stack([rng.uniform(-1.2, 1.2, n), rng.uniform(-1.2, 1.2, n),
                      rng.uniform(0.8, 5.0, n)], -1).astype(np.float32)
    scales = rng.uniform(0.02, 0.25, (n, 3)).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    opac = rng.uniform(0.1, 0.95, n).astype(np.float32)
    view = graphics.world_to_view(np.eye(3), np.zeros(3))
    proj_m = graphics.projection_matrix(0.01, 100.0, 1.0, 1.0) @ view
    fx = graphics.fov2focal(1.0, W)
    t = float(np.tan(0.5))
    cov6 = projection.build_cov3d(jnp.asarray(scales), jnp.asarray(quats))
    p = projection.project_gaussians(jnp.asarray(means), cov6,
                                     jnp.asarray(view), jnp.asarray(proj_m),
                                     W, H, fx, fx, t, t)
    return p, jnp.asarray(colors), jnp.asarray(opac)


def test_pallas_forward_matches_xla(rng):
    p, colors, opac = make_scene(rng)
    bg = jnp.array([0.2, 0.5, 0.8])
    out_x, _ = rasterize_tiles(p, colors, opac, bg, W, H, tile=TILE,
                               tile_capacity=128, backend='xla')
    out_p, _ = rasterize_tiles(p, colors, opac, bg, W, H, tile=TILE,
                               tile_capacity=128, backend='pallas')
    np.testing.assert_allclose(out_p.color, out_x.color, atol=1e-5,
                               rtol=1e-5)
    np.testing.assert_allclose(out_p.depth, out_x.depth, atol=1e-4)
    np.testing.assert_allclose(out_p.final_T, out_x.final_T, atol=1e-5)
    np.testing.assert_allclose(out_p.alpha, out_x.alpha, atol=1e-5)


def test_pallas_backward_matches_xla(rng):
    p, colors, opac = make_scene(rng, n=60)
    bg = jnp.array([0.1, 0.2, 0.3])
    tgt_c = jnp.asarray(rng.uniform(0, 1, (H, W, 3)).astype(np.float32))
    tgt_d = jnp.asarray(rng.uniform(1, 4, (H, W)).astype(np.float32))

    def loss(backend, mean2d, conic, depth, colors, opac, bg):
        pp = p._replace(mean2d=mean2d, conic=conic, depth=depth)
        out, _ = rasterize_tiles(pp, colors, opac, bg, W, H, tile=TILE,
                                 tile_capacity=128, backend=backend)
        return (jnp.mean((out.color - tgt_c) ** 2)
                + 0.5 * jnp.mean((out.depth - tgt_d) ** 2)
                + 0.1 * jnp.mean(out.final_T)
                + 0.05 * jnp.mean(out.alpha))

    args = (p.mean2d, p.conic, p.depth, colors, opac, bg)
    lx = loss('xla', *args)
    lp = loss('pallas', *args)
    np.testing.assert_allclose(float(lx), float(lp), rtol=1e-5)
    gx = jax.grad(lambda *a: loss('xla', *a), argnums=tuple(range(6)))(*args)
    gp = jax.grad(lambda *a: loss('pallas', *a),
                  argnums=tuple(range(6)))(*args)
    names = ['mean2d', 'conic', 'depth', 'colors', 'opac', 'bg']
    for nm, a, b in zip(names, gx, gp):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-6,
                                   rtol=2e-4, err_msg=f"grad {nm}")


def test_backward_with_tile_capacity_truncation_matches_xla(rng):
    """A snug tile_capacity forces per-tile truncation: the emission->lane
    grad index must route truncated pairs to the dump lane (zero grads),
    matching the XLA backend, which masks the same truncated entries."""
    p, colors, opac = make_scene(rng, n=200)
    bg = jnp.array([0.3, 0.1, 0.6])
    tgt_c = jnp.asarray(rng.uniform(0, 1, (H, W, 3)).astype(np.float32))

    def loss(backend, args):
        mean2d, colors, opac = args
        pp = p._replace(mean2d=mean2d)
        out, bins = rasterize_tiles(pp, colors, opac, bg, W, H, tile=TILE,
                                    tile_capacity=24, backend=backend)
        return (jnp.mean((out.color - tgt_c) ** 2)
                + 0.1 * jnp.mean(out.depth)), bins

    args = (p.mean2d, colors, opac)
    (_, bins_p) = loss('pallas', args)
    assert int(bins_p.tile_overflow) > 0, "scene must overflow tiles"
    gx = jax.grad(lambda a: loss('xla', a)[0])(args)
    gp = jax.grad(lambda a: loss('pallas', a)[0])(args)
    for nm, a, b in zip(('mean2d', 'colors', 'opac'), gx, gp):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-6, rtol=2e-4,
                                   err_msg=f"grad {nm}")


def test_odd_cap_chunk_unroll_clamp(rng):
    """tile_capacity=18 gives a cap chunk cc=18 (not a multiple of the x4
    unroll): the kernels' clamped top block must not read/write out of
    the VMEM block or corrupt the last row's gradients."""
    p, colors, opac = make_scene(rng, n=60)
    bg = jnp.array([0.1, 0.2, 0.3])
    tgt_c = jnp.asarray(rng.uniform(0, 1, (H, W, 3)).astype(np.float32))

    def loss(backend, args):
        mean2d, colors, opac = args
        pp = p._replace(mean2d=mean2d)
        out, _ = rasterize_tiles(pp, colors, opac, bg, W, H, tile=TILE,
                                 tile_capacity=18, backend=backend)
        return jnp.mean((out.color - tgt_c) ** 2)

    args = (p.mean2d, colors, opac)
    lx = loss('xla', args)
    lp = loss('pallas', args)
    np.testing.assert_allclose(float(lx), float(lp), rtol=1e-5)
    gx = jax.grad(lambda a: loss('xla', a))(args)
    gp = jax.grad(lambda a: loss('pallas', a))(args)
    for nm, a, b in zip(('mean2d', 'colors', 'opac'), gx, gp):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-6, rtol=2e-4,
                                   err_msg=f"grad {nm}")


def test_expand_slab_kernel_matches_gather(rng):
    """The Pallas slab-expansion kernel (interpret mode, forced) must be
    bit-identical to the XLA gather formulation it replaces."""
    from bloomscene_tpu.ops.pallas.expand import expand_slab
    R, PCp, cap, T = 10, 3000, 64, 128    # T=128: the real kernel path
    asT = jnp.asarray(np.concatenate(
        [rng.normal(size=(R, PCp)).astype(np.float32),
         np.zeros((R, cap), np.float32)], axis=1))
    t_start = jnp.asarray(
        np.sort(rng.integers(0, PCp, (T,))).astype(np.int32))
    ref = expand_slab(asT, t_start, cap, T)            # gather fallback
    got = expand_slab(asT, t_start, cap, T, force_pallas=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
