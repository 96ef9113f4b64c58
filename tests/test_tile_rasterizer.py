"""Tile rasterizer vs golden model: forward + gradient parity."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bloomscene_tpu.ops import graphics, projection
from bloomscene_tpu.ops.reference_rasterizer import rasterize_reference
from bloomscene_tpu.ops.tile_rasterizer import rasterize_tiles
from bloomscene_tpu.ops.tiles import bin_splats

W = H = 64
TILE = 16


def make_camera(fovx=1.0, fovy=1.0):
    view = graphics.world_to_view(np.eye(3), np.zeros(3))
    proj = graphics.projection_matrix(0.01, 100.0, fovx, fovy)
    return (jnp.asarray(view), jnp.asarray(proj @ view),
            graphics.fov2focal(fovx, W), graphics.fov2focal(fovy, H),
            np.tan(fovx / 2), np.tan(fovy / 2))


def random_scene(rng, n):
    means = np.stack([rng.uniform(-1.2, 1.2, n), rng.uniform(-1.2, 1.2, n),
                      rng.uniform(0.8, 5.0, n)], -1).astype(np.float32)
    scales = rng.uniform(0.02, 0.25, (n, 3)).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    opac = rng.uniform(0.1, 0.95, n).astype(np.float32)
    return (jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats),
            jnp.asarray(colors), jnp.asarray(opac))


def project(means, scales, quats):
    view, full, fx, fy, tx, ty = make_camera()
    cov6 = projection.build_cov3d(scales, quats)
    return projection.project_gaussians(means, cov6, view, full, W, H,
                                        fx, fy, tx, ty)


def test_binning_covers_all_pairs(rng):
    means, scales, quats, colors, opac = random_scene(rng, 100)
    proj = project(means, scales, quats)
    bins = bin_splats(proj, W, H, TILE, pair_capacity=4096, tile_capacity=256)
    assert int(bins.pair_overflow) == 0
    assert int(bins.tile_overflow) == 0
    # every entry within a tile is sorted by depth
    depths = np.asarray(proj.depth)
    ent = np.asarray(bins.entries)
    msk = np.asarray(bins.entry_mask)
    for t in range(ent.shape[0]):
        d = depths[ent[t][msk[t]]]
        assert np.all(np.diff(d) >= 0), f"tile {t} not depth sorted"


def test_binning_entries_match_rects(rng):
    """Each tile's entry set == set of valid gaussians whose rect covers it."""
    from bloomscene_tpu.ops.tiles import compute_tile_rects
    means, scales, quats, colors, opac = random_scene(rng, 60)
    proj = project(means, scales, quats)
    bins = bin_splats(proj, W, H, TILE, pair_capacity=4096, tile_capacity=256)
    x0, y0, x1, y1, _ = (np.asarray(a) for a in
                         compute_tile_rects(proj, W, H, TILE))
    valid = np.asarray(proj.valid)
    gx = W // TILE
    ent = np.asarray(bins.entries)
    msk = np.asarray(bins.entry_mask)
    for t in range(ent.shape[0]):
        tx, ty = t % gx, t // gx
        expected = {i for i in range(60)
                    if valid[i] and x0[i] <= tx < x1[i] and y0[i] <= ty < y1[i]}
        got = set(ent[t][msk[t]].tolist())
        assert got == expected, f"tile {t}: {got ^ expected}"


@pytest.mark.parametrize("n", [1, 20, 150])
def test_forward_parity_with_golden(rng, n):
    means, scales, quats, colors, opac = random_scene(rng, n)
    proj = project(means, scales, quats)
    bg = jnp.array([0.3, 0.2, 0.7])
    gold = rasterize_reference(proj, colors, opac, bg, W, H, tile=TILE)
    out, bins = rasterize_tiles(proj, colors, opac, bg, W, H, tile=TILE,
                                tile_capacity=256)
    assert int(bins.tile_overflow) == 0
    np.testing.assert_allclose(out.color, gold.color, atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(out.depth, gold.depth, atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(out.final_T, gold.final_T, atol=1e-5)
    np.testing.assert_allclose(out.alpha, gold.alpha, atol=1e-5)


def test_gradient_parity_with_golden(rng):
    """Full-chain grads (means/scales/colors/opac/bg) match autodiff golden."""
    means, scales, quats, colors, opac = random_scene(rng, 40)
    view, full, fx, fy, tx, ty = make_camera()
    tgt_c = jnp.asarray(rng.uniform(0, 1, (H, W, 3)).astype(np.float32))
    tgt_d = jnp.asarray(rng.uniform(1, 4, (H, W)).astype(np.float32))

    def loss_with(raster):
        def f(means, scales, colors, opac, bg):
            cov6 = projection.build_cov3d(scales, quats)
            proj = projection.project_gaussians(means, cov6, view, full,
                                                W, H, fx, fy, tx, ty)
            out = raster(proj, colors, opac, bg)
            return (jnp.mean((out.color - tgt_c) ** 2)
                    + 0.7 * jnp.mean((out.depth - tgt_d) ** 2)
                    + 0.1 * jnp.mean(out.final_T)
                    + 0.05 * jnp.mean(out.alpha))
        return f

    gold_f = loss_with(lambda p, c, o, b: rasterize_reference(
        p, c, o, b, W, H, tile=TILE))
    tile_f = loss_with(lambda p, c, o, b: rasterize_tiles(
        p, c, o, b, W, H, tile=TILE, tile_capacity=256)[0])

    args = (means, scales, colors, opac, jnp.array([0.25, 0.5, 0.75]))
    lg = gold_f(*args)
    lt = tile_f(*args)
    np.testing.assert_allclose(float(lg), float(lt), rtol=1e-5)
    gg = jax.grad(gold_f, argnums=(0, 1, 2, 3, 4))(*args)
    gt = jax.grad(tile_f, argnums=(0, 1, 2, 3, 4))(*args)
    names = ["means", "scales", "colors", "opac", "bg"]
    for name, a, b in zip(names, gg, gt):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, rtol=2e-3,
            err_msg=f"grad mismatch for {name}")


def test_tile_capacity_overflow_reported(rng):
    """Overstuffed tile must report overflow, not crash."""
    means, scales, quats, colors, opac = random_scene(rng, 200)
    # stack everything at the center
    means = means.at[:, :2].set(0.0)
    proj = project(means, scales, quats)
    out, bins = rasterize_tiles(proj, colors, opac, jnp.zeros(3), W, H,
                                tile=TILE, tile_capacity=16)
    assert int(bins.tile_overflow) > 0
    assert np.all(np.isfinite(np.asarray(out.color)))


def test_pair_overflow_drops_farthest_first(rng):
    """Pair-buffer truncation is depth-aware: the NEAREST splats survive
    (depth pre-sort in ops.tiles — the CUDA reference reallocates instead,
    rasterizer_impl.cu:198-216; a static buffer must truncate)."""
    means, scales, quats, colors, opac = random_scene(rng, 200)
    proj = project(means, scales, quats)
    full = bin_splats(proj, W, H, TILE, pair_capacity=8192,
                      tile_capacity=256)
    assert int(full.pair_overflow) == 0
    trunc_cap = int(full.num_pairs) // 2
    trunc = bin_splats(proj, W, H, TILE, pair_capacity=trunc_cap,
                       tile_capacity=256)
    assert int(trunc.pair_overflow) > 0
    depth = np.asarray(proj.depth)
    kept = np.asarray(trunc.gauss_sorted)[
        np.asarray(trunc.tile_sorted) < (W // TILE) * (H // TILE)]
    dropped_pairs = int(full.num_pairs) - len(kept)
    assert dropped_pairs > 0
    # every kept pair's gaussian must be nearer than the farthest-surviving
    # depth threshold: max kept depth <= min depth among gaussians that
    # lost all their pairs
    full_ids = np.asarray(full.gauss_sorted)[
        np.asarray(full.tile_sorted) < (W // TILE) * (H // TILE)]
    lost_ids = set(full_ids.tolist()) - set(kept.tolist())
    if lost_ids:
        assert depth[kept].max() <= depth[np.array(sorted(lost_ids))].min() + 1e-6


def test_jit_and_shapes(rng):
    means, scales, quats, colors, opac = random_scene(rng, 30)

    @jax.jit
    def run(means, colors, opac):
        proj = project(means, scales, quats)
        out, _ = rasterize_tiles(proj, colors, opac, jnp.zeros(3), W, H,
                                 tile=TILE, tile_capacity=128)
        return out

    out = run(means, colors, opac)
    assert out.color.shape == (H, W, 3)
    assert out.depth.shape == (H, W)
