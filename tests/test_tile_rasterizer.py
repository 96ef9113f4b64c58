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


def test_exact_zero_pair_cull(rng):
    """The opacity-aware ellipse/box cull only drops pairs whose max alpha
    over the tile is < 1/255 (zero contribution fwd AND bwd), and a snug
    packed_capacity reproduces the full-buffer render bitwise."""
    means, scales, quats, colors, opac = random_scene(rng, 300)
    proj = project(means, scales, quats)
    opac_eff = jnp.where(proj.valid, opac, 0.0)
    base = bin_splats(proj, W, H, TILE, pair_capacity=8192,
                      tile_capacity=256)
    cull = bin_splats(proj, W, H, TILE, pair_capacity=8192,
                      tile_capacity=256, opacities=opac_eff)
    assert int(cull.num_packed) < int(base.num_pairs), "cull dropped nothing"
    assert int(cull.packed_overflow) == 0

    # brute force: every (tile, gaussian) pair present in base but culled
    # must have alpha < 1/255 at ALL of its tile's pixels
    gx = W // TILE
    mean2d = np.asarray(proj.mean2d)
    conic = np.asarray(proj.conic)
    op = np.asarray(opac_eff)
    ent_b, msk_b = np.asarray(base.entries), np.asarray(base.entry_mask)
    ent_c, msk_c = np.asarray(cull.entries), np.asarray(cull.entry_mask)
    checked = 0
    for t in range(ent_b.shape[0]):
        dropped = set(ent_b[t][msk_b[t]].tolist()) \
            - set(ent_c[t][msk_c[t]].tolist())
        tx0, ty0 = (t % gx) * TILE, (t // gx) * TILE
        pxs, pys = np.meshgrid(np.arange(tx0, tx0 + TILE),
                               np.arange(ty0, ty0 + TILE))
        for i in dropped:
            dx = mean2d[i, 0] - pxs
            dy = mean2d[i, 1] - pys
            power = (-0.5 * (conic[i, 0] * dx * dx + conic[i, 2] * dy * dy)
                     - conic[i, 1] * dx * dy)
            alpha = np.minimum(0.99, op[i] * np.exp(power))
            assert alpha.max() < 1.0 / 255.0, \
                f"culled contributing pair (tile {t}, gaussian {i})"
            checked += 1
    assert checked > 0, "no pairs were culled anywhere"

    # snug packed buffer: bitwise-identical render + grads vs full buffer
    packed_snug = int(-(-int(cull.num_packed) // 256) * 256)

    def run(packed):
        def loss(args):
            m, c, o = args
            cov6 = projection.build_cov3d(scales, quats)
            view, full_m, fx, fy, tfx, tfy = make_camera()
            pr = projection.project_gaussians(m, cov6, view, full_m, W, H,
                                              fx, fy, tfx, tfy)
            out, bins = rasterize_tiles(pr, c, o, jnp.zeros(3), W, H,
                                        tile=TILE, pair_capacity=8192,
                                        tile_capacity=256,
                                        packed_capacity=packed)
            return jnp.sum(out.color) + jnp.sum(out.depth), out
        (l, out), g = jax.value_and_grad(loss, has_aux=True)(
            (means, colors, opac))
        return l, out, g

    l_full, out_full, g_full = run(None)
    l_snug, out_snug, g_snug = run(packed_snug)
    assert float(l_full) == float(l_snug)
    np.testing.assert_array_equal(np.asarray(out_full.color),
                                  np.asarray(out_snug.color))
    for a, b in zip(g_full, g_snug):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


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


def test_grad_index_invariants(rng):
    """bin_splats(grad_index=True): src_lane maps each live emission slot
    to its (slot, permuted-tile) lane of the backward kernel's grad
    buffer, and the per-id emission ranges tile the pair list exactly."""
    means, scales, quats, colors, opac = random_scene(rng, 100)
    proj = project(means, scales, quats)
    n = means.shape[0]
    PC = 4096
    CAP = 256
    bins = bin_splats(proj, W, H, TILE, pair_capacity=PC,
                      tile_capacity=CAP,
                      opacities=jnp.where(proj.valid, opac, 0.0),
                      grad_index=True)
    assert bins.src_lane is not None
    src_lane = np.asarray(bins.src_lane)
    s = np.asarray(bins.starts_by_id)
    e = np.asarray(bins.ends_by_id)
    total = int(bins.num_pairs)
    assert (e >= s).all()
    assert int(np.sum(e - s)) == total
    # ranges are disjoint and cover [0, total)
    order = np.argsort(s, kind="stable")
    nz = order[(e - s)[order] > 0]
    assert s[nz[0]] == 0 and e[nz[-1]] == total
    assert (s[nz][1:] == e[nz][:-1]).all()
    # occupancy perm is a permutation with pos its inverse
    num_tiles = (W // TILE) * (H // TILE)
    perm = np.asarray(bins.perm)
    pos = np.asarray(bins.pos)
    assert sorted(perm.tolist()) == list(range(num_tiles))
    assert (perm[pos] == np.arange(num_tiles)).all()
    # live lanes are unique; each id's emission range maps to grad-buffer
    # lanes whose underlying sorted pair carries that gaussian id
    DUMP = CAP * num_tiles
    live = src_lane[src_lane < DUMP]
    assert len(set(live.tolist())) == len(live)
    assert len(live) == int(bins.num_packed)
    gauss_sorted = np.asarray(bins.gauss_sorted)
    tile_sorted = np.asarray(bins.tile_sorted)
    t_start = np.asarray(bins.t_start)
    for g in rng.integers(0, n, 25):
        for eslot in range(s[g], e[g]):
            lane = src_lane[eslot]
            if lane < DUMP:
                slot, tile = lane // num_tiles, perm[lane % num_tiles]
                p = t_start[tile] + slot
                assert gauss_sorted[p] == g
                assert tile_sorted[p] == tile


def test_opacity_rects_subset_of_reference_rects(rng):
    """The opacity-aware ellipse rect is always contained in the reference
    3-sigma square, and only ever drops pairs the per-pixel 1/255 test
    ignores (rendered output already covered by the cull parity test)."""
    from bloomscene_tpu.ops.tiles import compute_tile_rects
    means, scales, quats, colors, opac = random_scene(rng, 200)
    proj = project(means, scales, quats)
    x0r, y0r, x1r, y1r, t_ref = compute_tile_rects(proj, W, H, TILE)
    x0e, y0e, x1e, y1e, t_ell = compute_tile_rects(
        proj, W, H, TILE, opacities=jnp.where(proj.valid, opac, 0.0))
    assert (np.asarray(x0e) >= np.asarray(x0r)).all()
    assert (np.asarray(y0e) >= np.asarray(y0r)).all()
    assert (np.asarray(x1e) <= np.asarray(x1r)).all()
    assert (np.asarray(y1e) <= np.asarray(y1r)).all()
    assert (np.asarray(t_ell) <= np.asarray(t_ref)).all()
    # near-transparent splats emit no pairs at all
    lo = jnp.full_like(opac, 1.0 / 300.0)
    *_, t_lo = compute_tile_rects(proj, W, H, TILE,
                                  opacities=jnp.where(proj.valid, lo, 0.0))
    assert int(jnp.sum(t_lo)) == 0


def test_two_key_sort_branch_matches_packed_branch(rng):
    """When (tile << kbits | slot) does not fit 31 bits (which the
    flagship 512^2 config hits at pair_capacity 2^21), binning falls back
    to a 2-key lexicographic sort — it must produce the identical
    deterministic binning AND a working grad-index. On a 64x64-tile grid,
    pair_capacity 2^18+8 (kbits 19, 4097 > 2^12) takes the 2-key branch
    while 8192 (kbits 13) takes the packed branch."""
    means, scales, quats, colors, opac = random_scene(rng, 120)
    proj = project(means, scales, quats)
    op = jnp.where(proj.valid, opac, 0.0)
    W2 = H2 = 1024
    kw = dict(tile_capacity=64, opacities=op, grad_index=True,
              packed_capacity=4096)
    small = bin_splats(proj, W2, H2, TILE, pair_capacity=8192, **kw)
    big = bin_splats(proj, W2, H2, TILE, pair_capacity=(1 << 18) + 8, **kw)
    assert int(small.num_pairs) == int(big.num_pairs)
    assert int(small.num_packed) == int(big.num_packed)
    np.testing.assert_array_equal(np.asarray(small.t_start),
                                  np.asarray(big.t_start))
    np.testing.assert_array_equal(np.asarray(small.counts),
                                  np.asarray(big.counts))
    np.testing.assert_array_equal(np.asarray(small.gauss_sorted),
                                  np.asarray(big.gauss_sorted))
    np.testing.assert_array_equal(np.asarray(small.tile_sorted),
                                  np.asarray(big.tile_sorted))
    # grad-index invariants hold on the 2-key branch too (and the two
    # branches must agree exactly on the emission->lane map)
    assert big.src_lane is not None
    np.testing.assert_array_equal(np.asarray(small.src_lane)[:8192],
                                  np.asarray(big.src_lane)[:8192])
    num_tiles2 = (W2 // TILE) * (H2 // TILE)
    DUMP = 64 * num_tiles2
    src_lane = np.asarray(big.src_lane)
    perm = np.asarray(big.perm)
    gs = np.asarray(big.gauss_sorted)
    t_start = np.asarray(big.t_start)
    s = np.asarray(big.starts_by_id)
    e = np.asarray(big.ends_by_id)
    checked = 0
    for g in rng.integers(0, 120, 30):
        for eslot in range(s[g], e[g]):
            lane = src_lane[eslot]
            if lane < DUMP:
                p = t_start[perm[lane % num_tiles2]] + lane // num_tiles2
                assert gs[p] == g
                checked += 1
    assert checked > 0


def test_empty_scene_and_odd_geometry(rng):
    """n=0 must render pure background (both backends used to crash on
    zero-length gathers), and non-square / non-tile-multiple images plus
    tile sizes 8 and 32 must match the golden model."""
    from bloomscene_tpu.ops.reference_rasterizer import rasterize_reference
    from bloomscene_tpu.ops.pallas import blend as pallas_blend
    pallas_blend.INTERPRET = True
    view, full, fx, fy, tx, ty = make_camera()
    bg = jnp.array([0.25, 0.5, 0.75])
    empty = projection.project_gaussians(
        jnp.zeros((0, 3)), jnp.zeros((0, 6)), view, full, W, H,
        fx, fy, tx, ty)
    for backend in ('xla', 'pallas'):
        out, _ = rasterize_tiles(empty, jnp.zeros((0, 3)), jnp.zeros((0,)),
                                 bg, W, H, tile=TILE, tile_capacity=32,
                                 backend=backend)
        assert np.allclose(np.asarray(out.color), np.asarray(bg))
        assert np.allclose(np.asarray(out.final_T), 1.0)

    for (w2, h2, tl) in ((72, 40, 16), (56, 56, 8), (64, 64, 32)):
        means, scales, quats, colors, opac = random_scene(rng, 60)
        cov6 = projection.build_cov3d(scales, quats)
        import numpy as _np
        fovx = fovy = 1.0
        v = graphics.world_to_view(_np.eye(3), _np.zeros(3))
        f = graphics.projection_matrix(0.01, 100.0, fovx, fovy) @ v
        pr = projection.project_gaussians(
            means, cov6, jnp.asarray(v), jnp.asarray(f), w2, h2,
            graphics.fov2focal(fovx, w2), graphics.fov2focal(fovy, h2),
            _np.tan(fovx / 2), _np.tan(fovy / 2))
        gold = rasterize_reference(pr, colors, opac, bg, w2, h2, tile=tl)
        for backend in ('xla', 'pallas'):
            out, _ = rasterize_tiles(pr, colors, opac, bg, w2, h2,
                                     tile=tl, pair_capacity=4096,
                                     tile_capacity=128, backend=backend)
            np.testing.assert_allclose(np.asarray(out.color),
                                       np.asarray(gold.color), atol=1e-4)
    pallas_blend.INTERPRET = False
