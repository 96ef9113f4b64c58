"""Pallas pair-expansion kernel vs the XLA binning path (interpret mode)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bloomscene_tpu.ops import graphics, projection
from bloomscene_tpu.ops import tiles as tiles_lib
from bloomscene_tpu.ops.pallas import blend as pallas_blend
from bloomscene_tpu.ops.pallas import pairs as pairs_lib

W = H = 64
TILE = 16
GX = GY = 4
NUM_TILES = GX * GY
PAIR_CAP = 2048          # % BLOCK == 0
PACKED_CAP = 1536
TILE_CAP = 256


@pytest.fixture(autouse=True)
def interpret_mode():
    pallas_blend.INTERPRET = True
    yield
    pallas_blend.INTERPRET = False


def make_scene(rng, n=160):
    means = np.stack([rng.uniform(-1.2, 1.2, n), rng.uniform(-1.2, 1.2, n),
                      rng.uniform(0.6, 5.0, n)], -1).astype(np.float32)
    scales = rng.uniform(0.02, 0.3, (n, 3)).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    opac = rng.uniform(0.05, 0.95, n).astype(np.float32)
    view = graphics.world_to_view(np.eye(3), np.zeros(3))
    proj_m = graphics.projection_matrix(0.01, 100.0, 1.0, 1.0) @ view
    fx = graphics.fov2focal(1.0, W)
    t = float(np.tan(0.5))
    cov6 = projection.build_cov3d(jnp.asarray(scales), jnp.asarray(quats))
    p = projection.project_gaussians(jnp.asarray(means), cov6,
                                     jnp.asarray(view), jnp.asarray(proj_m),
                                     W, H, fx, fx, t, t)
    return p, jnp.asarray(colors), jnp.asarray(opac)


def bins_pair(proj, opac, attr_rows=None, grad_index=False):
    kw = dict(opacities=opac, packed_capacity=PACKED_CAP,
              grad_index=grad_index, need_entries=not grad_index,
              attr_rows=attr_rows)
    ref = tiles_lib.bin_splats(proj, W, H, TILE, PAIR_CAP, TILE_CAP, **kw)
    got = tiles_lib.bin_splats(proj, W, H, TILE, PAIR_CAP, TILE_CAP,
                               force_pairs_kernel=True, **kw)
    return ref, got


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_pairs_kernel_key_parity(seed, rng=None):
    rng = np.random.default_rng(seed)
    proj, colors, opac = make_scene(rng)
    ref, got = bins_pair(proj, opac)

    # total (pre-cull) pair count and per-pair identity must be exact
    assert int(got.num_pairs) == int(ref.num_pairs)
    # the kernel's wider bf16 cull margin may KEEP extra pairs but can
    # never drop one the f32 path keeps
    assert int(got.num_packed) >= int(ref.num_packed)
    extra = int(got.num_packed) - int(ref.num_packed)
    assert extra <= max(8, int(ref.num_packed) * 0.05)

    # per-tile lists: the f32-live pairs must appear in the kernel's
    # lists, same order (extra margin-kept pairs may interleave)
    for t in range(NUM_TILES):
        r = np.asarray(ref.entries[t][np.asarray(ref.entry_mask[t])])
        g = np.asarray(got.entries[t][np.asarray(got.entry_mask[t])])
        assert len(g) >= len(r)
        # r is a subsequence of g
        it = iter(g.tolist())
        assert all(x in it for x in r.tolist()), (t, r, g)


def test_pairs_kernel_blend_bitwise_equal():
    """Margin-kept extra pairs blend to exactly zero: forward outputs of
    the Pallas blend from kernel-binned vs XLA-binned slabs are equal."""
    from bloomscene_tpu.ops.pallas import blend as pb
    rng = np.random.default_rng(5)
    proj, colors, opac = make_scene(rng)
    opac_eff = jnp.where(proj.valid, opac, 0.0)
    attr_rows = jnp.stack([
        proj.mean2d[:, 0], proj.mean2d[:, 1], proj.conic[:, 0],
        proj.conic[:, 1], proj.conic[:, 2], opac_eff, proj.depth,
        colors[:, 0], colors[:, 1], colors[:, 2]], 0)
    ref, got = bins_pair(proj, opac_eff, attr_rows=attr_rows,
                         grad_index=True)
    outs = []
    for b in (ref, got):
        fw = pb.blend_forward_pallas(b.slab, b.counts[b.perm], TILE,
                                     GX, GY, tid=b.perm)
        outs.append(fw)
    for a, b in zip(outs[0][:6], outs[1][:6]):   # r,g,b,D,acc,T
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pairs_kernel_empty_and_dense():
    rng = np.random.default_rng(9)
    proj, colors, opac = make_scene(rng)
    # all invalid -> zero pairs both paths
    proj0 = proj._replace(valid=jnp.zeros_like(proj.valid))
    ref, got = bins_pair(proj0, opac)
    assert int(got.num_pairs) == int(ref.num_pairs) == 0
    assert int(got.num_packed) == 0
    # opacity ~1 everywhere -> heavy occupancy, overflow paths agree
    ref, got = bins_pair(proj, jnp.full_like(opac, 0.99))
    assert int(got.num_pairs) == int(ref.num_pairs)
    assert int(got.pair_overflow) == int(ref.pair_overflow)
