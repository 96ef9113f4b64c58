"""Stage-level timing of the bench scene on the real TPU (dev tool)."""
import time, json
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
from bloomscene_tpu.ops import projection, graphics
from bloomscene_tpu.ops import tiles as tiles_lib
from bloomscene_tpu.ops.tile_rasterizer import rasterize_tiles
from bloomscene_tpu.ops.pallas import blend as pb

N = 100_000
W = H = 512
rng = np.random.default_rng(0)
means = np.stack([rng.uniform(-1.5, 1.5, N), rng.uniform(-1.5, 1.5, N),
                  rng.uniform(0.5, 8.0, N)], -1).astype(np.float32)
scales = rng.uniform(0.002, 0.02, (N, 3)).astype(np.float32)
quats = rng.normal(size=(N, 4)).astype(np.float32)
quats /= np.linalg.norm(quats, axis=1, keepdims=True)
colors = rng.uniform(0, 1, (N, 3)).astype(np.float32)
opac = rng.uniform(0.2, 0.9, N).astype(np.float32)

fovx = fovy = 1.0
view = jnp.asarray(graphics.world_to_view(np.eye(3), np.zeros(3)))
full = jnp.asarray(np.asarray(graphics.projection_matrix(0.01, 100.0, fovx, fovy)) @ np.asarray(view))
fx = graphics.fov2focal(fovx, W); fy = graphics.fov2focal(fovy, H)
tx = ty = float(np.tan(fovx / 2))
tgt_c = jnp.asarray(rng.uniform(0, 1, (H, W, 3)).astype(np.float32))
tgt_d = jnp.asarray(rng.uniform(1, 6, (H, W)).astype(np.float32))

@jax.jit
def sizing(means, scales, quats, opac):
    cov6 = projection.build_cov3d(scales, quats)
    proj = projection.project_gaussians(means, cov6, view, full, W, H, fx, fy, tx, ty)
    bins = tiles_lib.bin_splats(proj, W, H, 16, 2**21, 8,
                                opacities=jnp.where(proj.valid, opac, 0.0))
    counts_full = jnp.zeros((32*32,), jnp.int32).at[
        jnp.minimum(bins.tile_sorted, 32*32-1)].add((bins.tile_sorted < 32*32).astype(jnp.int32))
    return bins.num_pairs, bins.num_packed, jnp.max(counts_full)

n_pairs, n_packed, max_count = sizing(jnp.asarray(means), jnp.asarray(scales),
                                      jnp.asarray(quats), jnp.asarray(opac))
pair_cap = int(-(-int(n_pairs)//8192)*8192)
packed_cap = int(-(-int(n_packed)//8192)*8192)
tile_cap = int(-(-int(max_count)//128)*128)
print("pairs", int(n_pairs), "packed", int(n_packed), "tile_cap", tile_cap)

argsj = tuple(jnp.asarray(a) for a in (means, scales, quats, colors, opac))

def timeit(f, args, iters=20, name=""):
    o = f(*args); jax.tree.map(lambda x: x.block_until_ready() if hasattr(x, 'block_until_ready') else x, o)
    t0 = time.perf_counter()
    for _ in range(iters):
        o = f(*args)
    jax.tree.map(lambda x: x.block_until_ready() if hasattr(x, 'block_until_ready') else x, o)
    dt = (time.perf_counter()-t0)/iters*1e3
    print(f"{name:28s} {dt:8.3f} ms")
    return dt

# stage A: projection
@jax.jit
def stage_proj(means, scales, quats):
    cov6 = projection.build_cov3d(scales, quats)
    return projection.project_gaussians(means, cov6, view, full, W, H, fx, fy, tx, ty)
proj = stage_proj(*argsj[:3])

# stage B: binning (production path: attr rows ride the gather/sort and
# the kernel slab comes out of bin_splats directly)
@jax.jit
def stage_bin(proj, colors, opac):
    opac_eff = jnp.where(proj.valid, opac, 0.0)
    attr_rows = jnp.stack([
        proj.mean2d[:, 0], proj.mean2d[:, 1], proj.conic[:, 0],
        proj.conic[:, 1], proj.conic[:, 2], opac_eff, proj.depth,
        colors[:, 0], colors[:, 1], colors[:, 2]], 0)
    return tiles_lib.bin_splats(proj, W, H, 16, pair_cap, tile_cap,
                                opacities=opac_eff,
                                packed_capacity=packed_cap, grad_index=True,
                                need_entries=False, attr_rows=attr_rows)
bins = stage_bin(proj, argsj[3], argsj[4])
data = bins.slab

# stage D: fwd blend kernel
@jax.jit
def stage_fwd(data, bins):
    return pb.blend_forward_pallas(data, bins.counts[bins.perm], 16, 32, 32,
                                   tid=bins.perm)
fw = stage_fwd(data, bins)

# stage E: bwd blend kernel
r, g, b, D, acc, Tf, ncon = fw
u = jnp.ones((256, 1024), jnp.float32)
@jax.jit
def stage_bwd(data, bins, Tf, ncon):
    return pb.blend_backward_pallas(data, bins.counts[bins.perm], 16, 32, 32,
                                    Tf, ncon, u, u, u, u, u, u, tid=bins.perm)
gr = stage_bwd(data, bins, Tf, ncon)

# stage F: grad reduce (emission-order gather + cumsum + boundary diff,
# mirrors wrapper._bwd using the precomputed bins.src_lane index)
@jax.jit
def stage_reduce(grad, bins):
    from bloomscene_tpu.ops.tiles import cumsum_lanes
    cap = tile_cap; T_pos = bins.counts.shape[0]
    PC = bins.src_lane.shape[0]
    src = jnp.concatenate([
        grad.reshape(10, cap*T_pos),
        jnp.zeros((10, 128), jnp.float32)], axis=1)
    pgT = jnp.take(src, jnp.minimum(bins.src_lane, cap*T_pos), axis=1)
    C = cumsum_lanes(pgT)
    Cx = C - pgT
    s_idx = jnp.minimum(bins.starts_by_id, PC)
    e_idx = jnp.minimum(bins.ends_by_id, PC)
    sums_T = jnp.where((e_idx > s_idx)[None, :],
                       jnp.take(C, jnp.maximum(e_idx-1, 0), axis=1)
                       - jnp.take(Cx, jnp.minimum(s_idx, PC-1), axis=1), 0.0)
    return sums_T.T

# full loss fwd+bwd for reference
def loss(args):
    means, scales, quats, colors, opac = args
    cov6 = projection.build_cov3d(scales, quats)
    proj = projection.project_gaussians(means, cov6, view, full, W, H, fx, fy, tx, ty)
    out, _ = rasterize_tiles(proj, colors, opac, jnp.zeros(3), W, H, tile=16,
                             pair_capacity=pair_cap, tile_capacity=tile_cap,
                             packed_capacity=packed_cap)
    return (jnp.mean(jnp.abs(out.color - tgt_c)) + 0.5*jnp.mean(jnp.abs(out.depth - tgt_d)))
gfn = jax.jit(jax.value_and_grad(lambda a: loss(a)))

# fwd only
ffn = jax.jit(loss)

timeit(stage_proj, argsj[:3], name="projection")
timeit(stage_bin, (proj, argsj[3], argsj[4]),
       name="binning + slab (grad_index)")
timeit(stage_fwd, (data, bins), name="fwd blend kernel")
timeit(stage_bwd, (data, bins, Tf, ncon), name="bwd blend kernel")
timeit(stage_reduce, (gr, bins), name="grad reduce")
timeit(ffn, (argsj,), name="TOTAL fwd (loss)")
timeit(gfn, (argsj,), name="TOTAL fwd+bwd")
