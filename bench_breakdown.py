"""Cumulative stage timing of the fused fwd+bwd step (dev tool).

Each variant runs 8 dependent iterations inside one dispatch (like
bench.py) so per-call relay overhead (~1.6 ms) amortizes away. Variants
are cumulative prefixes of the full step, so stage cost = difference of
adjacent variants *as compiled in context* (no DCE distortion: every
variant consumes all intermediate outputs it claims to compute).
"""
import time, sys
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
from bloomscene_tpu.ops import projection, graphics
from bloomscene_tpu.ops import tiles as tiles_lib
from bloomscene_tpu.ops.tile_rasterizer import rasterize_tiles
from bloomscene_tpu.ops.pallas import blend as pb

N = 100_000
W = H = 512
TILE = 16
GX = GY = 32
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
full = jnp.asarray(np.asarray(graphics.projection_matrix(
    0.01, 100.0, fovx, fovy)) @ np.asarray(view))
fx = graphics.fov2focal(fovx, W); fy = graphics.fov2focal(fovy, H)
tx = ty = float(np.tan(fovx / 2))
tgt_c = jnp.asarray(rng.uniform(0, 1, (H, W, 3)).astype(np.float32))
tgt_d = jnp.asarray(rng.uniform(1, 6, (H, W)).astype(np.float32))

PAIR_CAP = 221184
PACKED_CAP = 196608
TILE_CAP = 640

argsj = tuple(jnp.asarray(a) for a in
              (means, scales, quats, colors, opac))


def consume(*xs):
    tot = jnp.float32(0)
    for x in xs:
        if x is None:
            continue
        tot = tot + jnp.sum(x.astype(jnp.float32) * 1e-12)
    return tot


def project(a):
    means, scales, quats, colors, opac = a
    cov6 = projection.build_cov3d(scales, quats)
    return projection.project_gaussians(means, cov6, view, full, W, H,
                                        fx, fy, tx, ty)


def make_variant(upto, grad_index=True):
    def stepval(a):
        proj = project(a)
        if upto == 'proj':
            return consume(*proj)
        opac_eff = jnp.where(proj.valid, a[4], 0.0)
        attr_rows = None
        if grad_index:
            attr_rows = jnp.stack([
                proj.mean2d[:, 0], proj.mean2d[:, 1], proj.conic[:, 0],
                proj.conic[:, 1], proj.conic[:, 2], opac_eff, proj.depth,
                a[3][:, 0], a[3][:, 1], a[3][:, 2]], 0)
        bins = tiles_lib.bin_splats(
            proj, W, H, TILE, PAIR_CAP, TILE_CAP,
            opacities=opac_eff,
            packed_capacity=PACKED_CAP, grad_index=grad_index,
            need_entries=False, attr_rows=attr_rows)
        gi = (bins.src_lane, bins.starts_by_id, bins.ends_by_id,
              bins.perm, bins.pos, bins.slab) if grad_index else ()
        if upto == 'bin':
            # with grad_index this includes the kernel slab (production
            # path: the pack stage no longer exists separately)
            return consume(proj.mean2d, bins.gauss_sorted, bins.tile_sorted,
                           bins.t_start, bins.counts, *gi)
        perm = bins.perm
        data = bins.slab
        fw = pb.blend_forward_pallas(data, bins.counts[perm], TILE, GX, GY,
                                     tid=perm)
        if upto == 'fwd':
            return consume(*fw, *gi)
        r, g, b, D, acc, Tf, ncon = fw
        u = jnp.broadcast_to(jnp.float32(1e-6), (TILE * TILE, GX * GY))
        gr = pb.blend_backward_pallas(data, bins.counts[perm], TILE, GX,
                                      GY, Tf, ncon, u, u, u, u, u, u,
                                      tid=perm)
        if upto == 'bwd':
            return consume(gr, *gi)
        if upto == 'gred':
            # per-Gaussian grad reduction exactly as wrapper._bwd:
            # emission-order gather + MXU cumsum + boundary diff
            W_ = pb.GRAD_W
            cap, T_pos = gr.shape[1], gr.shape[2]
            PC = bins.src_lane.shape[0]
            flat = gr.reshape(W_, cap * T_pos)
            dead = bins.src_lane >= cap * T_pos
            pgT = jnp.take(flat, jnp.minimum(bins.src_lane,
                                             cap * T_pos - 1), axis=1)
            pgT = jnp.where(dead[None, :], 0.0, pgT)
            C = tiles_lib.cumsum_lanes(pgT)
            Cx = C - pgT
            s_idx = jnp.minimum(bins.starts_by_id, PC)
            e_idx = jnp.minimum(bins.ends_by_id, PC)
            sums_T = jnp.where(
                (e_idx > s_idx)[None, :],
                jnp.take(C, jnp.maximum(e_idx - 1, 0), axis=1)
                - jnp.take(Cx, jnp.minimum(s_idx, PC - 1), axis=1), 0.0)
            return consume(sums_T, *gi)
        raise ValueError(upto)

    @jax.jit
    def run8(a):
        def body(_, carry):
            a, acc = carry
            v = stepval(a)
            a = jax.tree.map(lambda p: p + 1e-20 * v, a)
            return a, acc + v
        return lax.fori_loop(0, 8, body, (a, jnp.float32(0)))
    return run8


def full_loss(a):
    means, scales, quats, colors, opac = a
    proj = project(a)
    out, _ = rasterize_tiles(proj, colors, opac, jnp.zeros(3), W, H,
                             tile=TILE, pair_capacity=PAIR_CAP,
                             tile_capacity=TILE_CAP,
                             packed_capacity=PACKED_CAP)
    return (jnp.mean(jnp.abs(out.color - tgt_c))
            + 0.5 * jnp.mean(jnp.abs(out.depth - tgt_d)))


@jax.jit
def run8_full(a):
    def body(_, carry):
        a, acc = carry
        l, g = jax.value_and_grad(full_loss)(a)
        a = jax.tree.map(lambda p, gg: p - 1e-9 * gg, a, g)
        return a, acc + l
    return lax.fori_loop(0, 8, body, (a, jnp.float32(0)))


@jax.jit
def run8_fwdfull(a):
    def body(_, carry):
        a, acc = carry
        l = full_loss(a)
        a = jax.tree.map(lambda p: p + 1e-20 * l, a)
        return a, acc + l
    return lax.fori_loop(0, 8, body, (a, jnp.float32(0)))


def timeit(f, name, iters=6):
    o = f(argsj); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(iters):
        o = f(argsj)
    jax.block_until_ready(o)
    dt = (time.perf_counter() - t0) / iters / 8 * 1e3
    print(f"{name:32s} {dt:8.3f} ms/step")
    return dt


if __name__ == '__main__':
    which = sys.argv[1:] or ['proj', 'bin_nogi', 'bin', 'fwd',
                             'bwd', 'fullfwd', 'full']
    for w in which:
        if w == 'full':
            timeit(run8_full, 'FULL fwd+bwd')
        elif w == 'fullfwd':
            timeit(run8_fwdfull, 'full fwd (loss only)')
        elif w == 'bin_nogi':
            timeit(make_variant('bin', grad_index=False),
                   'upto bin (no grad_index)')
        else:
            timeit(make_variant(w), f'upto {w}')
