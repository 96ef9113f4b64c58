"""Pallas TPU kernels: front-to-back blend forward + backward.

Mosaic replacement for the XLA-scan blend in ops/tile_rasterizer — same
semantics (the golden model's / CUDA forward.cu:385-471), an order of
magnitude less loop overhead.

Layout (the crux): pixel-state arrays are [P, GT] with each tile's 256
PIXELS on sublanes and GT=128 tiles of a tile-group on LANES. A splat step
needs each tile's current splat attribute broadcast to its pixels — with
tiles on lanes this is a natural [1, GT] -> [P, GT] sublane broadcast, no
transposes anywhere. Splat data is packed [DATA_W, cap, T] (attr rows
leading, so the slab is a plain reshape of the binning's expansion gather
— no transpose, no pad rows): a dynamic index on the middle slot dim
yields the step's [DATA_W, GT] attribute rows (a sublane-dynamic slice;
measured cost-neutral vs the old leading-dim index on a v5e).

Grid: (tile_groups, cap_chunks). TPU grids execute sequentially on the
core, so the blend carries live in VMEM scratch that persists across the
minor (chunk) dimension — initialized at chunk 0, emitted at the last
chunk — while the BlockSpec pipeline double-buffers each chunk's splat
data HBM->VMEM behind the compute. The per-group splat loop runs only up
to the group's actual occupancy (scalar-prefetched counts).

Backward re-walks back-to-front (chunks iterated reversed via the index
map) with the CUDA recurrence (backward.cu:477-585) extended with the
depth/acc channels, writing per-entry gradients [GRAD_W, cap, T] that the
wrapper reduces to per-Gaussian gradients with an emission-order
lane-gather + MXU cumsum (see wrapper._bwd — no scatter, no segment-sum).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..reference_rasterizer import (ACC_SEED, ALPHA_MAX, ALPHA_MIN,
                                    T_EPS)

GROUP_TILES = 128    # tiles per program (lane dim; must be 128-multiple)
CAP_CHUNK = 128      # splats streamed per grid step (VMEM budget bound)
BWD_CAP_CHUNK = 128   # bounded by scoped VMEM: the unrolled pre-section
                     # holds ~10 [P,GT] planes per splat (x4 unroll)
BWD_UNROLL = 4
INTERPRET = False    # set True to run kernels in interpreter mode (CPU)
DATA_W = 10          # packed attrs: mx,my,ca,cb,cc,op,de,r,g,b (leading
                     # dim is untiled, so no pad rows are needed)
GRAD_W = 10          # per-entry grads: dmx,dmy,dca,dcb,dcc,dop,dde,dr,dg,db


def pack_splat_data_sorted(mean2d, conic, depth, color, opac,
                           gauss_sorted, t_start, cap: int) -> jnp.ndarray:
    """Expand per-Gaussian attrs into the kernel's [W, cap, T] layout from
    the depth-sorted PAIR list: two chained LANE gathers.

    slab[:, slot, tile] = attrs[gauss_sorted[t_start[tile] + slot]] — the
    (slot, tile) -> sorted-pair-position grid is computed directly, so the
    whole pack is one s32 gather (pair id) and one [W, N] attribute gather
    along lanes (output rows lead, so the reshape to [W, cap, T] is free).

    NOTE: the production path skips this function entirely — bin_splats
    builds TileBins.slab by riding the attribute rows through its per-pair
    gather and tile sort (ops/tiles.py), which replaces this pack's id->
    sorted gather with ~free sort payloads. This standalone pack remains
    for direct kernel tests and fallback callers.

    Slots at/past a tile's count read PAST the tile's range: within-range
    overhang slots pick up the NEXT tile's pairs, slots beyond the packed
    pair list land in the appended zero tail. Both are safe: the kernels
    mask every entry by the tile's count before it can contribute (vld
    term), and the backward writes zero grads for masked rows. LAYOUT:
    tables stay TRANSPOSED [W, n] (a [n, W] table with small W minor pads
    under (8,128) tiling)."""
    PC = gauss_sorted.shape[0]
    num_tiles = t_start.shape[0]
    baseT = jnp.stack([
        mean2d[:, 0], mean2d[:, 1], conic[:, 0], conic[:, 1], conic[:, 2],
        opac, depth, color[:, 0], color[:, 1], color[:, 2]], 0)  # [10, N]
    # both gathers run ALONG LANES of a 2D table (the vectorized gather
    # form on TPU; 1D takes with large index vectors lower to a serial
    # path measured ~100x slower). The zero tail keeps beyond-range slots
    # exact zeros without clamping.
    asT = jnp.concatenate([
        jnp.take(baseT, gauss_sorted, axis=1),
        jnp.zeros((DATA_W, cap), jnp.float32)], 1)         # [W, PC+cap]
    slot = jnp.arange(cap, dtype=jnp.int32)
    pgrid = jnp.minimum(t_start, PC)[None, :] + slot[:, None]   # [cap, T]
    return jnp.take(asT, pgrid.reshape(-1),
                    axis=1).reshape(DATA_W, cap, num_tiles)


def counts_rows(counts, num_tiles: int) -> jnp.ndarray:
    """counts [T] -> [8, T] f32 rows (min sublane tile) for kernel input."""
    c = counts.astype(jnp.float32)
    return jnp.broadcast_to(c[None, :], (8, num_tiles))


def tid_rows(tid, num_tiles: int) -> jnp.ndarray:
    """tile ids [T] -> [8, T] int32 rows for kernel input.

    The blend kernels are tile-PERMUTATION-agnostic: lane t of a group
    processes whatever tile id this row names. The wrapper sorts tiles by
    occupancy so each group's tiles have similar splat counts (the
    per-group loop runs to the group max — unbalanced groups waste steps
    on mostly-empty lanes)."""
    return jnp.broadcast_to(tid.astype(jnp.int32)[None, :], (8, num_tiles))


def _group_geometry(num_tiles: int, cap: int, cap_chunk: int = CAP_CHUNK):
    gt = GROUP_TILES
    while num_tiles % gt:
        gt //= 2
    cc = min(cap_chunk, cap)
    while cap % cc:
        cc //= 2
    return gt, num_tiles // gt, cc, cap // cc


def _pixel_coords(tile: int, gx: int, gt: int, tid_ref):
    """px, py [P, GT] for the tiles named by ``tid_ref`` row 0."""
    P = tile * tile
    tid = jnp.broadcast_to(tid_ref[0:1, :], (P, gt))     # [P, GT] int32
    ox = (tid % gx) * tile
    oy = (tid // gx) * tile
    sp = jax.lax.broadcasted_iota(jnp.int32, (P, gt), 0)
    px = (ox + sp % tile).astype(jnp.float32)
    py = (oy + sp // tile).astype(jnp.float32)
    return px, py


def _split_row(row):
    return (row[0:1, :], row[1:2, :], row[2:3, :], row[3:4, :],
            row[4:5, :], row[5:6, :], row[6:7, :], row[7:8, :],
            row[8:9, :], row[9:10, :])


def _fwd_kernel(tile, gx, cc, gmax_ref, data_ref, counts_ref, tid_ref,
                r_ref, g_ref, b_ref, d_ref, acc_ref, t_ref, ncon_ref,
                sT, sCr, sCg, sCb, sD, sAcc, sDone, sNcon):
    gt = r_ref.shape[1]
    P = tile * tile
    g = pl.program_id(0)
    c = pl.program_id(1)
    n_chunks = pl.num_programs(1)
    px, py = _pixel_coords(tile, gx, gt, tid_ref)

    @pl.when(c == 0)
    def _():
        sT[...] = jnp.ones((P, gt), jnp.float32)
        sCr[...] = jnp.zeros((P, gt), jnp.float32)
        sCg[...] = jnp.zeros((P, gt), jnp.float32)
        sCb[...] = jnp.zeros((P, gt), jnp.float32)
        sD[...] = jnp.zeros((P, gt), jnp.float32)
        sAcc[...] = jnp.full((P, gt), ACC_SEED, jnp.float32)
        sDone[...] = jnp.zeros((P, gt), jnp.float32)
        sNcon[...] = jnp.zeros((P, gt), jnp.int32)

    n_here = jnp.clip(gmax_ref[g] - c * cc, 0, cc)
    # early exit: once every pixel of the group has terminated, later
    # chunks have nothing to blend (saves the whole chunk loop; the
    # BlockSpec DMA still streams, but compute is the bottleneck here)
    n_here = jnp.where(jnp.all(sDone[...] > 0.5), 0, n_here)
    cnt = counts_ref[0:1, :]                    # [1, GT]

    # UNROLL x4: the expensive per-splat work (power, exp) has no serial
    # dependency — only the cheap transmittance chain does. Unrolling
    # breaks the per-splat latency chain the rolled loop serializes on.
    U = 4

    def body(i, carry):
        T, Cr, Cg, Cb, D, acc, done, ncon = carry
        base = i * U
        pre = []
        for u in range(U):
            j = base + u
            # clamp: the last unrolled block may reach past cc when
            # cc % U != 0 (n_blocks rounds up); the (j < cc) term masks
            # the duplicate row out of the blend
            row = data_ref[:, jnp.minimum(j, cc - 1), :]   # [DATA_W, GT]
            (mx, my, ca, cb, ccn, op, de, cr, cg, cbl) = _split_row(row)
            vld = ((c * cc + j) < cnt) & (j < cc)  # entry lists front-packed
            dx = mx - px
            dy = my - py
            power = -0.5 * (ca * dx * dx + ccn * dy * dy) - cb * dx * dy
            alpha = jnp.minimum(ALPHA_MAX, op * jnp.exp(power))
            ok_u = vld & (power <= 0.0) & (alpha >= ALPHA_MIN)
            pre.append((ok_u, alpha, de, cr, cg, cbl))
        # SERIAL: only the T/done recurrence + per-splat weight; the
        # color/depth/acc accumulations are deferred to the tree-summed
        # parallel section below (they are linear in the stashed w's, so
        # order does not matter and the VPU pipelines them off the
        # loop-carried chain)
        ws = []
        for u, (ok_u, alpha, de, cr, cg, cbl) in enumerate(pre):
            ok = ok_u & (done < 0.5)
            test_T = T * (1.0 - alpha)
            term = ok & (test_T < T_EPS)
            blend = ok & ~term
            done = jnp.where(term, 1.0, done)
            w = jnp.where(blend, alpha * T, 0.0)
            T = jnp.where(blend, test_T, T)
            ncon = jnp.where(blend, c * cc + base + u + 1, ncon)
            ws.append((w, de, cr, cg, cbl))
        # PARALLEL: same left-to-right accumulation order as the rolled
        # loop (bit-exact vs the XLA path), but on a dependency chain
        # separate from T/done, so it pipelines behind the next block
        for w, de, cr, cg, cbl in ws:
            Cr = Cr + w * cr
            Cg = Cg + w * cg
            Cb = Cb + w * cbl
            D = D + w * de
            acc = acc + w
        return (T, Cr, Cg, Cb, D, acc, done, ncon)

    init = (sT[...], sCr[...], sCg[...], sCb[...], sD[...], sAcc[...],
            sDone[...], sNcon[...])
    T, Cr, Cg, Cb, D, acc, done, ncon = jax.lax.fori_loop(
        0, (n_here + U - 1) // U, body, init)
    sT[...] = T
    sCr[...] = Cr
    sCg[...] = Cg
    sCb[...] = Cb
    sD[...] = D
    sAcc[...] = acc
    sDone[...] = done
    sNcon[...] = ncon

    @pl.when(c == n_chunks - 1)
    def _():
        r_ref[...] = sCr[...]
        g_ref[...] = sCg[...]
        b_ref[...] = sCb[...]
        d_ref[...] = sD[...]
        acc_ref[...] = sAcc[...]
        t_ref[...] = sT[...]
        ncon_ref[...] = sNcon[...]


def blend_forward_pallas(splat_data, counts, tile: int, gx: int, gy: int,
                         tid=None, mesh=None, axis=None):
    """splat_data [DATA_W, cap, T], counts [T] ->
    (r, g, b, D, acc, final_T [f32], ncon [i32]), each [P, T].

    ``tid`` [T] int32 names the actual tile id each column represents
    (defaults to identity); columns may be any permutation — the wrapper
    passes occupancy-sorted tiles for load-balanced groups.

    ``mesh``/``axis``: shard the tile/position axis over a device mesh —
    each device runs the Mosaic kernels on its strip of tile columns
    (shard_map; the sequence-parallel analog for splatting, SURVEY.md
    section 5.7). Columns must be dealt round-robin by occupancy rank
    (ops.tiles.bin_splats tile_shards) so per-device groups stay
    load-balanced."""
    if mesh is not None:
        from jax import shard_map
        from jax.sharding import PartitionSpec as P
        if tid is None:
            tid = jnp.arange(splat_data.shape[2], dtype=jnp.int32)
        fn = shard_map(
            functools.partial(_blend_forward_local, tile, gx, gy),
            mesh=mesh,
            in_specs=(P(None, None, axis), P(axis), P(axis)),
            out_specs=tuple([P(None, axis)] * 7),
            check_vma=False)
        return fn(splat_data, counts, tid)
    return _blend_forward_local(tile, gx, gy, splat_data, counts, tid)


def _blend_forward_local(tile: int, gx: int, gy: int, splat_data, counts,
                         tid):
    _, cap, num_tiles = splat_data.shape
    P = tile * tile
    gt, n_groups, cc, n_chunks = _group_geometry(num_tiles, cap)
    gmax = jnp.max(counts.reshape(n_groups, gt), axis=1).astype(jnp.int32)
    if tid is None:
        tid = jnp.arange(num_tiles, dtype=jnp.int32)

    out_spec = pl.BlockSpec((P, gt), lambda g, c, s: (0, g),
                            memory_space=pltpu.VMEM)
    meta_spec = pl.BlockSpec((8, gt), lambda g, c, s: (0, g),
                             memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_groups, n_chunks),
        in_specs=[
            pl.BlockSpec((DATA_W, cc, gt), lambda g, c, s: (0, c, g),
                         memory_space=pltpu.VMEM),
            meta_spec,
            meta_spec,
        ],
        out_specs=[out_spec] * 7,
        scratch_shapes=[pltpu.VMEM((P, gt), jnp.float32)] * 7
        + [pltpu.VMEM((P, gt), jnp.int32)],
    )
    outs = pl.pallas_call(
        functools.partial(_fwd_kernel, tile, gx, cc),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((P, num_tiles), jnp.float32)] * 6
        + [jax.ShapeDtypeStruct((P, num_tiles), jnp.int32)],
        interpret=INTERPRET,
    )(gmax, splat_data, counts_rows(counts, num_tiles),
      tid_rows(tid, num_tiles))
    return outs


def _bwd_kernel(tile, gx, cc, gmax_ref, data_ref, counts_ref, tid_ref,
                tf_ref, ncon_ref,
                ur_ref, ug_ref, ub_ref, ud_ref, uone_ref, bgterm_ref,
                grad_ref,
                sT, sSr, sSg, sSb, sSd, sS1):
    gt = tf_ref.shape[1]
    P = tile * tile
    g = pl.program_id(0)
    c = pl.program_id(1)             # reversed chunk order via index maps
    n_chunks = pl.num_programs(1)
    chunk = n_chunks - 1 - c         # actual cap-chunk being processed
    px, py = _pixel_coords(tile, gx, gt, tid_ref)

    @pl.when(c == 0)
    def _():
        sT[...] = tf_ref[...]
        for ref in (sSr, sSg, sSb, sSd, sS1):
            ref[...] = jnp.zeros((P, gt), jnp.float32)

    ncon = ncon_ref[...]
    Tf = tf_ref[...]
    ur = ur_ref[...]
    ug = ug_ref[...]
    ub = ub_ref[...]
    ud = ud_ref[...]
    uone = uone_ref[...]
    bg_term = bgterm_ref[...]

    grad_ref[...] = jnp.zeros_like(grad_ref)
    n_here = jnp.clip(gmax_ref[g] - chunk * cc, 0, cc)
    cnt = counts_ref[0:1, :]
    tb = -Tf * bg_term               # splat-invariant: hoisted off the walk

    # UNROLL x{BWD_UNROLL} back-to-front: blocks walk from the top; within
    # a block the heavy per-splat work (power/exp/gdx) is hoisted into a
    # parallel section, the serial T/accum recurrence stays per-splat.
    # Rows in [n_here, ceil-padded top) fail the blended test and write
    # zeros. The unroll factor is VMEM-bound: see BWD_UNROLL/BWD_CAP_CHUNK
    # at the top of this file for the current budget.
    U = BWD_UNROLL
    n_blocks = (n_here + U - 1) // U

    def body(ii, carry):
        jbase = (n_blocks - 1 - ii) * U
        pre = []
        for u in range(U):
            j = jbase + u
            # clamp as in the forward kernel: the top unrolled block may
            # reach past cc when cc % U != 0; masked rows produce all-zero
            # grads and (iterating u DESCENDING below) their clamped
            # grad_ref[:, cc-1, :] writes land before the real row's write
            row = data_ref[:, jnp.minimum(j, cc - 1), :]
            (mx, my, ca, cb, ccn, op, de, cr, cg, cbl) = _split_row(row)
            vld = ((chunk * cc + j) < cnt) & (j < cc)
            dx = mx - px
            dy = my - py
            power = -0.5 * (ca * dx * dx + ccn * dy * dy) - cb * dx * dy
            G = jnp.exp(power)
            oG = op * G
            alpha = jnp.minimum(ALPHA_MAX, oG)
            blended = (vld & (power <= 0.0) & (alpha >= ALPHA_MIN)
                       & (chunk * cc + j < ncon))
            # the reciprocal is hoisted off the serial recurrence (the
            # VPU divide is the longest-latency op in the chain). Only 4
            # [P,GT] planes ride per unrolled splat (oG, blended, G,
            # inv1ma): alpha is one min() from oG, and dx/dy/gdx/gdy are
            # recomputed in the parallel section from the [1,GT] attr
            # rows — each dropped plane buys scoped-VMEM headroom that
            # funds the deeper unroll.
            inv1ma = 1.0 / (1.0 - alpha)
            pre.append((oG, blended, op, de, cr, cg, cbl,
                        ca, cb, ccn, mx, my, G, inv1ma))

        (T, Sr, Sg, Sb, Sd, S1) = carry

        def red(x):
            return jnp.sum(x, axis=0, keepdims=True)

        # SERIAL section: only the T recurrence, the strictly-behind
        # SUFFIX weighted sums S_c = sum_{k behind} c_k * w_k, and the
        # per-splat dL_da that closes over them. The CUDA form keeps a
        # weighted-average accum_rec + last-contributor planes (10
        # carries, ~30 ops/splat); algebraically
        # T_i*(c_i - accum_rec_i) == T_i*c_i - S_i/(1-alpha_i), so the
        # suffix form needs 5 carries and ~half the ops — same grads up
        # to f32 rounding (backward.cu:477-585 semantics preserved).
        # dL_da and w are STASHED so the 10 gradient reductions per
        # splat move to the parallel section below, off the loop-carried
        # chain.
        dLs = []
        for u in reversed(range(U)):
            (oG, blended, op, de, cr, cg, cbl,
             ca, cb, ccn, mx, my, G, inv1ma) = pre[u]
            alpha = jnp.minimum(ALPHA_MAX, oG)

            T = jnp.where(blended, T * inv1ma, T)
            w = jnp.where(blended, alpha * T, 0.0)

            Q = (ur * Sr + ug * Sg + ub * Sb + ud * Sd + uone * S1)
            dL_da = (T * (ur * cr + ug * cg + ub * cbl + ud * de + uone)
                     + (tb - Q) * inv1ma)
            dL_da = jnp.where(blended, dL_da, 0.0)
            dLs.append((u, dL_da, w))

            # w is already zero for non-blended splats: no where needed
            Sr = Sr + w * cr
            Sg = Sg + w * cg
            Sb = Sb + w * cbl
            Sd = Sd + w * de
            S1 = S1 + w

        # PARALLEL section: gradient reductions from the stashed
        # (dL_da, w); no serial dependency, so the VPU pipelines across
        # splats. The per-tile attribute rows (op, ca, cb, ccn) are
        # [1, GT] constants over a tile's pixels, so they FACTOR OUT of
        # the sublane reductions: only six centered moment planes
        # h*{1,dx,dy,dx2,dxdy,dy2} are built per splat (vs ten full
        # gradient planes) and the [1, GT] row algebra after the
        # reductions is ~free. dLs iterates in the SAME descending-u
        # order as the serial loop, so a clamped duplicate row's
        # grad_ref write (j >= cc when cc % U != 0) still lands before
        # the real row's.
        for u, dL_da, w in dLs:
            (oG, blended, op, de, cr, cg, cbl,
             ca, cb, ccn, mx, my, G, inv1ma) = pre[u]
            dx = mx - px
            dy = my - py
            # h = where(unclamped, G, 0) * dL_da: the common factor of
            # every conic/mean/opacity gradient (dG = op * h)
            h = jnp.where(oG < ALPHA_MAX, G, 0.0) * dL_da
            hdx = h * dx
            hdy = h * dy
            r0 = red(h)
            r1 = red(hdx)
            r2 = red(hdy)
            r3 = red(hdx * dx)
            r4 = red(hdx * dy)
            r5 = red(hdy * dy)
            jc = jnp.minimum(jbase + u, cc - 1)
            out = jnp.concatenate([
                -op * (ca * r1 + cb * r2),                  # d mx
                -op * (ccn * r2 + cb * r1),                 # d my
                -0.5 * op * r3,                             # d ca
                -op * r4,                                   # d cb
                -0.5 * op * r5,                             # d cc
                r0,                                         # d op
                red(w * ud),                                # d depth
                red(w * ur),                                # d r
                red(w * ug),                                # d g
                red(w * ub),                                # d b
            ], axis=0)                                      # [GRAD_W, GT]
            grad_ref[:, jc, :] = out
        return (T, Sr, Sg, Sb, Sd, S1)

    init = (sT[...], sSr[...], sSg[...], sSb[...], sSd[...], sS1[...])
    (T, Sr, Sg, Sb, Sd, S1) = jax.lax.fori_loop(0, n_blocks, body, init)
    sT[...] = T
    sSr[...] = Sr
    sSg[...] = Sg
    sSb[...] = Sb
    sSd[...] = Sd
    sS1[...] = S1


def blend_backward_pallas(splat_data, counts, tile: int, gx: int, gy: int,
                          final_T, ncon, u_r, u_g, u_b, u_d, u_one,
                          bg_term, tid=None, mesh=None, axis=None):
    """All pixel-state inputs [P, T]; returns per-entry gradients
    [GRAD_W, cap, T] (same layout as splat_data).

    The back-to-front walk per group is bounded by the LAST CONTRIBUTING
    entry (max ncon over the group's pixels), not the raw splat count —
    entries behind full saturation never blended, their grads are zero
    (grad blocks are zeroed unconditionally).

    ``mesh``/``axis``: shard the tile/position axis (see
    blend_forward_pallas)."""
    if mesh is not None:
        from jax import shard_map
        from jax.sharding import PartitionSpec as P_
        if tid is None:
            tid = jnp.arange(splat_data.shape[2], dtype=jnp.int32)
        fn = shard_map(
            functools.partial(_blend_backward_local, tile, gx, gy),
            mesh=mesh,
            in_specs=(P_(None, None, axis),) + (P_(axis),) * 2
            + (P_(None, axis),) * 8,
            out_specs=P_(None, None, axis),
            check_vma=False)
        return fn(splat_data, counts, tid, final_T, ncon, u_r, u_g, u_b,
                  u_d, u_one, bg_term)
    return _blend_backward_local(tile, gx, gy, splat_data, counts, tid,
                                 final_T, ncon, u_r, u_g, u_b, u_d, u_one,
                                 bg_term)


def _blend_backward_local(tile: int, gx: int, gy: int, splat_data, counts,
                          tid, final_T, ncon, u_r, u_g, u_b, u_d, u_one,
                          bg_term):
    _, cap, num_tiles = splat_data.shape
    P = tile * tile
    gt, n_groups, cc, n_chunks = _group_geometry(num_tiles, cap,
                                                 BWD_CAP_CHUNK)
    walk = jnp.minimum(counts, jnp.max(ncon, axis=0))
    gmax = jnp.max(walk.reshape(n_groups, gt), axis=1).astype(jnp.int32)
    if tid is None:
        tid = jnp.arange(num_tiles, dtype=jnp.int32)

    vec = pl.BlockSpec((P, gt), lambda g, c, s: (0, g),
                       memory_space=pltpu.VMEM)
    meta = pl.BlockSpec((8, gt), lambda g, c, s: (0, g),
                        memory_space=pltpu.VMEM)
    rev = lambda g, c, s: (0, n_chunks - 1 - c, g)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_groups, n_chunks),
        in_specs=[
            pl.BlockSpec((DATA_W, cc, gt), rev, memory_space=pltpu.VMEM),
            meta,                                    # counts rows
            meta,                                    # tile-id rows (i32)
            vec,                                     # final_T
            pl.BlockSpec((P, gt), lambda g, c, s: (0, g),
                         memory_space=pltpu.VMEM),   # ncon (i32)
            vec, vec, vec, vec, vec,                 # u_r..u_one
            vec,                                     # bg_term
        ],
        out_specs=[pl.BlockSpec((GRAD_W, cc, gt), rev,
                                memory_space=pltpu.VMEM)],
        scratch_shapes=[pltpu.VMEM((P, gt), jnp.float32)] * 6,
    )
    (grad,) = pl.pallas_call(
        functools.partial(_bwd_kernel, tile, gx, cc),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((GRAD_W, cap, num_tiles),
                                        jnp.float32)],
        interpret=INTERPRET,
    )(gmax, splat_data, counts_rows(counts, num_tiles),
      tid_rows(tid, num_tiles), final_T, ncon,
      u_r, u_g, u_b, u_d, u_one, bg_term)
    return grad
