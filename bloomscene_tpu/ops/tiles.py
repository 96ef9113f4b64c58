"""Tile binning for the TPU rasterizer — static shapes, no atomics.

Replaces the CUDA pipeline duplicateWithKeys -> cub radix sort ->
identifyTileRanges (reference submodules/depth-diff-gaussian-rasterization/
cuda_rasterizer/rasterizer_impl.cu:70-138, 278-338) with an XLA-friendly
formulation:

1. Global DEPTH PRE-SORT of the Gaussians (N elements, payload = original
   id). Pairs are then emitted in front-to-back order, so:
   - the per-tile order after a stable single-key sort by tile id is
     exactly the CUDA 64-bit (tile<<32 | float_bits(depth)) key order
     (ties between equal depths keep emission order, matching the CUDA
     radix sort's stability over the id-ordered duplicateWithKeys output);
   - overflow beyond ``pair_capacity`` drops the FARTHEST Gaussians first
     (the CUDA kernel never overflows — it reallocates; a static buffer
     must truncate, and depth-ordered truncation degrades gracefully,
     unlike the id-ordered truncation this replaces);
   - per-tile truncation at ``tile_capacity`` likewise keeps the nearest
     splats.
2. Per-Gaussian tile rectangle (same rounding as getRect, auxiliary.h:46-56).
3. Pair expansion into a *static-capacity* pair buffer: pair slot k maps to
   (gaussian, local tile) via a marker-scatter + running-max over the
   exclusive cumsum of tiles_touched — no dynamic allocation. On TPU,
   when the packed-rect preconditions hold, a Mosaic kernel
   (ops/pallas/pairs.py) replaces this chain, expanding rank->pair
   values with a one-hot MXU contraction over a VMEM-resident rank
   table (same outputs; see its module docstring).
4. Stable single-key sort by tile id (jax.lax.sort).
5. Tile ranges via searchsorted, then a fixed-capacity per-tile gather.

TPU note: the prefix sums here use a matmul formulation (lower-triangular
ones on the MXU) — XLA's native 1D cumsum/cummax lowering costs ~4 ms at
these sizes on a v5e, the two-level matmul form ~0.1 ms.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from .projection import ProjectedSplats

# Slab-attribute gather formulation: PADDED-INDEX (the zero tail is
# gathered from one appended zero column instead of concatenated after).
# Decision trail: GATHER_AB_r05.json — five attr formulations and four
# grad-reduction formulations measured in-context on a v5e; padded-index
# won by ~0.9 ms/step (12.74 vs 13.68) and the grad-reduction variants
# were all within noise of the plain lane take, so the losers and their
# knobs were deleted.


class TileBins(NamedTuple):
    entries: jnp.ndarray        # [num_tiles, tile_capacity] int32 gaussian ids
    entry_mask: jnp.ndarray     # [num_tiles, tile_capacity] bool
    num_pairs: jnp.ndarray      # [] int32 total (untruncated) pair count
    pair_overflow: jnp.ndarray  # [] int32 pairs dropped by pair_capacity
    tile_overflow: jnp.ndarray  # [] int32 entries dropped by tile_capacity
    gauss_sorted: jnp.ndarray   # [packed_capacity] int32 tile-then-depth order
    tile_sorted: jnp.ndarray    # [packed_capacity] int32 tile id per pair
    t_start: jnp.ndarray        # [num_tiles] int32 range starts into above
    counts: jnp.ndarray         # [num_tiles] int32 clamped to tile_capacity
    num_packed: jnp.ndarray     # [] int32 pairs surviving the zero-alpha cull
    packed_overflow: jnp.ndarray  # [] int32 survivors dropped by packed_capacity
    # gradient-reduction index (grad_index=True):
    # emission ("rank-major") order makes each Gaussian's pairs CONTIGUOUS,
    # so per-Gaussian gradient sums become cumsum + boundary-diff — all
    # vectorized lane ops, replacing the serial scatter-add segment-sum.
    # src_lane[e] is precomputed HERE (in sorted order, where every lookup
    # is a small-table or monotonic gather) instead of in the reducer
    # (where indexing by the sort inverse made every gather random-access).
    src_lane: jnp.ndarray | None = None      # [pair_capacity] int32: lane
    #   into the backward kernel's flattened [cap * T] grad buffer for each
    #   emission slot (tile_capacity * num_tiles = dump lane for dead pairs)
    starts_by_id: jnp.ndarray | None = None  # [n] int32 emission range start
    ends_by_id: jnp.ndarray | None = None    # [n] int32 emission range end
    # occupancy sort of the tile grid (kernel load balance; grad_index=True)
    perm: jnp.ndarray | None = None          # [T] position -> tile id
    pos: jnp.ndarray | None = None           # [T] tile id -> position
    # kernel-ready splat slab (attr_rows given + grad_index):
    # [10, tile_capacity, T] f32 in POSITION space — slab[:, s, p] is the
    # s-th nearest splat of the tile at occupancy-sorted position p.
    # Built here (not in the blend wrapper) so the whole pair pipeline
    # lives in one place and the expansion can exploit binning internals.
    slab: jnp.ndarray | None = None


def tile_grid(W: int, H: int, tile: int) -> tuple[int, int]:
    return (-(-W // tile), -(-H // tile))


def pltpu_bitcast_f32_to_i32(x: jnp.ndarray) -> jnp.ndarray:
    """f32 -> raw bits; order-preserving for positive floats (the CUDA
    binning packs depth float bits into its sort key the same way,
    rasterizer_impl.cu:70-111)."""
    return lax.bitcast_convert_type(x, jnp.int32)


def cumsum_f32_exact(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive prefix sum of a 1D f32 array of small non-negative ints.

    Two-level matmul scan: rows of 128 against a triangular ones matrix on
    the MXU (HIGHEST precision — exact for integer-valued f32 < 2^24),
    with a recursive carry of row totals. ~40x faster than XLA's 1D
    cumsum lowering on TPU at 10^5..10^6 elements.
    """
    P = x.shape[0]
    C = 128
    if P <= C:
        return jnp.cumsum(x)
    R = -(-P // C)
    xp = jnp.pad(x, (0, R * C - P)).reshape(R, C)
    tri = jnp.triu(jnp.ones((C, C), x.dtype))          # tri[k,j]=1 for k<=j
    within = jnp.matmul(xp, tri, precision=lax.Precision.HIGHEST)
    carry_incl = cumsum_f32_exact(within[:, -1])       # [R] inclusive
    carry = carry_incl - within[:, -1]                 # exclusive (exact)
    return (within + carry[:, None]).reshape(-1)[:P]


def cumsum_lanes(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive prefix sum along axis=1 of a [R, P] f32 array.

    Same two-level matmul formulation as cumsum_f32_exact (blocks of 128
    lanes against a triangular ones matrix on the MXU, HIGHEST
    precision), batched over rows. For float data the block reordering
    changes rounding vs a sequential scan — fine for gradient
    reductions, where summation order is unspecified anyway.
    """
    R, P = x.shape
    C = 128
    if P <= C:
        return jnp.cumsum(x, axis=1)
    B = -(-P // C)
    xp = jnp.pad(x, ((0, 0), (0, B * C - P))).reshape(R * B, C)
    tri = jnp.triu(jnp.ones((C, C), x.dtype))
    within = jnp.matmul(xp, tri,
                        precision=lax.Precision.HIGHEST).reshape(R, B, C)
    totals = within[:, :, -1]                        # [R, B]
    carry = jnp.cumsum(totals, axis=1) - totals      # exclusive, small
    return (within + carry[:, :, None]).reshape(R, B * C)[:, :P]


def cummax_1d(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive prefix max of a 1D array, two-level formulation.

    Row-wise cummax on [R, 128] (7 lane-shift passes) + a short carry
    cummax over the R row maxima — much cheaper than XLA's flat-1D
    lowering at >10^5 elements.
    """
    P = x.shape[0]
    C = 128
    if P <= 4 * C:
        return lax.cummax(x)
    R = -(-P // C)
    pad_val = x.flatten()[0:1] * 0 + (
        jnp.finfo(x.dtype).min if jnp.issubdtype(x.dtype, jnp.floating)
        else jnp.iinfo(x.dtype).min)
    xp = jnp.concatenate([x, jnp.broadcast_to(pad_val, (R * C - P,))])
    xm = xp.reshape(R, C)
    within = lax.cummax(xm, axis=1)
    row_max = within[:, -1]                            # [R]
    carry_incl = cummax_1d(row_max)
    # exclusive shift: carry[r] = max over rows < r
    carry = jnp.concatenate([pad_val, carry_incl[:-1]])
    return jnp.maximum(within, carry[:, None]).reshape(-1)[:P]


def compute_tile_rects(proj: ProjectedSplats, W: int, H: int, tile: int,
                       opacities: jnp.ndarray | None = None):
    """Per-Gaussian clamped tile rectangle [x0,x1)x[y0,y1) + touched count.

    Without ``opacities`` this is the reference rect (getRect,
    auxiliary.h:46-56): a square of the 3-sigma circle radius. With
    ``opacities`` the square is INTERSECTED with the opacity-aware ellipse
    bounding box: a pixel can contribute only when
    alpha = opac * exp(-q) >= 1/255, i.e. q <= ln(255*opac), and the
    extent of {q <= qmax} along x is sqrt(2*qmax*Sigma_xx) with
    Sigma = inv(conic) (the DILATED 2D covariance the blend uses). The
    intersection keeps the pair set a subset of the reference's while
    dropping only pairs the per-pixel 1/255 test would ignore anyway —
    outputs and gradients are bitwise unchanged, but anisotropic and
    low-opacity splats emit far fewer pairs (the per-tile exact-zero cull
    in bin_splats then prunes the corner tiles this box still keeps).
    """
    gx, gy = tile_grid(W, H, tile)
    r = proj.radius.astype(jnp.float32)
    x, y = proj.mean2d[:, 0], proj.mean2d[:, 1]
    live = proj.valid
    # (int) cast in CUDA truncates toward zero, but values are clamped to
    # [0, grid] afterwards, so floor vs trunc only differs for negatives that
    # clamp to 0 anyway.
    x0 = jnp.clip(jnp.floor((x - r) / tile), 0, gx).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor((y - r) / tile), 0, gy).astype(jnp.int32)
    x1 = jnp.clip(jnp.floor((x + r + tile - 1) / tile), 0,
                  gx).astype(jnp.int32)
    y1 = jnp.clip(jnp.floor((y + r + tile - 1) / tile), 0,
                  gy).astype(jnp.int32)
    if opacities is not None:
        ca, cb, cc = proj.conic[:, 0], proj.conic[:, 1], proj.conic[:, 2]
        det = jnp.maximum(ca * cc - cb * cb, 1e-24)
        # + 1e-3 threshold margin and + 1e-2 px extent margin: covers f32
        # skew between this bound and the kernels' per-pixel power (same
        # margin family as the bin_splats cull).
        qmax = jnp.log(jnp.maximum(255.0 * opacities, 1e-12)) + 1e-3
        s2 = 2.0 * jnp.maximum(qmax, 0.0) / det
        rx = jnp.sqrt(s2 * cc) + 1e-2
        ry = jnp.sqrt(s2 * ca) + 1e-2
        # INCLUSIVE-tile bounds for the float extents: the CUDA-form
        # "+ tile - 1" trick drops the tile of a boundary pixel that
        # lands exactly on a tile edge — harmless with the reference's
        # ceil'd integer radius, but a float ellipse extent hits that
        # boundary systematically. floor((x + rx)/tile) + 1 keeps every
        # pixel within the extent; intersecting with the reference rect
        # keeps the pair set a subset of the reference's.
        x0 = jnp.maximum(x0, jnp.clip(jnp.floor((x - rx) / tile), 0,
                                      gx).astype(jnp.int32))
        y0 = jnp.maximum(y0, jnp.clip(jnp.floor((y - ry) / tile), 0,
                                      gy).astype(jnp.int32))
        x1 = jnp.minimum(x1, jnp.clip(jnp.floor((x + rx) / tile) + 1, 0,
                                      gx).astype(jnp.int32))
        y1 = jnp.minimum(y1, jnp.clip(jnp.floor((y + ry) / tile) + 1, 0,
                                      gy).astype(jnp.int32))
        live = live & (qmax > 0)
    touched = jnp.where(live,
                        jnp.maximum(x1 - x0, 0) * jnp.maximum(y1 - y0, 0),
                        0)
    return x0, y0, x1, y1, touched


def bin_splats(proj: ProjectedSplats, W: int, H: int, tile: int,
               pair_capacity: int, tile_capacity: int,
               opacities: jnp.ndarray | None = None,
               packed_capacity: int | None = None,
               grad_index: bool = False,
               need_entries: bool = True,
               attr_rows: jnp.ndarray | None = None,
               tile_shards: int = 1,
               force_pairs_kernel: bool = False) -> TileBins:
    """Build per-tile depth-sorted splat lists (static shapes throughout).

    ``opacities`` (optional, [N], stop-gradient values) enables the
    EXACT-ZERO PAIR CULL: a pair whose maximum possible alpha over its
    tile's pixel box is < 1/255 can never pass the blend's contribution
    test (alpha >= 1/255, forward.cu:427-432 semantics), in forward OR
    backward — dropping it leaves every output and gradient bitwise
    unchanged. The test is the exact minimum of the conic quadratic over
    the tile's pixel box vs ln(255*opacity) (with a small safety margin
    for f32 rounding). The CUDA reference conservatively keeps the full
    radius-square rect (getRect, auxiliary.h:46-56); on the bench scene
    the exact test drops ~24% of pairs, shrinking every pair-proportional
    cost (pack, blend walk, gradient reduction).

    ``packed_capacity`` (static, <= pair_capacity) sizes the post-cull
    sorted pair list (gauss_sorted/tile_sorted and the per-tile slabs).
    Culled pairs sort to the tail, so a snug packed buffer skips them;
    survivors beyond it are dropped and reported in ``packed_overflow``.

    ``attr_rows`` ([10, N] f32, stop-gradient VALUES in original-id order:
    mean2d_x, mean2d_y, conic_a, conic_b, conic_c, opacity, depth, r, g, b)
    enables kernel-slab construction (requires ``opacities`` and
    ``grad_index``): the returned ``TileBins.slab`` [10, tile_capacity, T]
    is the Pallas blend kernels' direct input (rows leading — no
    transpose, no pad rows), built by an id->sorted gather plus one
    expansion gather.
    """
    gx, gy = tile_grid(W, H, tile)
    num_tiles = gx * gy
    n = proj.mean2d.shape[0]
    if packed_capacity is None:
        packed_capacity = pair_capacity
    if n == 0:
        return TileBins(
            entries=jnp.zeros((num_tiles, tile_capacity), jnp.int32),
            entry_mask=jnp.zeros((num_tiles, tile_capacity), bool),
            num_pairs=jnp.int32(0), pair_overflow=jnp.int32(0),
            tile_overflow=jnp.int32(0),
            gauss_sorted=jnp.zeros((packed_capacity,), jnp.int32),
            tile_sorted=jnp.full((packed_capacity,), num_tiles, jnp.int32),
            t_start=jnp.zeros((num_tiles,), jnp.int32),
            counts=jnp.zeros((num_tiles,), jnp.int32),
            num_packed=jnp.int32(0), packed_overflow=jnp.int32(0))

    x0, y0, x1, _y1, touched = compute_tile_rects(proj, W, H, tile,
                                                  opacities=opacities)

    # depth pre-sort carrying the rect data as SORT PAYLOADS: moving
    # payload columns through lax.sort costs less than the random [n, 4]
    # row gather by an argsort order (gathers are row-latency-bound).
    # Stable, so equal depths keep id order — together with the stable
    # tile sort this reproduces the CUDA (tile, depth-bits, emission
    # order) key exactly (rasterizer_impl.cu:70-111 + stable radix sort).
    # The three 9-bit rect fields ride in ONE packed i32 payload (sort
    # cost is per-operand per-pass).
    width = jnp.maximum(x1 - x0, 1)
    # zero-touched splats (invalid OR rect/opacity-culled) sort to the
    # tail: they emit no pairs either way, and pushing them out of the
    # live prefix makes the rank space GAP-FREE — B consecutive pair
    # slots then touch at most B+1 consecutive ranks, the bounded-window
    # property the Pallas pair-expansion kernel needs (ops/pallas/pairs).
    key = jnp.where(touched > 0, proj.depth, jnp.inf)
    pack_rect4 = gx <= 127 and gy <= 127
    pack_rect = gx <= 511 and gy <= 511
    if pack_rect4:
        # all four rect fields fit one i32 (7 bits each at <=127 tiles per
        # axis), so ``touched`` = w*h is RECOMPUTED post-sort instead of
        # riding as its own payload — one fewer 32-bit operand through
        # every pass of the stable depth sort.
        # height carries the LIVENESS: zero it whenever the original
        # ``touched`` is zero (dead splat, or x-empty rect where the
        # width field's max(.,1) floor would otherwise fake a pair)
        height = jnp.where(touched > 0, jnp.maximum(_y1 - y0, 0), 0)
        rect_packed = (x0 << 21) | (y0 << 14) | (width << 7) | height
        _, packed_s, order = lax.sort(
            (key, rect_packed, jnp.arange(n, dtype=jnp.int32)),
            num_keys=1, is_stable=True)
        x0_s = packed_s >> 21
        y0_s = (packed_s >> 14) & 127
        w_s = (packed_s >> 7) & 127
        touched_s = w_s * (packed_s & 127)
    elif pack_rect:
        rect_packed = (x0 << 18) | (y0 << 9) | width
        _, packed_s, touched_s, order = lax.sort(
            (key, rect_packed, touched,
             jnp.arange(n, dtype=jnp.int32)), num_keys=1, is_stable=True)
        x0_s = packed_s >> 18
        y0_s = (packed_s >> 9) & 511
        w_s = packed_s & 511
    else:
        _, x0_s, y0_s, w_s, touched_s, order = lax.sort(
            (key, x0, y0, width, touched,
             jnp.arange(n, dtype=jnp.int32)), num_keys=1, is_stable=True)

    offsets = cumsum_f32_exact(touched_s.astype(jnp.float32)).astype(jnp.int32)
    total = offsets[-1]
    starts = offsets - touched_s                       # exclusive cumsum

    kbits = max(1, pair_capacity - 1).bit_length()
    packed_key_ok = kbits < 31 and (num_tiles + 1) < (1 << (31 - kbits))

    # Pallas pair-expansion kernel (ops/pallas/pairs.py): emits the
    # packed tile-sort key + gaussian id per pair slot directly, skipping
    # the marker-scatter/cummax rank recovery and every pair-sized
    # random gather below. Exact for keys/ids (digit-split bf16 MXU
    # expansion); the cull margin is wider (0.02 vs 1e-3), which can only
    # KEEP more never-contributing pairs — outputs/grads are unchanged.
    keyi_kernel = None
    if opacities is not None and pack_rect4 and packed_key_ok:
        from .pallas.pairs import expand_pairs
        atab_f = jnp.stack([
            proj.mean2d[:, 0], proj.mean2d[:, 1], proj.conic[:, 0],
            proj.conic[:, 1], proj.conic[:, 2],
            jnp.log(jnp.maximum(255.0 * opacities, 1e-12))], 0)
        atab_rk = jnp.take(atab_f, order, axis=1)            # [6, n]
        starts_full = jnp.minimum(
            jnp.concatenate([starts, total[None]]),
            jnp.int32(pair_capacity))
        kout = expand_pairs(
            starts_full, x0_s, y0_s, w_s, order,
            atab_rk[0], atab_rk[1], atab_rk[2], atab_rk[3], atab_rk[4],
            atab_rk[5], pair_capacity, gx, tile, kbits, num_tiles,
            force_pallas=force_pairs_kernel)
        if kout is not None:
            keyi_kernel, gauss_kernel, num_packed_kernel = kout

    n_att = 0 if attr_rows is None else attr_rows.shape[0]
    k = jnp.arange(pair_capacity, dtype=jnp.int32)
    if keyi_kernel is not None:
        return _finish_bins(
            pair_capacity, tile_capacity, packed_capacity, grad_index,
            need_entries, attr_rows, tile_shards, num_tiles, n_att,
            kbits, total, order, starts, offsets, gauss_kernel,
            num_packed_kernel, keyi=keyi_kernel)

    # pair slot k -> owning RANK (depth-order index). Equivalent to
    # searchsorted(offsets, k, 'right') but O(P) scatter + cummax instead of
    # P binary searches (searchsorted was ~100ms at 800K pairs on TPU):
    # drop a marker (rank + 1) at each rank's start slot and take the
    # running max; slots before the first marker clamp to rank 0.
    rid = jnp.arange(n, dtype=jnp.int32)
    # start slots of touched>0 ranks are strictly increasing, and untouched
    # ranks get DISTINCT out-of-bounds slots (dropped) => indices globally
    # unique, so a plain scatter-SET suffices (no combiner): measured ~25x
    # faster than the max-combiner scatter on v5e (0.03 vs 0.84 ms)
    markers = jnp.zeros((pair_capacity,), jnp.float32).at[
        jnp.where(touched_s > 0, starts, pair_capacity + rid)].set(
        (rid + 1).astype(jnp.float32), mode='drop', unique_indices=True)
    rank_c = jnp.maximum(cummax_1d(markers).astype(jnp.int32) - 1, 0)

    # one packed per-pair gather; carries the ORIGINAL id as a row so no
    # second 524K-gather is needed to map ranks back (measured ~5 ms
    # saved). TRANSPOSED [rows, P]: a [P, rows] gather output would pad
    # its minor dim -> 128 lanes (25x hidden HBM traffic). The cull's
    # per-splat table rides along as extra rows (bitcast to i32): one
    # [n]-sized re-key to rank order replaces a second full-P gather —
    # gather cost is dominated by index processing, not extra rows.
    atab_s = None
    if opacities is not None:
        atab = jnp.stack([
            proj.mean2d[:, 0], proj.mean2d[:, 1], proj.conic[:, 0],
            proj.conic[:, 1], proj.conic[:, 2],
            jnp.log(jnp.maximum(255.0 * opacities, 1e-12))], 0)  # [6, N]
        atab_s = lax.bitcast_convert_type(
            jnp.take(atab, order, axis=1), jnp.int32)            # [6, n]
    if pack_rect:
        tab = jnp.stack([starts, packed_s, order], 0)
        if atab_s is not None:
            tab = jnp.concatenate([tab, atab_s], 0)
        pgT = jnp.take(tab, rank_c, axis=1)             # [3(+R), P]
        gauss_o = pgT[2]
        if pack_rect4:
            p_x0 = pgT[1] >> 21
            p_y0 = (pgT[1] >> 14) & 127
            p_w = (pgT[1] >> 7) & 127
        else:
            p_x0 = pgT[1] >> 18
            p_y0 = (pgT[1] >> 9) & 511
            p_w = pgT[1] & 511
        av = pgT[3:]
    else:
        tab = jnp.stack([starts, x0_s, y0_s, w_s, order], 0)
        if atab_s is not None:
            tab = jnp.concatenate([tab, atab_s], 0)
        pgT = jnp.take(tab, rank_c, axis=1)             # [5(+R), P]
        gauss_o = pgT[4]
        p_x0, p_y0, p_w = pgT[1], pgT[2], pgT[3]
        av = pgT[5:]

    k = jnp.arange(pair_capacity, dtype=jnp.int32)
    local = k - pgT[0]
    w = p_w
    # local // width via exact float-reciprocal trick (integer div lowers
    # to a slow VPU loop): local <= ~2^13, width <= 2^7 => f32 exact with a
    # 2^-10 nudge (error < 2^-9 < min fraction 1/width)
    q = jnp.floor(local.astype(jnp.float32)
                  * (1.0 / w.astype(jnp.float32))
                  + 0.0009765625).astype(jnp.int32)
    tx = p_x0 + (local - q * w)
    ty = p_y0 + q
    pair_valid = k < total

    if opacities is not None:
        # exact-zero pair cull (see docstring): minimum of the conic
        # quadratic q(d) = 0.5(a dx^2 + c dy^2) + b dx dy over the tile's
        # pixel box [tx*tile, tx*tile+tile-1] x [ty*tile, ...] vs the
        # contribution threshold ln(255 * opacity). Splat attrs arrived
        # as extra rows of the pg gather (av, bitcast back to f32).
        avf = lax.bitcast_convert_type(av, jnp.float32)
        mx, my, ca, cb, cc, ln_t = (avf[0], avf[1], avf[2], avf[3],
                                    avf[4], avf[5])
        ftile = jnp.float32(tile)
        lox = tx.astype(jnp.float32) * ftile - mx
        hix = lox + (ftile - 1.0)
        loy = ty.astype(jnp.float32) * ftile - my
        hiy = loy + (ftile - 1.0)

        def qq(dx, dy):
            return 0.5 * (ca * dx * dx + cc * dy * dy) + cb * dx * dy

        def edge_x(dx):          # min over dy at fixed dx (clamped)
            return qq(dx, jnp.clip(-cb * dx / cc, loy, hiy))

        def edge_y(dy):
            return qq(jnp.clip(-cb * dy / ca, lox, hix), dy)

        qmin = jnp.minimum(
            jnp.minimum(edge_x(lox), edge_x(hix)),
            jnp.minimum(edge_y(loy), edge_y(hiy)))
        inside = (lox <= 0) & (hix >= 0) & (loy <= 0) & (hiy >= 0)
        qmin = jnp.where(inside, 0.0, qmin)
        # 1e-3 margin: covers f32 evaluation skew between this bound and
        # the kernels' per-pixel power; keeps any pair within rounding
        # distance of contributing.
        pair_live = pair_valid & (qmin <= ln_t + 1e-3)
    else:
        pair_live = pair_valid
    tile_id = jnp.where(pair_live, ty * gx + tx, num_tiles).astype(jnp.int32)
    num_packed = jnp.sum(pair_live.astype(jnp.int32))
    return _finish_bins(
        pair_capacity, tile_capacity, packed_capacity, grad_index,
        need_entries, attr_rows, tile_shards, num_tiles, n_att, kbits,
        total, order, starts, offsets, gauss_o, num_packed,
        keyi=None, tile_id=tile_id, k=k)


def _finish_bins(pair_capacity, tile_capacity, packed_capacity, grad_index,
                 need_entries, attr_rows, tile_shards, num_tiles, n_att,
                 kbits, total, order, starts, offsets, gauss_o, num_packed,
                 keyi=None, tile_id=None, k=None):
    """Tile sort -> ranges -> grad index/slab -> entries -> TileBins.

    Shared tail of ``bin_splats``: reached either from the XLA pair path
    (``tile_id``/``k`` given, the packed key is built here) or from the
    Pallas pair-expansion kernel (``keyi`` given directly; that path
    only exists under the packed-key branch's preconditions).
    """
    # sort by tile; emission order IS depth order, so within a tile pairs
    # come out front-to-back. Culled pairs carry tile_id == num_tiles and
    # sort to the tail, past packed_capacity.
    tids = jnp.arange(num_tiles, dtype=jnp.int32)
    src_lane = starts_by_id = ends_by_id = perm = pos = slab = None
    # NOTE: slab attribute values deliberately do NOT ride the tile sort
    # as payload operands — measured +4.6 ms/step for 10 extra operands
    # at bench size (221K pairs), far worse than the post-sort gather
    # below (sort payload cost is NOT the per-operand ~0.1 ms a
    # standalone measurement suggests once in the full-step context).
    if kbits < 31 and (num_tiles + 1) < (1 << (31 - kbits)):
        # UNIQUE single-key sort (tile << kbits | emission slot): the
        # embedded slot makes keys distinct, so an unstable sort is
        # deterministic AND skips the hidden iota operand XLA adds to
        # stabilize — one fewer 32-bit column through every sort pass.
        if keyi is None:
            keyi = (tile_id << kbits) | k
        key_s, gauss_s = lax.sort((keyi, gauss_o), num_keys=1,
                                  is_stable=False)
        eslot_s = key_s & ((1 << kbits) - 1)
        tile_full = key_s >> kbits
        key_s = key_s[:packed_capacity]
        gauss_s = gauss_s[:packed_capacity]
        tile_s = tile_full[:packed_capacity].astype(jnp.int32)
        # tile ranges directly on the packed keys (keys of tile t live in
        # [t << kbits, (t+1) << kbits)); ranges partition the sorted
        # list, so t_end[t] == t_start[t+1] — ONE (T+1)-probe search
        # instead of two T-probe ones (each is an ~18-step vectorized
        # binary search over the packed keys, ~0.14 ms at bench size)
        bounds = jnp.searchsorted(
            key_s, jnp.arange(num_tiles + 1, dtype=jnp.int32) << kbits,
            side='left').astype(jnp.int32)
        t_start = bounds[:num_tiles]
        t_end = bounds[1:]
    else:
        # (tile, emission slot) does not fit one 31-bit key (e.g. 1024
        # tiles x pair_capacity 2^21 at 512^2 with ~1M children): sort
        # LEXICOGRAPHICALLY on two unique int keys — the exact same
        # deterministic order as the packed key, at any size, and the
        # emission slot column keeps grad_index available.
        tile_full, eslot_s, gauss_sf = lax.sort(
            (tile_id, k, gauss_o), num_keys=2, is_stable=False)
        tile_s = tile_full[:packed_capacity]
        gauss_s = gauss_sf[:packed_capacity]
        # tile ranges: binary searches over the sorted pair list (cheap;
        # the scatter-min formulation serializes on collisions). For
        # integer keys side='right' of t == side='left' of t+1, so one
        # (T+1)-probe search yields both range arrays.
        bounds = jnp.searchsorted(
            tile_s, jnp.arange(num_tiles + 1, dtype=jnp.int32),
            side='left').astype(jnp.int32)
        t_start = bounds[:num_tiles]
        t_end = bounds[1:]
    if grad_index:
        # occupancy sort of the tile grid (the kernels want groups of
        # similar splat count; the blend wrapper consumes perm/pos)
        counts_cl = jnp.minimum(t_end - t_start, tile_capacity)
        _, perm = lax.sort((-counts_cl, tids), num_keys=1, is_stable=True)
        if tile_shards > 1 and num_tiles % tile_shards == 0:
            # deal occupancy ranks round-robin over the shards: position
            # q on shard d = q // L holds rank (q % L) * S + d, so every
            # shard gets an equal share of heavy tiles AND stays
            # internally occupancy-sorted (balanced kernel groups)
            L = num_tiles // tile_shards
            rank_of_pos = (tids % L) * tile_shards + tids // L
            perm = perm[rank_of_pos]
        pos = jnp.zeros((num_tiles,), jnp.int32).at[perm].set(
            tids, unique_indices=True)
        # gradient-reduction gather index, built IN SORTED ORDER where
        # every lookup is a small-table gather (indexing the reducer's
        # kernel buffer by the sort INVERSE instead made each of these a
        # random gather over the full pair list — ~3 ms/step at bench
        # size). sorted position p of tile t, slot s maps to lane
        # s * num_tiles + pos[t] of the backward kernel's flat grad
        # buffer; one unique 2-key sort carries it back to emission order.
        pfull = jnp.arange(pair_capacity, dtype=jnp.int32)
        live_p = (pfull < packed_capacity) & (tile_full < num_tiles)
        tcl = jnp.minimum(tile_full, num_tiles - 1)
        tp = jnp.take(jnp.stack([t_start, pos]), tcl, axis=1)   # [2, P]
        slotp = pfull - tp[0]
        okp = live_p & (slotp >= 0) & (slotp < tile_capacity)
        src_of_p = jnp.where(okp, slotp * num_tiles + tp[1],
                             tile_capacity * num_tiles)
        # NOTE: both permutation applications below stay SORTS on purpose.
        # They are pure permutations (unique keys), so a unique-index
        # scatter-set is semantically identical — but measured in-loop on
        # a v5e the scatters are ~2x SLOWER (src_lane scatter 1.49 ms vs
        # ~0.7 ms sort; starts/ends scatters 1.76 ms vs ~0.75 ms sort).
        # TPU scatter lowering pays per-index overhead that the bitonic
        # sort amortizes.
        _, src_lane = lax.sort((eslot_s.astype(jnp.int32), src_of_p),
                               num_keys=1, is_stable=False)
        # per-ORIGINAL-ID emission ranges: rank r owns emission slots
        # [starts[r], offsets[r]); one 3-payload sort by the id
        # permutation re-keys both range arrays from rank to id order.
        _, starts_by_id, ends_by_id = lax.sort(
            (order, starts, offsets), num_keys=1, is_stable=False)
        if n_att:
            # kernel slab [10, tile_capacity, T] in position space:
            # id->sorted attribute gather (packed_capacity indices; rows
            # ride free) + the Pallas slab expansion (per-tile contiguous
            # DMA runs + MXU transpose; ~6x the equivalent XLA gather —
            # ops/pallas/expand.py). Leading-dim rows => the blend
            # kernels index the middle slot dim; no transpose, no pad
            # rows. The zero tail keeps beyond-range slots exact zeros.
            from .pallas.expand import expand_slab
            # padded-index form: the zero tail is GATHERED from one
            # appended zero column instead of concatenated after —
            # one [PCp+cap]-index gather, no 8 MB concat copy
            # (winning formulation; see the decision note atop this file)
            nsp = attr_rows.shape[1]
            tab_z = jnp.pad(attr_rows, ((0, 0), (0, 1)))
            idx_pad = jnp.concatenate(
                [gauss_s, jnp.full((tile_capacity,), nsp, jnp.int32)])
            asT = jnp.take(tab_z, idx_pad, axis=1)        # [10, PCp+cap]
            slab = expand_slab(asT, t_start[perm], tile_capacity,
                               num_tiles)

    # fixed-capacity per-tile lists: tile ranges are CONTIGUOUS in the
    # sorted pair list, so use vmapped dynamic slices (a 1M-element random
    # gather costs 3x more than the strided slice reads). The Pallas
    # backend packs straight from the sorted pair list and never reads
    # these — need_entries=False skips ~1.5 ms of dead work there.
    entries = entry_mask = None
    if need_entries:
        gpad = jnp.concatenate(
            [gauss_s, jnp.zeros((tile_capacity,), jnp.int32)])
        sliced = jax.vmap(
            lambda s: lax.dynamic_slice(gpad, (s,), (tile_capacity,)))(
            jnp.minimum(t_start, packed_capacity))
        c = jnp.arange(tile_capacity, dtype=jnp.int32)
        entry_mask = (t_start[:, None] + c[None, :]) < t_end[:, None]
        entries = jnp.where(entry_mask, sliced, 0).astype(jnp.int32)

    counts = t_end - t_start
    tile_overflow = jnp.sum(jnp.maximum(counts - tile_capacity, 0))
    pair_overflow = jnp.maximum(total - pair_capacity, 0)
    packed_overflow = jnp.maximum(num_packed - packed_capacity, 0)
    return TileBins(entries=entries, entry_mask=entry_mask,
                    num_pairs=total.astype(jnp.int32),
                    pair_overflow=pair_overflow.astype(jnp.int32),
                    tile_overflow=tile_overflow.astype(jnp.int32),
                    gauss_sorted=gauss_s,
                    tile_sorted=tile_s,
                    t_start=t_start,
                    counts=jnp.minimum(counts, tile_capacity),
                    num_packed=num_packed.astype(jnp.int32),
                    packed_overflow=packed_overflow.astype(jnp.int32),
                    src_lane=src_lane, starts_by_id=starts_by_id,
                    ends_by_id=ends_by_id, perm=perm, pos=pos, slab=slab)
