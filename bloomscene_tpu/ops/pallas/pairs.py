"""Pallas pair-expansion kernel: depth-ranked splats -> sort-ready pairs.

Replaces the XLA pair-expansion chain in ops.tiles.bin_splats (marker
scatter + cummax rank recovery + three [pair_capacity]-sized random
gathers + the per-pair tile/cull math) — ~3 ms/step of gather-bound
fusions at bench size — with one Mosaic kernel that emits, per pair
slot k, the packed tile-sort key ``(tile_id << kbits) | k`` and the
original Gaussian id.

How the rank -> pair expansion becomes a matmul (the trick):

- The caller's depth pre-sort pushes zero-touched splats to the tail
  (their sort key is +inf), so the ranks that own pairs are a GAP-FREE
  prefix: B consecutive pair slots touch at most B+1 consecutive ranks.
  Each grid block of B pairs therefore only needs a 128-aligned window
  of ``RW = B + 256`` ranks from the per-rank table (the whole table
  stays VMEM-resident; consecutive grid steps reuse it).
- Within a block, the rank-membership matrix
      onehot[j, r] = (starts[r] <= k_j) & (k_j < starts[r+1])
  has exactly one nonzero per live pair row, so every per-rank row
  expands to per-pair values with ONE MXU contraction
      out[24, B] = tab_window[24, RW] . onehot[B, RW]^T
  (rows 22-23 are sublane-alignment zeros).
- Integer rows (range starts, Gaussian ids) are split into base-256
  digit rows — each digit is bf16-exact, the one-hot contraction has a
  single nonzero term per output, and the f32 digit recombination is
  exact, so integer outputs are EXACT despite the bf16 MXU path.
- Float rows (mean2d, conic, ln(255*opacity)) feed only the exact-zero
  pair cull. Each rides as a HI/LO bf16 pair (hi = bf16(x), lo =
  bf16(x - hi)); because the one-hot contraction has a single nonzero
  term per output there is no accumulation rounding, so the recombined
  f32 value carries ~2^-17 relative error. The cull threshold margin is
  widened from 1e-3 to CULL_MARGIN = 0.02 to absorb it: in the common
  case the kernel only KEEPS a few more pairs than the f32 XLA path
  (all of which blend to exactly zero by the alpha >= 1/255 test —
  forward.cu:427-432). Bounded-error caveat: the fixed margin absorbs
  the ~2^-17 relative input error only while the conic quadratic's term
  magnitudes stay below ~2.5e3; for very anisotropic conics
  (eigenvalue ratio >~450, i.e. ~21:1 splat aspect) cancellation can
  push the perturbation past 0.02 and drop a pair the f32 path keeps.
  Any such pair's contribution is within ~2% of the 1/255 alpha floor,
  so outputs/gradients agree to that bound rather than bitwise.

Reference semantics being reproduced: duplicateWithKeys + the getRect
tile walk (rasterizer_impl.cu:70-111, auxiliary.h:46-56) with the
repo's exact-zero cull extension (ops/tiles.py docstring).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import blend as pb

LANE = 128
CULL_MARGIN = 0.02   # vs 1e-3 on the f32 XLA path; see module docstring
ROWS = 24            # sublane-aligned row count of the rank table
BLOCK = 512          # pair slots per grid step


def _on_tpu() -> bool:
    try:
        dev = jax.devices()[0]
        return 'tpu' in (dev.platform + str(dev)).lower()
    except Exception:
        return False


def build_rank_table(starts, x0, y0, w, order, mx, my, ca, cb, cc, ln_t,
                     width: int) -> jnp.ndarray:
    """Per-rank rows [24, width] f32: digit-split ints + hi/lo-split
    cull floats (see module docstring).

    ``starts`` is [n+1] (exclusive cumsum with the total appended,
    clamped to pair_capacity so every value stays < 2^24); the other
    inputs are [n]. All are zero-padded to ``width``.
    """
    n = x0.shape[0]

    def pad1(v, ln):
        return jnp.pad(v.astype(jnp.float32), (0, width - ln))

    def digits(v, ln):   # base-256 split, each digit bf16-exact
        vi = v.astype(jnp.int32)
        return (pad1(vi >> 16, ln), pad1((vi >> 8) & 255, ln),
                pad1(vi & 255, ln))

    def hilo(v):         # bf16 hi/lo split: hi + lo == v to ~2^-17 rel
        hi = v.astype(jnp.bfloat16).astype(jnp.float32)
        lo = (v - hi).astype(jnp.bfloat16).astype(jnp.float32)
        return pad1(hi, n), pad1(lo, n)

    s_h, s_m, s_l = digits(starts, n + 1)
    g_h, g_m, g_l = digits(order, n)
    rows = [s_h, s_m, s_l, g_h, g_m, g_l,
            pad1(x0, n), pad1(y0, n), pad1(w, n),
            *hilo(mx), *hilo(my), *hilo(ca), *hilo(cb), *hilo(cc),
            *hilo(ln_t),
            jnp.zeros((width,), jnp.float32).at[:n].set(1.0),
            jnp.zeros((width,), jnp.float32),
            jnp.zeros((width,), jnp.float32)]
    return jnp.stack(rows, 0)


def _pairs_kernel(B: int, RW: int, gx: int, tile: int, kbits: int,
                  num_tiles: int, sub: int,
                  base_ref, tab_ref, key_ref, gauss_ref):
    i = pl.program_id(0)
    for j in range(sub):
        _pairs_subblock(B, RW, gx, tile, kbits, num_tiles,
                        i * sub + j, j * B, base_ref, tab_ref,
                        key_ref, gauss_ref)


def _pairs_subblock(B: int, RW: int, gx: int, tile: int, kbits: int,
                    num_tiles: int, i, off: int,
                    base_ref, tab_ref, key_ref, gauss_ref):
    base = pl.multiple_of(base_ref[i], LANE)

    tabw = tab_ref[:, pl.ds(base, RW)]                      # [ROWS, RW]
    tabw16 = tabw.astype(jnp.bfloat16)

    # starts per rank (f32-exact digit recombination), [1, RW] on lanes
    sw = (tabw[0:1] * 65536.0 + tabw[1:2] * 256.0 + tabw[2:3])
    # starts[r+1]: left-rotate by one lane (the wrap lane is never a
    # used rank — the window has >= 127 lanes of slack by construction)
    swp = pltpu.roll(sw, RW - 1, axis=1)

    kcol = (jnp.float32(i * B)
            + jax.lax.broadcasted_iota(jnp.int32, (B, RW), 0)
            .astype(jnp.float32))
    onehot = ((sw <= kcol) & (kcol < swp)).astype(jnp.bfloat16)  # [B, RW]

    # [24, RW] . [B, RW]^T -> [24, B]; exactly one nonzero per output
    # element for live pairs, so bf16 operands with f32 accumulation are
    # exact for the digit rows.
    out = jax.lax.dot_general(
        tabw16, onehot, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                  # [24, B]

    starts_g = out[0:1] * 65536.0 + out[1:2] * 256.0 + out[2:3]
    gauss = (out[3:4] * 65536.0 + out[4:5] * 256.0
             + out[5:6]).astype(jnp.int32)
    p_x0, p_y0, p_w = out[6:7], out[7:8], out[8:9]
    mx = out[9:10] + out[10:11]
    my = out[11:12] + out[12:13]
    ca = out[13:14] + out[14:15]
    cb = out[15:16] + out[16:17]
    cc = out[17:18] + out[18:19]
    ln_t = out[19:20] + out[20:21]
    live = out[21:22] > 0.5                                  # colsum 0/1

    kf = (i * B + jax.lax.broadcasted_iota(jnp.int32, (1, B), 1))
    local = kf.astype(jnp.float32) - starts_g
    # local // w via the exact float-reciprocal trick (ops/tiles.py)
    wsafe = jnp.maximum(p_w, 1.0)
    q = jnp.floor(local * (1.0 / wsafe) + 0.0009765625)
    tx = p_x0 + (local - q * wsafe)
    ty = p_y0 + q

    # exact-zero pair cull: min of the conic quadratic over the tile's
    # pixel box vs ln(255*opacity) (ops/tiles.py bin_splats docstring)
    ftile = jnp.float32(tile)
    lox = tx * ftile - mx
    hix = lox + (ftile - 1.0)
    loy = ty * ftile - my
    hiy = loy + (ftile - 1.0)
    ca_s = jnp.where(ca == 0.0, 1e-20, ca)
    cc_s = jnp.where(cc == 0.0, 1e-20, cc)

    def qq(dx, dy):
        return 0.5 * (ca * dx * dx + cc * dy * dy) + cb * dx * dy

    qmin = jnp.minimum(
        jnp.minimum(qq(lox, jnp.clip(-cb * lox / cc_s, loy, hiy)),
                    qq(hix, jnp.clip(-cb * hix / cc_s, loy, hiy))),
        jnp.minimum(qq(jnp.clip(-cb * loy / ca_s, lox, hix), loy),
                    qq(jnp.clip(-cb * hiy / ca_s, lox, hix), hiy)))
    inside = (lox <= 0) & (hix >= 0) & (loy <= 0) & (hiy >= 0)
    qmin = jnp.where(inside, 0.0, qmin)
    pair_live = live & (qmin <= ln_t + CULL_MARGIN)

    tid = jnp.where(pair_live,
                    (ty * jnp.float32(gx) + tx).astype(jnp.int32),
                    num_tiles)
    key_ref[pl.ds(off, B)] = ((tid << kbits) | kf).reshape(B)
    gauss_ref[pl.ds(off, B)] = gauss.reshape(B)


def expand_pairs(starts, x0, y0, w, order, mx, my, ca, cb, cc, ln_t,
                 pair_capacity: int, gx: int, tile: int, kbits: int,
                 num_tiles: int, force_pallas: bool = False):
    """Rank table -> (keyi [P] i32, gauss [P] i32, num_live [] i32).

    ``starts`` [n+1]: exclusive cumsum with the total appended, values
    clamped to pair_capacity (< 2^24 required for the digit split). All
    live ranks form a gap-free prefix (caller guarantees: zero-touched
    splats depth-sort to the tail). Returns None when the kernel's
    shape constraints are not met (caller falls back to the XLA path).
    """
    n = x0.shape[0]
    B = BLOCK
    sub = 2            # 512-pair sub-computations per 1024-pair output
                       # block (1D i32 outputs demand T(1024) tiling)
    if (pair_capacity % (B * sub) or gx > 127 or pair_capacity >= 1 << 24
            or ROWS * (n + 1 + 2 * LANE) * 4 > 48 * 2 ** 20):
        return None
    if not (force_pallas or (not pb.INTERPRET and _on_tpu())):
        return None
    # window = alignment slack (<=127) + up to B+1 ranks + the
    # starts[r+1] lookahead for the last one -> B + 2*LANE keeps the
    # roll's wrap lane strictly past every used rank.
    RW = B + 2 * LANE
    nsub = pair_capacity // B
    nblocks = pair_capacity // (B * sub)
    width = -(-(n + 1) // LANE) * LANE + RW
    tab = build_rank_table(starts, x0, y0, w, order, mx, my, ca, cb, cc,
                           ln_t, width)

    # 128-aligned window base per sub-block: the rank owning its first
    # pair, rounded down. searchsorted over nsub values only.
    first_rank = jnp.maximum(
        jnp.searchsorted(
            starts, jnp.arange(nsub, dtype=jnp.int32) * B,
            side='right').astype(jnp.int32) - 1, 0)
    base_al = (first_rank // LANE) * LANE

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblocks,),
        in_specs=[pl.BlockSpec((ROWS, width), lambda i, base: (0, 0))],
        out_specs=[pl.BlockSpec((B * sub,), lambda i, base: (i,)),
                   pl.BlockSpec((B * sub,), lambda i, base: (i,))],
    )
    keyi, gauss = pl.pallas_call(
        functools.partial(_pairs_kernel, B, RW, gx, tile, kbits,
                          num_tiles, sub),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((pair_capacity,), jnp.int32),
                   jax.ShapeDtypeStruct((pair_capacity,), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20),
        interpret=pb.INTERPRET,
    )(base_al, tab)
    num_live = jnp.sum(((keyi >> kbits) != num_tiles).astype(jnp.int32))
    return keyi, gauss, num_live
