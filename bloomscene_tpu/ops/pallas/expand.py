"""Pallas slab-expansion kernel: sorted pair table -> kernel slab.

Replaces the XLA expansion gather in ops.tiles.bin_splats (slab[:, s, t] =
asT[:, t_start[t] + s]) — a cap*T-index random gather that measured
~2.3 ms/step at bench size (640*1024 = 655K indices; TPU gathers are
index-processing-bound at a few cycles per index).

The slab's per-tile columns are CONTIGUOUS runs of the tile-sorted pair
table, so the expansion is really one slice copy per tile. Per tile
group (128 tiles on lanes) the kernel:

1. DMAs each lane's [16, cap + 128] run from HBM at a 128-ALIGNED start
   (Mosaic requires lane-dim slice alignment; the over-copy covers any
   start offset) into a [GT, 16, cap+128] staging buffer — dst slices are
   leading-dim, always aligned.
2. Realigns each lane with one dynamic lane-roll (tpu.dynamic_rotate) by
   the start's residue mod 128.
3. Re-orients row r to the blend kernels' [cap, GT] tiles-on-lanes layout
   with an MXU transpose (dot_general against an identity, contracting
   the lane dim), DMA'ing each [cap, GT] plane straight to the HBM output
   (manual output DMAs — the out ref lives in ANY space, so VMEM holds
   only staging + one bounce buffer).

Falls back to the XLA gather when shapes don't meet the constraints
(cap % 8, VMEM budget) — and uses whichever path on CPU/interpret that
the caller forces (tests force the kernel; production interpret runs the
gather so CPU tests exercise the same arithmetic as the XLA reference).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import blend as pb

LANE = 128


def _on_tpu() -> bool:
    try:
        dev = jax.devices()[0]
        return 'tpu' in (dev.platform + str(dev)).lower()
    except Exception:
        return False


def _expand_kernel(gt: int, cap: int, width16: int, R: int,
                   tstart_ref, asT_ref, out_ref,
                   staging, bounce, in_sems, out_sem):
    g = pl.program_id(0)
    capp = cap + LANE

    def start_of(l):
        start = jnp.minimum(tstart_ref[g * gt + l], width16 - capp)
        astart = (start // LANE) * LANE
        return start, astart

    def dma_in(l, _):
        _, astart = start_of(l)
        pltpu.make_async_copy(
            asT_ref.at[:, pl.ds(astart, capp)],
            staging.at[l],
            in_sems.at[l],
        ).start()
        return 0

    jax.lax.fori_loop(0, gt, dma_in, 0)

    def wait_roll(l, _):
        pltpu.make_async_copy(
            asT_ref.at[:, pl.ds(0, capp)],      # shape-only wait
            staging.at[l],
            in_sems.at[l],
        ).wait()
        start, astart = start_of(l)
        off = start - astart
        # shift amount kept NON-NEGATIVE: capp - off == -off (mod capp);
        # dynamic_rotate's behavior for negative traced shifts is not
        # trustworthy on all Mosaic versions.
        staging[l] = pltpu.roll(staging[l], capp - off, axis=1)
        return 0

    jax.lax.fori_loop(0, gt, wait_roll, 0)

    eye = (jax.lax.broadcasted_iota(jnp.int32, (gt, gt), 0)
           == jax.lax.broadcasted_iota(jnp.int32, (gt, gt), 1))
    eyef = eye.astype(jnp.float32)
    for r in range(R):
        # [GT, cap] -> [cap, GT] on the MXU; bounce -> HBM out plane
        # precision=HIGHEST: the MXU's default f32 path rounds operands
        # through bf16 passes — NOT bit-exact even against an identity
        # matrix. HIGHEST recombines exactly for a 0/1 rhs (x*1 splits
        # hi+lo+lo2 and sums back losslessly), keeping the kernel's
        # output bitwise equal to the XLA gather it replaces.
        bounce[...] = jax.lax.dot_general(
            staging[:, r, :cap], eyef, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        copy = pltpu.make_async_copy(
            bounce, out_ref.at[r, :, pl.ds(g * gt, gt)], out_sem)
        copy.start()
        copy.wait()


def expand_slab(asT: jnp.ndarray, t_start_p: jnp.ndarray, cap: int,
                num_tiles: int, force_pallas: bool = False) -> jnp.ndarray:
    """asT [R, PCp + cap] (tile-sorted attr rows + zero tail),
    t_start_p [num_tiles] (position-permuted range starts) ->
    slab [R, cap, num_tiles].

    Equivalent to
    ``jnp.take(asT, (min(t_start_p, PCp)[None] + arange(cap)[:, None])
    .reshape(-1), axis=1).reshape(R, cap, num_tiles)``
    (t_start_p <= PCp always holds — searchsorted over the packed list).
    """
    R, width = asT.shape
    gt = LANE
    while num_tiles % gt:
        gt //= 2
    capp = cap + LANE
    vmem = gt * 16 * capp * 4 + 2 * cap * gt * 4
    # Default ON for compiled TPU runs (the XLA gather costs ~2.3 ms/step
    # at bench size; the kernel ~0.8 ms). The earlier miscompare at
    # (cap=512, T=256) was the dynamic lane-roll with a NEGATIVE traced
    # shift + the MXU's default bf16-pass precision; both fixed (see
    # _expand_kernel) and the kernel is now bit-exact vs the gather over
    # a config sweep on a v5e (ptest_expand.py). Interpret-mode CPU runs
    # keep the gather so tests exercise the XLA-reference arithmetic
    # unless they force the kernel.
    fits = cap % 8 == 0 and gt == LANE and vmem <= 11 * 2 ** 20
    use_pallas = fits and (force_pallas or not pb.INTERPRET and _on_tpu())
    if not use_pallas:
        slot = jnp.arange(cap, dtype=jnp.int32)
        pgrid = (jnp.minimum(t_start_p, width - cap)[None, :]
                 + slot[:, None])
        return jnp.take(asT, pgrid.reshape(-1), axis=1).reshape(
            R, cap, num_tiles)
    # pad rows to 16 (sublane-aligned DMA slices) and lanes so that an
    # aligned over-copy window never runs past the end
    asT16 = jnp.pad(asT, ((0, 16 - R), (0, LANE)))
    width16 = width + LANE
    n_groups = num_tiles // gt
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_groups,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((gt, 16, capp), jnp.float32),
            pltpu.VMEM((cap, gt), jnp.float32),
            pltpu.SemaphoreType.DMA((gt,)),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        functools.partial(_expand_kernel, gt, cap, width16, R),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((R, cap, num_tiles), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=13 * 2 ** 20),
        interpret=pb.INTERPRET,
    )(t_start_p.astype(jnp.int32), asT16)
