"""Ring-``ppermute`` splat/tile exchange (SURVEY.md §5.7 prototype).

The sequence-parallel analog of ring attention for splatting: the splat
list is DEPTH-SLICED over the mesh ring axis (device d holds the d-th
contiguous chunk of the globally depth-sorted splats) and the pixel grid
is sharded into horizontal strips (the "tile block" each device owns).
Each strip's blend accumulator travels the ring; at every hop the
resident device composites its depth slice's contribution into the
passing accumulator, so after D hops every strip has seen every splat
while each splat stayed resident on one device — per-hop traffic is
O(pixels/D), independent of splat count, and rides ICI neighbor links
(`lax.ppermute`), never DCN.

Correctness under a non-depth-ordered visit order: front-to-back alpha
blending is the associative (not commutative) "over" operator
    (C1,T1) ⊕ (C2,T2) = (C1 + T1·C2, T1·T2).
A strip starting at device b visits slices b, b+1, …, D−1, 0, …, b−1 —
two runs that are each internally in depth order. The accumulator
therefore carries TWO partial composites (head = slices 0..b−1,
tail = slices b..D−1), folds each hop's slice into the right one, and
the owner combines head ⊕ tail after the last hop. Depth (D += d·α·T)
and alpha (acc += α·T) accumulators fold the same way (both are linear
in the incoming transmittance).

Exactness caveat (documented, asserted in tests): the reference blend's
early termination — a contribution that would push T below 1e-4 is
skipped and terminates the pixel (forward.cu:430-435) — depends on the
GLOBAL prefix transmittance, which a slice-local blend cannot see. This
prototype blends without the cutoff, so it is bit-exact vs the golden
model whenever no pixel's transmittance crosses 1e-4 (the cutoff is a
performance guard, not a visual feature; at 1e-4 the residual
contribution is below 8-bit quantization anyway).

Backward ring (the north-star "gradient exchange overlapped with the
backward blend", BASELINE.json): `ring_render` is built entirely from
reverse-differentiable primitives (`lax.scan` slice blends, a static
`fori_loop` over hops, `lax.ppermute` whose transpose is the INVERSE
permutation), so `jax.grad` derives the reverse schedule mechanically:
cotangent accumulators travel the ring BACKWARDS, and at every reverse
hop each device back-blends its resident depth slice into the passing
cotangents — per-hop gradient traffic is O(pixels/D) on ICI neighbor
links, interleaved hop-by-hop with the backward blend compute, and splat
gradients never leave their resident device. Equality vs the golden
rasterizer's gradients (mean2d/conic/colors/opac) is asserted on the
8-device CPU mesh in tests/test_ring.py
(test_ring_render_grads_match_reference).

The production multi-device render path (`parallel/sharded.py`) keeps
XLA-inserted all-gathers over the tile axis — measured fine at current
scales; this module is the scaling story for splat counts that no longer
fit (or no longer want to be replicated) per device.

Reference semantics: cuda_rasterizer/forward.cu:338-471 (blend),
rasterizer_impl.cu:70-138 (binning; here replaced by depth slicing).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.projection import ProjectedSplats
from ..ops.reference_rasterizer import ALPHA_MIN, ALPHA_MAX, ACC_SEED, ACC_GATE


def _slice_blend(mean2d, conic, depth, valid, color, opac,
                 pxg, pyg):
    """Front-to-back blend of one depth slice over one pixel strip,
    from a FRESH carry (incoming T=1), no early termination, no bg.

    Returns the slice's over-operands: C [h,w,3], T [h,w], D [h,w],
    acc [h,w] (acc WITHOUT the 1e-6 seed — the seed is global, added
    once by the caller).
    """
    def step(carry, splat):
        T, C, D, acc = carry
        m2d, con, dep, val, col, op = splat
        dx = m2d[0] - pxg
        dy = m2d[1] - pyg
        power = (-0.5 * (con[0] * dx * dx + con[2] * dy * dy)
                 - con[1] * dx * dy)
        alpha = jnp.minimum(ALPHA_MAX, op * jnp.exp(power))
        blend = val & (power <= 0.0) & (alpha >= ALPHA_MIN)
        w = jnp.where(blend, alpha * T, 0.0)
        C = C + w[..., None] * col
        D = D + w * dep
        acc = acc + w
        T = jnp.where(blend, T * (1.0 - alpha), T)
        return (T, C, D, acc), None

    h, w = pxg.shape
    T0 = jnp.ones((h, w), jnp.float32)
    C0 = jnp.zeros((h, w, 3), jnp.float32)
    D0 = jnp.zeros((h, w), jnp.float32)
    a0 = jnp.zeros((h, w), jnp.float32)
    (T, C, D, acc), _ = lax.scan(
        step, (T0, C0, D0, a0),
        (mean2d, conic, depth, valid, color, opac))
    return C, T, D, acc


def _over(a, b):
    """Composite partial b BEHIND partial a: a ⊕ b."""
    Ca, Ta, Da, aa = a
    Cb, Tb, Db, ab = b
    return (Ca + Ta[..., None] * Cb, Ta * Tb,
            Da + Ta * Db, aa + Ta * ab)


def ring_render(proj: ProjectedSplats, colors: jnp.ndarray,
                opacities: jnp.ndarray, bg: jnp.ndarray,
                W: int, H: int, mesh: Mesh,
                axis: str = 'ring') -> tuple[jnp.ndarray, jnp.ndarray]:
    """Render one view with splats depth-sliced and pixel strips ringed
    over ``mesh[axis]``. Returns (color [H,W,3], depth [H,W]).

    The global depth sort + slicing happens here (host-free, one
    lax.sort); inside shard_map each device only ever touches its
    resident slice and the strip currently visiting it.
    """
    D = mesh.shape[axis]
    n = proj.mean2d.shape[0]
    if H % D or n % D:
        raise ValueError(
            f"H={H} and n={n} must be divisible by the ring size {D}")
    hs = H // D

    # Global depth order -> contiguous slices; slice d = rows [d*n/D, ...).
    key = jnp.where(proj.valid, proj.depth, jnp.inf)
    order = jnp.argsort(key, stable=True)
    sl = lambda x: jnp.take(x, order, axis=0)
    mean2d, conic, depth = sl(proj.mean2d), sl(proj.conic), sl(proj.depth)
    valid, color, opac = sl(proj.valid), sl(colors), sl(opacities)

    splat_sh = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P(axis),
                  P()),
        out_specs=(P(axis, None, None, None), P(axis, None, None)),
        check_vma=False)
    def run(mean2d, conic, depth, valid, color, opac, bg):
        d = lax.axis_index(axis)
        perm = [(i, (i + 1) % D) for i in range(D)]

        def strip_grid(b):
            py = (b * hs + jnp.arange(hs, dtype=jnp.float32))[:, None]
            px = jnp.arange(W, dtype=jnp.float32)[None, :]
            return (jnp.broadcast_to(px, (hs, W)),
                    jnp.broadcast_to(py, (hs, W)))

        zero = (jnp.zeros((hs, W, 3), jnp.float32),
                jnp.ones((hs, W), jnp.float32),
                jnp.zeros((hs, W), jnp.float32),
                jnp.zeros((hs, W), jnp.float32))

        def hop(r, state):
            head, tail = state
            b = (d - r) % D                     # block visiting this device
            pxg, pyg = strip_grid(b)
            part = _slice_blend(mean2d, conic, depth, valid, color, opac,
                                pxg, pyg)
            # slice index == d; it belongs to the head segment iff d < b.
            is_head = d < b
            head = jax.tree.map(
                lambda h, f: jnp.where(is_head, f, h),
                head, _over(head, part))
            tail = jax.tree.map(
                lambda t, f: jnp.where(is_head, t, f),
                tail, _over(tail, part))
            head, tail = jax.tree.map(
                lambda x: lax.ppermute(x, axis, perm), (head, tail))
            return head, tail

        head, tail = lax.fori_loop(0, D, hop, (zero, zero))
        # After D hops block b is home at device b == d.
        C, T, Dp, acc = _over(head, tail)
        out_color = C + T[..., None] * bg
        acc = acc + ACC_SEED
        out_depth = jnp.where(acc > ACC_GATE, Dp / acc, 0.0)
        return out_color[None], out_depth[None]

    args = jax.device_put(
        (mean2d, conic, depth, valid, color, opac),
        splat_sh)
    col, dep = run(*args, jax.device_put(bg, rep))
    return col.reshape(H, W, 3), dep.reshape(H, W)
