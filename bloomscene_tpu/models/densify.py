"""Densification: statistics accumulation (in-jit) + anchor surgery (host).

The Scaffold-GS grow/prune scheme (reference gaussian_model.py:742-952)
re-designed for static XLA shapes: statistics accumulate inside the jitted
train step over capacity-padded arrays; every ``update_interval`` steps the
host runs ``adjust_anchor`` — pure numpy surgery over the padded model that
fills free slots (growing capacity buckets only when needed, which triggers
one re-jit), marks pruned slots dead, and zeroes the Adam moments of every
touched slot (the functional analog of the reference's optimizer-state
surgery, :719-791).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import GSConfig
from .anchors import AnchorState, inverse_sigmoid
from .model import Model


class DensifyStats(NamedTuple):
    # offset stats are stored FLAT [C*K] (a [C, 10] f32 buffer pads 12.8x
    # under TPU (8,128) tiling; these persist across the whole run)
    opacity_accum: jnp.ndarray      # [C]
    anchor_demon: jnp.ndarray       # [C]
    offset_grad_accum: jnp.ndarray  # [C*K]
    offset_denom: jnp.ndarray       # [C*K]


def init_stats(capacity: int, n_offsets: int) -> DensifyStats:
    return DensifyStats(
        opacity_accum=jnp.zeros((capacity,)),
        anchor_demon=jnp.zeros((capacity,)),
        offset_grad_accum=jnp.zeros((capacity * n_offsets,)),
        offset_denom=jnp.zeros((capacity * n_offsets,)))


def accumulate_stats(stats: DensifyStats, neural_opacity: jnp.ndarray,
                     child_valid: jnp.ndarray, splat_visible: jnp.ndarray,
                     anchor_visible: jnp.ndarray, mean2d_grad: jnp.ndarray,
                     W: int, H: int,
                     anchor_idx: jnp.ndarray | None = None) -> DensifyStats:
    """training_statis equivalent (gaussian_model.py:742-759).

    neural_opacity/child_valid/splat_visible are per child [V*K];
    mean2d_grad is the FLAT [V*K*2] cotangent of the mean2d_offset input.
    Dense mode (anchor_idx None): V == C and anchor_visible is [C].
    Compacted mode: anchor_idx [V] maps rows to anchor slots (== C for
    padding; every real row is visible by construction) and contributions
    scatter-add into the full-capacity stats. The viewspace gradient
    threshold in the reference is in NDC-ish units (CUDA writes
    dL/dmean2D scaled by 0.5*W — backward.cu:473-475), so the pixel-space
    mean2d gradient is rescaled by (W/2, H/2) before the norm.
    """
    C = stats.opacity_accum.shape[0]
    K = stats.offset_grad_accum.size // C
    g = mean2d_grad.reshape(-1, 2) * jnp.asarray([W * 0.5, H * 0.5])
    gnorm = jnp.linalg.norm(g, axis=-1)                      # [V*K]
    V = gnorm.shape[0] // K
    opac = jnp.maximum(neural_opacity, 0.0).reshape(V, K)

    if anchor_idx is None:
        av = anchor_visible.astype(jnp.float32)
        update = ((child_valid & splat_visible).reshape(V, K)
                  & anchor_visible[:, None]).reshape(-1)
        upd = update.astype(jnp.float32)
        return DensifyStats(
            opacity_accum=stats.opacity_accum + av * jnp.sum(opac, 1),
            anchor_demon=stats.anchor_demon + av,
            offset_grad_accum=stats.offset_grad_accum + upd * gnorm,
            offset_denom=stats.offset_denom + upd)

    ok = anchor_idx < C
    av = ok.astype(jnp.float32)
    safe = jnp.minimum(anchor_idx, C - 1)
    upd = ((child_valid & splat_visible).reshape(V, K)
           & ok[:, None]).astype(jnp.float32)                # [V, K]
    flat_idx = (safe[:, None] * K
                + jnp.arange(K, dtype=jnp.int32)[None, :]).reshape(-1)
    return DensifyStats(
        opacity_accum=stats.opacity_accum.at[safe].add(
            av * jnp.sum(opac, 1)),
        anchor_demon=stats.anchor_demon.at[safe].add(av),
        offset_grad_accum=stats.offset_grad_accum.at[flat_idx].add(
            (upd * gnorm.reshape(V, K)).reshape(-1)),
        offset_denom=stats.offset_denom.at[flat_idx].add(upd.reshape(-1)))


def _grow_capacity(arr: np.ndarray, new_cap: int) -> np.ndarray:
    out = np.zeros((new_cap,) + arr.shape[1:], arr.dtype)
    out[:arr.shape[0]] = arr
    return out


def _rows_not_in(query: np.ndarray, table: np.ndarray) -> np.ndarray:
    """Vectorized per-row set membership: True where a row of ``query``
    (already unique) does NOT appear among the rows of ``table``.

    Sort-based (np.unique over the concatenation) — O((N+M) log(N+M))
    and allocation-bound, replacing the former Python set of tuples
    which rebuilt a hash set over ALL alive anchors per level per call
    (the step-time ceiling at multi-million-anchor scale)."""
    if table.shape[0] == 0:
        return np.ones(query.shape[0], bool)
    both = np.concatenate([table, query], 0)
    _, inv = np.unique(both, axis=0, return_inverse=True)
    in_table = np.zeros(int(inv.max()) + 1, bool)
    in_table[inv[:table.shape[0]]] = True
    return ~in_table[inv[table.shape[0]:]]


def adjust_anchor(model: Model, stats: DensifyStats, opt_state,
                  cfg: GSConfig, voxel_size: float,
                  rng: np.random.Generator):
    """Grow + prune (adjust_anchor, gaussian_model.py:898-952).

    Candidate selection runs on the host (numpy) but pulls only what it
    reads: the [C] stats, the alive mask, the [C,3] anchors, and the
    offset/scale/feat ROWS of anchors that have at least one
    over-threshold child (usually a small fraction of C). All writes —
    new-row scatter, alive flips, the cov-scale clamp, Adam-moment
    zeroing — are device-side ``.at[]`` updates, so the big per-anchor
    buffers (offsets, feats, and 2x Adam moments) never round-trip
    through the host. Returns (model, stats, opt_state, info dict with
    ``time_s``); if capacity had to grow, all capacity-sized leaves of
    model/stats/opt_state are zero-padded (the caller should expect a
    re-jit).
    """
    import time as _time
    t_start = _time.perf_counter()
    st = model.state
    C, K = st.capacity, st.n_offsets

    alive = np.asarray(jax.device_get(st.alive)).astype(bool).copy()
    anchor = np.asarray(jax.device_get(st._anchor),
                        np.float32).reshape(C, 3)
    op_acc = np.array(stats.opacity_accum)
    demon = np.array(stats.anchor_demon)
    g_acc = np.array(stats.offset_grad_accum).reshape(C, K)
    g_den = np.array(stats.offset_denom).reshape(C, K)

    with np.errstate(invalid='ignore', divide='ignore'):
        grads = g_acc / g_den
    grads = np.nan_to_num(grads, nan=0.0, posinf=0.0)
    offset_mask = g_den > (cfg.update_interval * cfg.success_threshold * 0.5)
    offset_mask &= alive[:, None]

    # rows with any child over the LOWEST (level-0) threshold — the only
    # rows whose offsets/scales/feats the grow loop can touch
    cand_any = (grads >= cfg.densify_grad_threshold) & offset_mask
    cand_rows = np.where(cand_any.any(1))[0]
    M = cand_rows.size
    if M:
        ridx = jnp.asarray(cand_rows, jnp.int32)
        off_rows = np.asarray(jax.device_get(
            st._offset.reshape(C, -1)[ridx]), np.float32).reshape(M, K, 3)
        scal_rows = np.exp(np.asarray(jax.device_get(
            st._scaling_log.reshape(C, -1)[ridx]),
            np.float32)[:, :3])
        feat_rows = np.asarray(jax.device_get(
            st._feat.reshape(C, -1)[ridx]), np.float32)
        cand_xyz = (anchor[cand_rows][:, None, :]
                    + off_rows * scal_rows[:, None, :])     # [M, K, 3]
    r_grads = grads[cand_rows]
    r_mask = offset_mask[cand_rows]

    # ---- grow (anchor_growing, :807-895) ----
    new_rows = {k: [] for k in
                ('anchor', 'feat', 'scaling_log', 'offset', 'mask_logit',
                 'rotation', 'opacity_raw')}
    # dedup works against existing + newly added anchors, per level
    grown_anchors = []

    for i in range(cfg.update_depth if M else 0):
        cur_threshold = (cfg.densify_grad_threshold
                         * ((cfg.update_hierachy_factor // 2) ** i))
        cand = (r_grads >= cur_threshold) & r_mask           # [M, K]
        cand &= rng.random(cand.shape) > 0.5 ** (i + 1)
        if not cand.any():
            continue
        size_factor = cfg.update_init_factor // (cfg.update_hierachy_factor
                                                 ** i)
        cur_size = voxel_size * size_factor

        exist = anchor[alive]
        if grown_anchors:
            exist = np.concatenate([exist] + grown_anchors, 0)
        grid_coords = np.round(exist / cur_size).astype(np.int64)

        sel_xyz = cand_xyz[cand]                             # [m, 3]
        # guard: exploding offsets*scales can produce non-finite candidate
        # positions; drop them instead of poisoning the voxel grid
        finite = np.isfinite(sel_xyz).all(1) \
            & (np.abs(sel_xyz) < 1e12).all(1)
        if not finite.all():
            cand_idx = np.where(cand.reshape(-1))[0][~finite]
            cand.reshape(-1)[cand_idx] = False
            sel_xyz = sel_xyz[finite]
        if sel_xyz.shape[0] == 0:
            continue
        sel_gc = np.round(sel_xyz / cur_size).astype(np.int64)
        uniq, inverse = np.unique(sel_gc, axis=0, return_inverse=True)

        # remove voxels already occupied by an existing anchor
        keep = _rows_not_in(uniq, grid_coords)
        if not keep.any():
            continue

        cand_feat = np.repeat(feat_rows, K, axis=0).reshape(M, K, -1)[cand]
        feat_max = np.full((uniq.shape[0], cand_feat.shape[1]), -np.inf,
                           np.float32)
        np.maximum.at(feat_max, inverse, cand_feat)

        new_anchor = (uniq[keep] * cur_size).astype(np.float32)
        m = new_anchor.shape[0]
        new_rows['anchor'].append(new_anchor)
        new_rows['feat'].append(feat_max[keep])
        new_rows['scaling_log'].append(
            np.full((m, 6), np.log(cur_size), np.float32))
        new_rows['offset'].append(np.zeros((m, K, 3), np.float32))
        new_rows['mask_logit'].append(np.ones((m, K, 1), np.float32))
        rot = np.zeros((m, 4), np.float32)
        rot[:, 0] = 1
        new_rows['rotation'].append(rot)
        new_rows['opacity_raw'].append(
            np.full((m, 1), float(inverse_sigmoid(0.1)), np.float32))
        grown_anchors.append(new_anchor)

    n_new = sum(a.shape[0] for a in new_rows['anchor'])

    # ---- stat resets for counted offsets (:907-918) ----
    g_den[offset_mask] = 0
    g_acc[offset_mask] = 0

    # ---- prune (:920-947) ----
    prune = (op_acc < cfg.min_opacity * demon)
    anchors_counted = demon > cfg.update_interval * cfg.success_threshold
    prune = prune & anchors_counted & alive
    op_acc[anchors_counted] = 0
    demon[anchors_counted] = 0
    op_acc[prune] = 0
    demon[prune] = 0
    g_acc[prune] = 0
    g_den[prune] = 0
    alive[prune] = False

    # ---- place new anchors into free slots (grow capacity if needed) ----
    changed_slots = np.where(prune)[0].tolist()
    old_capacity = C
    capacity_grown = False
    state_leaves = {f: getattr(st, '_' + f)
                    for f in AnchorState._fields if f != 'alive'}
    if n_new > 0:
        free = np.where(~alive)[0]
        if free.size < n_new:
            from .anchors import capacity_bucket
            new_cap = capacity_bucket(int((C + n_new) * 1.25))
            pad_n = new_cap - C
            state_leaves = {
                f: jnp.concatenate([
                    v, jnp.zeros(pad_n * (v.size // C), v.dtype)])
                for f, v in state_leaves.items()}
            op_acc = _grow_capacity(op_acc, new_cap)
            demon = _grow_capacity(demon, new_cap)
            g_acc = _grow_capacity(g_acc, new_cap)
            g_den = _grow_capacity(g_den, new_cap)
            alive = np.concatenate([alive, np.zeros(pad_n, bool)])
            anchor = np.concatenate(
                [anchor, np.zeros((pad_n, 3), np.float32)])
            free = np.where(~alive)[0]
            capacity_grown = True
            C = new_cap
        slots = free[:n_new]
        cat = {k: np.concatenate(v, 0) for k, v in new_rows.items()}
        jslots = jnp.asarray(slots, jnp.int32)
        state_leaves = {
            f: v.reshape(C, -1).at[jslots].set(
                jnp.asarray(cat[f].reshape(n_new, -1))).reshape(-1)
            for f, v in state_leaves.items()}
        alive[slots] = True
        op_acc[slots] = 0
        demon[slots] = 0
        g_acc[slots] = 0
        g_den[slots] = 0
        changed_slots.extend(slots.tolist())

    # reference clamps cov log-scales at 0.05 during the optimizer prune
    # surgery, which runs AFTER growing — so freshly grown anchors are
    # clamped too (gaussian_model.py:775-787, prune_anchor at :949-950)
    sl = state_leaves['scaling_log'].reshape(C, 6)
    state_leaves['scaling_log'] = sl.at[:, 3:].set(
        jnp.minimum(sl[:, 3:], 0.05)).reshape(-1)
    new_state = AnchorState(alive=jnp.asarray(alive), **state_leaves)
    new_stats = DensifyStats(opacity_accum=jnp.asarray(op_acc),
                             anchor_demon=jnp.asarray(demon),
                             offset_grad_accum=jnp.asarray(g_acc.ravel()),
                             offset_denom=jnp.asarray(g_den.ravel()))

    # ---- Adam moment surgery ----
    opt_state = _surgery_opt_state(opt_state, old_capacity, C,
                                   np.asarray(changed_slots, np.int64))

    model = model._replace(state=new_state)
    info = dict(n_new=n_new, n_pruned=int(prune.sum()),
                n_alive=int(alive.sum()), capacity=C,
                capacity_grown=capacity_grown,
                time_s=round(_time.perf_counter() - t_start, 4))
    return model, new_stats, opt_state, info


PER_ANCHOR_GROUPS = ('anchor', 'offset', 'mask', 'anchor_feat', 'scaling',
                     'frozen')


def _surgery_opt_state(opt_state, old_capacity: int, new_capacity: int,
                       changed: np.ndarray):
    """Zero Adam moments of changed anchor slots; pad leaves on growth.

    Only touches the multi_transform inner states of the per-anchor
    parameter groups (PER_ANCHOR_GROUPS), where every array leaf mirrors
    a FLAT per-anchor param ([C*k] — AnchorState stores flat leaves) —
    never the MLP or hash-table groups. Each leaf is viewed as
    [capacity, k] for row surgery, then re-flattened. All updates are
    device-side (.at[] scatter / concat-pad): the Adam moments are the
    two LARGEST per-anchor buffers and must not round-trip the host."""
    jchanged = jnp.asarray(changed, jnp.int32) if changed.size else None

    def fix(leaf):
        if not hasattr(leaf, 'shape') or getattr(leaf, 'ndim', 0) == 0:
            return leaf
        if not jnp.issubdtype(leaf.dtype, jnp.floating):
            return leaf
        if leaf.size % old_capacity:
            return leaf                      # not a per-anchor moment
        arr = leaf.reshape(old_capacity, -1)
        if old_capacity < new_capacity:
            arr = jnp.concatenate([
                arr, jnp.zeros((new_capacity - old_capacity, arr.shape[1]),
                               arr.dtype)])
        if jchanged is not None:
            arr = arr.at[jchanged].set(0.0)
        return arr.reshape(-1)

    inner = dict(opt_state.inner_states)
    for g in PER_ANCHOR_GROUPS:
        if g in inner:
            inner[g] = jax.tree.map(fix, inner[g])
    return opt_state._replace(inner_states=inner)
