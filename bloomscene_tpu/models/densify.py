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


def adjust_anchor(model: Model, stats: DensifyStats, opt_state,
                  cfg: GSConfig, voxel_size: float,
                  rng: np.random.Generator):
    """Grow + prune (adjust_anchor, gaussian_model.py:898-952). Host-side.

    Returns (model, stats, opt_state, info dict). ``opt_state`` has the Adam
    moments of every changed slot zeroed; if capacity had to grow, all
    capacity-sized leaves of model/stats/opt_state are zero-padded (the
    caller should expect a re-jit).
    """
    st = jax.device_get(model.state)
    s_np = {f: np.array(getattr(st, f)) for f in st._fields}
    alive = s_np['alive'].astype(bool)
    C, K = s_np['offset'].shape[:2]

    op_acc = np.array(stats.opacity_accum)
    demon = np.array(stats.anchor_demon)
    g_acc = np.array(stats.offset_grad_accum).reshape(C, K)
    g_den = np.array(stats.offset_denom).reshape(C, K)

    with np.errstate(invalid='ignore', divide='ignore'):
        grads = g_acc / g_den
    grads = np.nan_to_num(grads, nan=0.0, posinf=0.0)
    offset_mask = g_den > (cfg.update_interval * cfg.success_threshold * 0.5)
    offset_mask &= alive[:, None]

    # ---- grow (anchor_growing, :807-895) ----
    new_rows = {k: [] for k in
                ('anchor', 'feat', 'scaling_log', 'offset', 'mask_logit',
                 'rotation', 'opacity_raw')}
    # dedup works against existing + newly added anchors, per level
    grown_anchors = []

    for i in range(cfg.update_depth):
        cur_threshold = (cfg.densify_grad_threshold
                         * ((cfg.update_hierachy_factor // 2) ** i))
        cand = (grads >= cur_threshold) & offset_mask
        cand &= rng.random(cand.shape) > 0.5 ** (i + 1)
        if not cand.any():
            continue
        scal3 = np.exp(s_np['scaling_log'][:, :3])
        all_xyz = (s_np['anchor'][:, None, :]
                   + s_np['offset'] * scal3[:, None, :])
        size_factor = cfg.update_init_factor // (cfg.update_hierachy_factor
                                                 ** i)
        cur_size = voxel_size * size_factor

        exist = s_np['anchor'][alive]
        if grown_anchors:
            exist = np.concatenate([exist] + grown_anchors, 0)
        grid_coords = np.round(exist / cur_size).astype(np.int64)

        sel_xyz = all_xyz[cand]                          # [M, 3]
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
        exist_set = {tuple(r) for r in grid_coords}
        keep = np.array([tuple(r) not in exist_set for r in uniq], bool)
        if not keep.any():
            continue

        cand_feat = np.repeat(s_np['feat'], K, axis=0).reshape(C, K, -1)[cand]
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
    s_np['alive'] = alive
    changed_slots = np.where(prune)[0].tolist()
    capacity_grown = False
    if n_new > 0:
        free = np.where(~alive)[0]
        if free.size < n_new:
            from .anchors import capacity_bucket
            new_cap = capacity_bucket(int((C + n_new) * 1.25))
            for f in s_np:
                s_np[f] = _grow_capacity(s_np[f], new_cap)
            op_acc = _grow_capacity(op_acc, new_cap)
            demon = _grow_capacity(demon, new_cap)
            g_acc = _grow_capacity(g_acc, new_cap)
            g_den = _grow_capacity(g_den, new_cap)
            alive = s_np['alive'].astype(bool)
            free = np.where(~alive)[0]
            capacity_grown = True
            C = new_cap
        slots = free[:n_new]
        cat = {k: np.concatenate(v, 0) for k, v in new_rows.items()}
        for k, v in cat.items():
            s_np[k][slots] = v
        alive[slots] = True
        op_acc[slots] = 0
        demon[slots] = 0
        g_acc[slots] = 0
        g_den[slots] = 0
        changed_slots.extend(slots.tolist())

    s_np['alive'] = alive
    # reference clamps cov log-scales at 0.05 during the optimizer prune
    # surgery, which runs AFTER growing — so freshly grown anchors are
    # clamped too (gaussian_model.py:775-787, prune_anchor at :949-950)
    s_np['scaling_log'][:, 3:] = np.minimum(s_np['scaling_log'][:, 3:], 0.05)
    new_state = AnchorState(**{f: jnp.asarray(s_np[f])
                               for f in AnchorState._fields})
    new_stats = DensifyStats(opacity_accum=jnp.asarray(op_acc),
                             anchor_demon=jnp.asarray(demon),
                             offset_grad_accum=jnp.asarray(g_acc.ravel()),
                             offset_denom=jnp.asarray(g_den.ravel()))

    # ---- Adam moment surgery ----
    opt_state = _surgery_opt_state(opt_state, model.state.capacity, C,
                                   np.asarray(changed_slots, np.int64))

    model = model._replace(state=new_state)
    info = dict(n_new=n_new, n_pruned=int(prune.sum()),
                n_alive=int(alive.sum()), capacity=C,
                capacity_grown=capacity_grown)
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
    [capacity, k] for row surgery, then re-flattened."""
    def fix(leaf):
        if not hasattr(leaf, 'shape') or getattr(leaf, 'ndim', 0) == 0:
            return leaf
        if not np.issubdtype(np.asarray(leaf).dtype, np.floating):
            return leaf
        arr = np.array(leaf)
        if arr.size % old_capacity:
            return leaf                      # not a per-anchor moment
        arr = arr.reshape(old_capacity, -1)
        if old_capacity < new_capacity:
            arr = _grow_capacity(arr, new_capacity)
        if changed.size:
            arr[changed] = 0
        return jnp.asarray(arr.reshape(-1))

    inner = dict(opt_state.inner_states)
    for g in PER_ANCHOR_GROUPS:
        if g in inner:
            inner[g] = jax.tree.map(fix, inner[g])
    return opt_state._replace(inner_states=inner)
