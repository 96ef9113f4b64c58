"""The jitted training step + host-side training loop.

Mirrors the reference hot loop (bloomscene.py:222-361): per step —
LR schedules (inside optax), anchor prefilter, neural render, the loss stack
(L1 + DSSIM + scaling reg + entropy rate + optional depth-prior
regularizers), backward, densification stats; every ``update_interval``
steps the host runs anchor surgery (models/densify.py).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import GSConfig
from ..models import densify
from ..models.anchors import update_anchor_bounds
from ..models.densify import DensifyStats
from ..models.model import Model
from ..models.render import prefilter_anchors, render
from ..scene.cameras import CameraArrays, Intrinsics
from . import losses
from .optim import make_optimizer


class StepMetrics(NamedTuple):
    loss: jnp.ndarray
    loss_rgb: jnp.ndarray
    loss_dep_value: jnp.ndarray
    loss_dep_domin: jnp.ndarray
    loss_dep_smooth: jnp.ndarray
    bit_per_param: jnp.ndarray
    psnr: jnp.ndarray
    n_visible_anchors: jnp.ndarray
    tile_overflow: jnp.ndarray
    pair_overflow: jnp.ndarray
    packed_overflow: jnp.ndarray


def phase_of_step(step: int, cfg: GSConfig) -> int:
    """Static training phase (decode noise/context schedule)."""
    if step <= cfg.noise_from_step:
        return 0
    if step <= cfg.context_from_step:
        return 1
    return 2


def compute_losses(res, gt_image, gt_depth, cfg: GSConfig):
    """The reference loss stack (bloomscene.py:283-325)."""
    image = res.out.color
    l1 = losses.l1_loss(image, gt_image)
    loss_rgb = ((1.0 - cfg.lambda_dssim) * l1
                + cfg.lambda_dssim * (1.0 - losses.ssim(image, gt_image)))
    loss = loss_rgb
    # scaling regularizer: prod of decoded child scales (bloomscene.py:289)
    scaling_reg = jnp.mean(jnp.where(
        res.dec.valid, jnp.prod(res.dec.scaling, axis=1), 0.0))
    loss = loss + cfg.lambda_scaling_reg * scaling_reg
    loss = loss + cfg.lambda_entropy * res.rate.bit_per_param

    zero = jnp.zeros(())
    dep_value = dep_domin = dep_smooth = zero
    if cfg.use_dpr:
        gt_d = losses.minmax_normalize(gt_depth)
        rd = losses.minmax_normalize(res.out.depth)
        dep_value = cfg.lambda_dep_value * losses.huber_l1_edge_aware(
            rd, gt_d, gt_image)
        dep_domin = cfg.lambda_dep_domin * losses.cmd(
            rd[None], gt_d[None, None], normalized=cfg.cmd_normalized)
        dep_smooth = cfg.lambda_dep_smooth * losses.bilateral_smoothness(rd)
        loss = loss + dep_value + dep_domin + dep_smooth

    mse = jnp.mean((image - gt_image) ** 2)
    psnr = -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))
    return loss, dict(loss_rgb=loss_rgb, loss_dep_value=dep_value,
                      loss_dep_domin=dep_domin, loss_dep_smooth=dep_smooth,
                      psnr=psnr)


def make_train_step(cfg: GSConfig, intr: Intrinsics, optimizer,
                    bg: jnp.ndarray):
    """Returns jitted step(model, opt_state, stats, cam, gt_image, gt_depth,
    key, phase=<static>, track_stats=<static>)."""

    @functools.partial(jax.jit, static_argnames=('phase', 'track_stats'))
    def train_step(model: Model, opt_state, stats: DensifyStats,
                   cam: CameraArrays, gt_image, gt_depth, key,
                   *, phase: int, track_stats: bool):
        return _step_core(cfg, intr, optimizer, bg, model, opt_state,
                          stats, cam, gt_image, gt_depth, key, phase,
                          track_stats)

    return train_step


def _step_core(cfg: GSConfig, intr: Intrinsics, optimizer, bg,
               model: Model, opt_state, stats: DensifyStats,
               cam: CameraArrays, gt_image, gt_depth, key,
               phase: int, track_stats: bool):
    """One SGD step (trace-time body shared by the per-step jit and the
    device-loop scan)."""
    visible = prefilter_anchors(model, intr, cam)
    n_anch = model.state.capacity
    if (cfg.visible_capacity is not None
            and n_anch > cfg.visible_capacity):
        n_anch = cfg.visible_capacity
    n_child = n_anch * model.state.n_offsets
    m2d_offset = jnp.zeros((n_child * 2,))      # flat: [V*K, 2] pads 64x

    def render_fn(m, m2d):
        return render(m, intr, cam, cfg, phase=phase, mode='train',
                      key=key, bg=bg, visible=visible,
                      mean2d_offset=m2d)

    if cfg.remat:
        render_fn = jax.checkpoint(render_fn)

    def loss_fn(m, m2d):
        res = render_fn(m, m2d)
        loss, aux = compute_losses(res, gt_image, gt_depth, cfg)
        return loss, (res, aux)

    (loss, (res, aux)), (g_model, g_m2d) = jax.value_and_grad(
        loss_fn, argnums=(0, 1), has_aux=True, allow_int=True)(
            model, m2d_offset)

    # frozen/bool leaves: replace int/bool cotangents with zeros
    g_model = jax.tree.map(
        lambda p, g: (jnp.zeros_like(p)
                      if not jnp.issubdtype(p.dtype, jnp.floating)
                      else g), model, g_model)
    # a single non-finite loss OR gradient would NaN-poison every
    # parameter through Adam in one step (even zero-lr groups): a
    # finite loss can still carry inf/NaN grads (overflow inside a
    # masked branch). Skip such updates entirely.
    gsum = sum(jnp.sum(jnp.abs(g)) for g in jax.tree.leaves(g_model)
               if jnp.issubdtype(g.dtype, jnp.floating))
    ok = jnp.isfinite(loss) & jnp.isfinite(gsum)
    g_model = jax.tree.map(
        lambda g: (jnp.where(ok, g, jnp.zeros_like(g))
                   if jnp.issubdtype(g.dtype, jnp.floating) else g),
        g_model)
    updates, opt_state = optimizer.update(g_model, opt_state, model)
    model = jax.tree.map(
        lambda p, u: p + u if jnp.issubdtype(p.dtype, jnp.floating)
        else p, model, updates)

    if track_stats:
        stats = densify.accumulate_stats(
            stats, res.dec.neural_opacity, res.dec.valid,
            jax.lax.stop_gradient(res.proj.valid), visible, g_m2d,
            intr.width, intr.height, anchor_idx=res.visible_idx)

    metrics = StepMetrics(
        loss=loss, loss_rgb=aux['loss_rgb'],
        loss_dep_value=aux['loss_dep_value'],
        loss_dep_domin=aux['loss_dep_domin'],
        loss_dep_smooth=aux['loss_dep_smooth'],
        bit_per_param=res.rate.bit_per_param, psnr=aux['psnr'],
        n_visible_anchors=jnp.sum(visible),
        tile_overflow=res.tile_overflow,
        pair_overflow=res.pair_overflow,
        packed_overflow=res.packed_overflow)
    return model, opt_state, stats, metrics


def make_dp_train_step(cfg: GSConfig, intr: Intrinsics, optimizer,
                       bg: jnp.ndarray, mesh=None):
    """Data-parallel FULL training step: a batch of B views per step,
    loss = mean over views, gradients all-reduced by XLA from the
    sharding annotations; densification statistics accumulate for every
    view in the batch (grad norms rescaled by B so they match B
    consecutive single-view steps of the reference's training_statis,
    gaussian_model.py:742-759).

    Returns jit(step)(model, opt_state, stats, cams_stacked, gt_images,
    gt_depths, idx, keys, phase=<static>, track_stats=<static>)
    -> (model, opt_state, stats, StepMetrics) where ``idx`` [B] selects
    the batch views from the stacked camera/GT arrays and is sharded over
    the mesh 'data' axis (the gathered batch inherits the sharding).
    With mesh=None the same step runs unsharded — the single-device
    semantic twin used by the curve-equality tests.
    """

    def step(model: Model, opt_state, stats: DensifyStats,
             cams_stacked: CameraArrays, gt_images, gt_depths, idx, keys,
             phase: int, track_stats: bool):
        B = idx.shape[0]
        cams_b = jax.tree.map(lambda x: x[idx], cams_stacked)
        gts_b = gt_images[idx]
        deps_b = gt_depths[idx]

        n_anch = model.state.capacity
        if (cfg.visible_capacity is not None
                and n_anch > cfg.visible_capacity):
            n_anch = cfg.visible_capacity
        n_child = n_anch * model.state.n_offsets

        visibles = jax.vmap(
            lambda c: prefilter_anchors(model, intr, c))(cams_b)

        def view_loss(m, m2d, cam, gt_i, gt_d, key, visible):
            def render_fn(mm, mo):
                return render(mm, intr, cam, cfg, phase=phase,
                              mode='train', key=key, bg=bg,
                              visible=visible, mean2d_offset=mo)
            if cfg.remat:
                render_fn = jax.checkpoint(render_fn)
            res = render_fn(m, m2d)
            loss, aux = compute_losses(res, gt_i, gt_d, cfg)
            return loss, (res, aux)

        def batch_loss(m, m2d_b):
            losses, (res_b, aux_b) = jax.vmap(
                view_loss, in_axes=(None, 0, 0, 0, 0, 0, 0))(
                m, m2d_b, cams_b, gts_b, deps_b, keys, visibles)
            return jnp.mean(losses), (res_b, aux_b)

        m2d0 = jnp.zeros((B, n_child * 2))
        (loss, (res_b, aux_b)), (g_model, g_m2d) = jax.value_and_grad(
            batch_loss, argnums=(0, 1), has_aux=True, allow_int=True)(
                model, m2d0)

        g_model = jax.tree.map(
            lambda p, g: (jnp.zeros_like(p)
                          if not jnp.issubdtype(p.dtype, jnp.floating)
                          else g), model, g_model)
        gsum = sum(jnp.sum(jnp.abs(g)) for g in jax.tree.leaves(g_model)
                   if jnp.issubdtype(g.dtype, jnp.floating))
        ok = jnp.isfinite(loss) & jnp.isfinite(gsum)
        g_model = jax.tree.map(
            lambda g: (jnp.where(ok, g, jnp.zeros_like(g))
                       if jnp.issubdtype(g.dtype, jnp.floating) else g),
            g_model)
        updates, opt_state = optimizer.update(g_model, opt_state, model)
        model = jax.tree.map(
            lambda p, u: p + u if jnp.issubdtype(p.dtype, jnp.floating)
            else p, model, updates)

        if track_stats:
            # accumulate every view; d(mean loss)/dm2d = (1/B) dL_b/dm2d,
            # so rescale by B to match B single-view reference steps
            def acc_body(b, stats):
                vidx = (None if res_b.visible_idx is None
                        else res_b.visible_idx[b])
                return densify.accumulate_stats(
                    stats, res_b.dec.neural_opacity[b], res_b.dec.valid[b],
                    jax.lax.stop_gradient(res_b.proj.valid[b]),
                    visibles[b], g_m2d[b] * B, intr.width, intr.height,
                    anchor_idx=vidx)
            stats = jax.lax.fori_loop(0, B, acc_body, stats)

        mean = lambda x: jnp.mean(x)
        metrics = StepMetrics(
            loss=loss, loss_rgb=mean(aux_b['loss_rgb']),
            loss_dep_value=mean(aux_b['loss_dep_value']),
            loss_dep_domin=mean(aux_b['loss_dep_domin']),
            loss_dep_smooth=mean(aux_b['loss_dep_smooth']),
            bit_per_param=mean(res_b.rate.bit_per_param),
            psnr=mean(aux_b['psnr']),
            n_visible_anchors=mean(jnp.sum(visibles, axis=1)),
            tile_overflow=jnp.max(res_b.tile_overflow),
            pair_overflow=jnp.max(res_b.pair_overflow),
            packed_overflow=jnp.max(res_b.packed_overflow))
        return model, opt_state, stats, metrics

    # phase/track_stats are POSITIONAL statics: pjit rejects kwargs when
    # in_shardings is given, so both variants share the positional form
    if mesh is None:
        jitted = jax.jit(step, static_argnums=(8, 9))
    else:
        from jax.sharding import NamedSharding, PartitionSpec as P
        rep = NamedSharding(mesh, P())
        dat = NamedSharding(mesh, P('data'))
        jitted = jax.jit(
            step, static_argnums=(8, 9),
            in_shardings=(rep, rep, rep, rep, rep, rep, dat, dat),
            out_shardings=(rep, rep, rep, rep))

    def call(model, opt_state, stats, cams_stacked, gt_images, gt_depths,
             idx, keys, *, phase: int, track_stats: bool):
        return jitted(model, opt_state, stats, cams_stacked, gt_images,
                      gt_depths, idx, keys, phase, track_stats)

    return call


def make_train_scan(cfg: GSConfig, intr: Intrinsics, optimizer,
                    bg: jnp.ndarray):
    """Device-loop trainer: run ``n_steps`` SGD steps in ONE dispatch via
    lax.scan, sampling the camera in-graph from stacked camera tensors.

    TPU-idiomatic: per-step host dispatch costs ~ms through a serialized
    runtime (and even async dispatch pays per-call overhead); a jitted
    scan keeps the chip busy back-to-back, exactly like a jitted epoch
    loop in any production TPU trainer. The scan body performs the same
    (key, k_cam, k_step) splits and the same randint camera draw that
    Trainer.run performs per step, so host-loop and device-loop training
    see the SAME RNG/camera/step sequence; float rounding differs
    slightly (the scan body fuses differently than the standalone step —
    tolerances in tests/test_training.py quantify the drift).
    """

    @functools.partial(jax.jit,
                       static_argnames=('phase', 'track_stats', 'n_steps'))
    def train_scan(model: Model, opt_state, stats: DensifyStats,
                   cams_stacked: CameraArrays, gt_images, gt_depths, key,
                   *, phase: int, track_stats: bool, n_steps: int):
        n_cams = gt_images.shape[0]

        def body(carry, _):
            model, opt_state, stats, key = carry
            key, k_cam, k_step = jax.random.split(key, 3)
            idx = jax.random.randint(k_cam, (), 0, n_cams)
            cam = jax.tree.map(lambda x: x[idx], cams_stacked)
            model, opt_state, stats, metrics = _step_core(
                cfg, intr, optimizer, bg, model, opt_state, stats, cam,
                gt_images[idx], gt_depths[idx], k_step, phase,
                track_stats)
            return (model, opt_state, stats, key), metrics

        (model, opt_state, stats, key), metrics = jax.lax.scan(
            body, (model, opt_state, stats, key), None, length=n_steps)
        return model, opt_state, stats, key, metrics

    return train_scan


class Trainer:
    """Host-side orchestration of the 2990-iteration optimization."""

    def __init__(self, model: Model, cfg: GSConfig, intr: Intrinsics,
                 voxel_size: float, spatial_lr_scale: float = 1.0,
                 bg: np.ndarray | None = None, seed: int = 0,
                 logger=None, mesh=None, dp_batch: int | None = None):
        """``mesh`` (optional jax Mesh with a 'data' axis) + ``dp_batch``
        turn every training step into a data-parallel batch of views:
        the camera batch is sharded over the mesh, the model/optimizer
        replicated, gradients all-reduced by XLA (SURVEY.md section 2.5).
        ``dp_batch`` alone (mesh=None) runs the same batched step on one
        device — the semantic twin used to validate the sharded curve."""
        self.cfg = cfg
        self.intr = intr
        self.voxel_size = voxel_size
        self.model = model._replace(bounds=update_anchor_bounds(model.state))
        self.optimizer = make_optimizer(cfg, spatial_lr_scale, model)
        self.opt_state = self.optimizer.init(model)
        self.stats = densify.init_stats(model.state.capacity, cfg.n_offsets)
        bg_arr = jnp.asarray(bg if bg is not None else
                             (np.ones(3) if cfg.white_background
                              else np.zeros(3)), jnp.float32)
        self.bg = bg_arr
        self.mesh = mesh
        self.dp_batch = dp_batch or (
            int(mesh.shape['data']) if mesh is not None else None)
        if mesh is not None and self.dp_batch % int(mesh.shape['data']):
            raise ValueError(
                f"dp_batch={self.dp_batch} must be divisible by the "
                f"mesh 'data' axis size {int(mesh.shape['data'])}")
        if self.dp_batch:
            self.step_fn = None
            self.dp_step_fn = make_dp_train_step(cfg, intr, self.optimizer,
                                                 bg_arr, mesh=mesh)
        else:
            self.step_fn = make_train_step(cfg, intr, self.optimizer,
                                           bg_arr)
        self.key = jax.random.PRNGKey(seed)
        self.np_rng = np.random.default_rng(seed)
        self.history: list[dict] = []
        self.step = 0
        self.logger = logger    # optional utils.logging.RunLogger

    # --- full-trainer checkpoint (capture/restore equivalent,
    #     reference gaussian_model.py:312-340, but actually resumable) ---
    def save(self, path: str):
        from ..utils.io import save_checkpoint
        save_checkpoint(path, {
            'model': self.model, 'opt_state': self.opt_state,
            'stats': self.stats, 'key': self.key},
            meta={'step': self.step})
        import json
        import os
        with open(os.path.splitext(path)[0] + '.meta.json', 'w') as f:
            json.dump({'step': self.step, 'voxel_size': self.voxel_size},
                      f)

    def restore(self, path: str):
        """Restore model/optimizer/stats/rng; resumes mid-run. The trainer
        must be constructed with the same config and a model of the same
        capacity (re-init then restore)."""
        import json
        import os
        from ..utils.io import load_checkpoint
        like = {'model': self.model, 'opt_state': self.opt_state,
                'stats': self.stats, 'key': self.key}
        data = load_checkpoint(path, like)
        self.model = data['model']
        self.opt_state = data['opt_state']
        self.stats = data['stats']
        self.key = data['key']
        meta_p = os.path.splitext(path)[0] + '.meta.json'
        if os.path.exists(meta_p):
            with open(meta_p) as f:
                self.step = json.load(f)['step']

    def run(self, cameras, iterations: int | None = None,
            log_every: int = 100, callback=None,
            device_loop: bool = False, max_chunk: int = 50):
        """cameras: list of (CameraArrays, gt_image, gt_depth) device arrays.

        Resumes from ``self.step + 1`` (0 for a fresh trainer, or the
        restored step after ``restore()``).

        ``device_loop=True`` runs chunks of steps inside ONE dispatch via
        lax.scan (make_train_scan) with in-graph camera sampling — the
        same step/camera/RNG sequence as the host loop (float rounding
        aside), minus the per-step dispatch overhead. Chunks break at
        every phase
        transition, densification step, stat-tracking flip, and the
        context-phase bounds update, so host-side surgery runs exactly
        as in the host loop. Requires homogeneous image shapes (all
        BloomScene frames share intrinsics).
        """
        cfg = self.cfg
        iterations = iterations or cfg.iterations
        if self.dp_batch:
            return self._run_dp(cameras, iterations, log_every, callback)
        if device_loop:
            return self._run_device_loop(cameras, iterations, log_every,
                                         callback, max_chunk)
        for it in range(self.step + 1, iterations + 1):
            self.step = it
            self.key, k_cam, k_step = jax.random.split(self.key, 3)
            cam_idx = int(jax.random.randint(k_cam, (), 0, len(cameras)))
            cam, gt_image, gt_depth = cameras[cam_idx]
            phase = phase_of_step(it, cfg)
            if it == cfg.context_from_step:
                self.model = self.model._replace(
                    bounds=update_anchor_bounds(self.model.state))
            track = cfg.start_stat < it < cfg.update_until
            self.model, self.opt_state, self.stats, metrics = self.step_fn(
                self.model, self.opt_state, self.stats, cam, gt_image,
                gt_depth, k_step, phase=phase, track_stats=track)

            in_pause = cfg.densify_pause_from <= it < cfg.densify_pause_until
            if (track and not in_pause and it > cfg.update_from
                    and it % cfg.update_interval == 0):
                self.model, self.stats, self.opt_state, info = \
                    densify.adjust_anchor(self.model, self.stats,
                                          self.opt_state, cfg,
                                          self.voxel_size, self.np_rng)
            else:
                info = None

            if it % log_every == 0 or it == iterations:
                self._emit_record(it, metrics._asdict(), info, callback)
        return self.model

    def _emit_record(self, it, metric_items, info, callback):
        cfg = self.cfg
        rec = {k: float(v) for k, v in metric_items.items()}
        rec['iteration'] = it
        if (cfg.visible_capacity is not None
                and rec['n_visible_anchors'] > cfg.visible_capacity):
            import warnings
            warnings.warn(
                f"step {it}: {int(rec['n_visible_anchors'])} "
                f"visible anchors exceed visible_capacity="
                f"{cfg.visible_capacity}; overflowing anchors are "
                "skipped this step — raise GSConfig."
                "visible_capacity for full coverage",
                RuntimeWarning, stacklevel=2)
        if rec['pair_overflow'] > 0 or rec['tile_overflow'] > 0:
            # truncation is depth-aware (ops/tiles.py: farthest splats
            # dropped first) but still lossy — tell the user to raise the
            # capacities if it persists
            import warnings
            warnings.warn(
                f"rasterizer capacity overflow at step {it}: "
                f"pair_overflow={int(rec['pair_overflow'])} "
                f"tile_overflow={int(rec['tile_overflow'])} — "
                "farthest splats are being dropped; consider raising "
                "GSConfig.pair_capacity/max_splats_per_tile",
                RuntimeWarning, stacklevel=2)
        if rec['packed_overflow'] > 0:
            # packed truncation is NOT depth-aware (highest tile ids drop
            # first) and is governed by the packed_capacity argument, not
            # the knobs above — only snug (bench-style) sizing sets it
            import warnings
            warnings.warn(
                f"step {it}: packed pair buffer overflow "
                f"({int(rec['packed_overflow'])} surviving pairs dropped, "
                "highest tile ids first) — raise the packed_capacity "
                "passed to rasterize_tiles (defaults to pair_capacity, "
                "which never overflows this buffer)",
                RuntimeWarning, stacklevel=2)
        if info:
            rec.update({f'densify_{k}': v for k, v in info.items()
                        if not isinstance(v, bool)})
        self.history.append(rec)
        if self.logger is not None:
            self.logger.log(rec, step=it)
        if callback:
            callback(rec)

    def _run_dp(self, cameras, iterations, log_every, callback):
        """Data-parallel host loop: full trainer cadence (phase schedule,
        bounds refresh, stat tracking, densify pause + adjust_anchor),
        B views per step via make_dp_train_step."""
        cfg = self.cfg
        B = self.dp_batch
        cams_stacked = jax.tree.map(
            lambda *xs: jnp.stack(xs), *[c for c, _, _ in cameras])
        gt_images = jnp.stack([g for _, g, _ in cameras])
        gt_depths = jnp.stack([d for _, _, d in cameras])
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            rep = NamedSharding(self.mesh, P())
            put = lambda tree: jax.device_put(tree, rep)
            cams_stacked = put(cams_stacked)
            gt_images = put(gt_images)
            gt_depths = put(gt_depths)
            self.model = put(self.model)
            self.opt_state = put(self.opt_state)
            self.stats = put(self.stats)
        n_cams = len(cameras)
        for it in range(self.step + 1, iterations + 1):
            self.step = it
            self.key, k_cam, k_step = jax.random.split(self.key, 3)
            idx = jax.random.randint(k_cam, (B,), 0, n_cams)
            keys = jax.random.split(k_step, B)
            phase = phase_of_step(it, cfg)
            if it == cfg.context_from_step:
                self.model = self.model._replace(
                    bounds=update_anchor_bounds(self.model.state))
            track = cfg.start_stat < it < cfg.update_until
            (self.model, self.opt_state, self.stats,
             metrics) = self.dp_step_fn(
                self.model, self.opt_state, self.stats, cams_stacked,
                gt_images, gt_depths, idx, keys, phase=phase,
                track_stats=track)

            in_pause = cfg.densify_pause_from <= it < cfg.densify_pause_until
            if (track and not in_pause and it > cfg.update_from
                    and it % cfg.update_interval == 0):
                self.model, self.stats, self.opt_state, info = \
                    densify.adjust_anchor(self.model, self.stats,
                                          self.opt_state, cfg,
                                          self.voxel_size, self.np_rng)
                if self.mesh is not None:
                    self.model = put(self.model)
                    self.opt_state = put(self.opt_state)
                    self.stats = put(self.stats)
            else:
                info = None

            if it % log_every == 0 or it == iterations:
                self._emit_record(it, metrics._asdict(), info, callback)
        return self.model

    def _chunk_end(self, it: int, iterations: int, max_chunk: int) -> int:
        """Largest end step e >= it such that steps [it, e] share phase and
        track_stats, no bounds-update start falls strictly inside, and any
        densification step lands exactly at e."""
        cfg = self.cfg
        e = min(iterations, it + max_chunk - 1)
        # phase changes AFTER noise_from_step / context_from_step
        for b in (cfg.noise_from_step, cfg.context_from_step):
            if it <= b:
                e = min(e, b)
        # the bounds refresh must run right before step context_from_step
        if it < cfg.context_from_step:
            e = min(e, cfg.context_from_step - 1)
        # track_stats flips after start_stat and at update_until
        if it <= cfg.start_stat:
            e = min(e, cfg.start_stat)
        elif it < cfg.update_until:
            e = min(e, cfg.update_until - 1)
        # densification (host surgery) may trigger at any multiple of
        # update_interval — make that a chunk end
        nxt = -(-it // cfg.update_interval) * cfg.update_interval
        if nxt <= e:
            e = nxt
        return e

    def _run_device_loop(self, cameras, iterations, log_every, callback,
                         max_chunk):
        cfg = self.cfg
        if not hasattr(self, '_scan_fn'):
            self._scan_fn = make_train_scan(cfg, self.intr, self.optimizer,
                                            self.bg)
        cams_stacked = jax.tree.map(
            lambda *xs: jnp.stack(xs), *[c for c, _, _ in cameras])
        gt_images = jnp.stack([g for _, g, _ in cameras])
        gt_depths = jnp.stack([d for _, _, d in cameras])
        it = self.step + 1
        while it <= iterations:
            phase = phase_of_step(it, cfg)
            if it == cfg.context_from_step:
                self.model = self.model._replace(
                    bounds=update_anchor_bounds(self.model.state))
            track = cfg.start_stat < it < cfg.update_until
            e = self._chunk_end(it, iterations, max_chunk)
            n_steps = e - it + 1
            (self.model, self.opt_state, self.stats, self.key,
             metrics) = self._scan_fn(
                self.model, self.opt_state, self.stats, cams_stacked,
                gt_images, gt_depths, self.key, phase=phase,
                track_stats=track, n_steps=n_steps)
            self.step = e

            in_pause = cfg.densify_pause_from <= e < cfg.densify_pause_until
            if (track and not in_pause and e > cfg.update_from
                    and e % cfg.update_interval == 0):
                self.model, self.stats, self.opt_state, info = \
                    densify.adjust_anchor(self.model, self.stats,
                                          self.opt_state, cfg,
                                          self.voxel_size, self.np_rng)
            else:
                info = None

            log_its = [s for s in range(it, e + 1)
                       if s % log_every == 0 or s == iterations]
            if log_its:
                m_host = jax.tree.map(np.asarray, metrics)
                for s in log_its:
                    row = {k: v[s - it] for k, v in
                           m_host._asdict().items()}
                    self._emit_record(s, row, info if s == e else None,
                                      callback)
            it = e + 1
        return self.model
