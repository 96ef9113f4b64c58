"""Consistency A/B for the full-scale run (VERDICT r3 item 1b).

The stub-prior 512^2 scene's 50 training views are mutually INCONSISTENT
(reprojection holes filled by a deterministic stub inpainter + stub
depth, no cross-view constraint) — so per-view train PSNR has a ceiling
no optimizer can cross. This experiment separates model bugs from data
inconsistency:

  A) load the trained full-scale run, render its 50 train poses, report
     mean/median train-view PSNR vs the stub supervision (the achieved
     fit), plus the pairwise supervision-inconsistency proxy;
  B) re-fit a FRESH model on the *renders* from (A) as supervision — a
     perfectly multi-view-consistent scene with identical poses, point
     cloud, schedule, and losses. If the machinery is sound this run
     must fit far tighter (target >= 25 dB mean).

Writes CONSISTENCY_r04.json.

Usage: python consistency_ab.py [--run_dir /tmp/fullscale_run]
       [--iterations 2990] — run ALONE (one TPU process at a time).
"""
from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def mean_trainview_psnr(bs, model, mode='eval'):
    from bloomscene_tpu.utils.metrics import psnr
    frames_rgb, frames_depth, _ = bs._render_model(
        model, bs.scene.train_cameras, mode=mode)
    ps = [psnr(r, np.asarray(c.image))
          for r, c in zip(frames_rgb, bs.scene.train_cameras)]
    return ps, frames_rgb, frames_depth


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--run_dir', type=str, default='/tmp/fullscale_run')
    ap.add_argument('--iterations', type=int, default=2990)
    ap.add_argument('--out', type=str, default='CONSISTENCY_r04.json')
    ap.add_argument('--refit_dir', type=str,
                    default='/tmp/fullscale_consistent')
    ap.add_argument('--pure_fit', action='store_true',
                    help='B variant isolating FIT CAPACITY from the '
                         'codec regularizers: train without the '
                         'quantization-noise phases (noise_from/'
                         'context_from -> inf) and score the raw '
                         '(unquantized, mode=decoded) renders. The '
                         'default B trains under phase-1 noise and is '
                         'scored in eval mode, whose adaptive-Q context '
                         'MLP is UNTRAINED when phase 2 never ran — '
                         'that confound belongs to the codec design, '
                         'not the fit machinery.')
    args = ap.parse_args()

    from bloomscene_tpu.config import CameraConfig, GSConfig
    from bloomscene_tpu.pipeline.bloomscene import BloomScene
    from bloomscene_tpu.scene.dataset import read_scene_data

    cfg_kw = dict(voxel_size=0.03, visible_capacity=131072,
                  device_loop=True, device_loop_chunk=50,
                  use_dpr=True, lambda_dep_value=0.7,
                  lambda_dep_domin=0.1, lambda_dep_smooth=1.0)
    if args.pure_fit:
        cfg_kw.update(noise_from_step=10 ** 9, context_from_step=10 ** 9)
    cfg = GSConfig(**cfg_kw)
    cam = CameraConfig(H=512, W=512, focal=(582.69,) * 2)

    rec = {"artifact": "consistency A/B (stub-prior scene vs "
                       "self-consistent renders)",
           "run_dir": args.run_dir, "iterations": args.iterations}
    prior = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            prior = json.load(f)

    # ---- A: achieved fit on the stub scene -------------------------
    bs = BloomScene.load(args.run_dir, cfg=cfg, cam=cam)
    ps, renders_rgb, renders_depth = mean_trainview_psnr(bs, bs.model)
    rec["A_stub_scene"] = {
        "mean_psnr": round(float(np.mean(ps)), 3),
        "median_psnr": round(float(np.median(ps)), 3),
        "min_psnr": round(float(np.min(ps)), 3),
        "max_psnr": round(float(np.max(ps)), 3),
        "n_views": len(ps)}
    print("A (stub):", rec["A_stub_scene"], flush=True)

    # ---- B: refit on the consistent renders ------------------------
    traindata2 = dict(bs.traindata)
    traindata2["frames"] = [
        {"image": np.asarray(r, np.float32),
         "depth": np.asarray(d, np.float32),
         "transform_matrix": fr["transform_matrix"]}
        for r, d, fr in zip(renders_rgb, renders_depth,
                            bs.traindata["frames"])]

    os.makedirs(args.refit_dir, exist_ok=True)
    bs2 = BloomScene(args.refit_dir, cfg=cfg, cam=cam, seed=1)
    bs2.traindata = traindata2
    bs2.scene = read_scene_data(traindata2, cfg.white_background)

    t0 = time.time()
    bs2.training(iterations=args.iterations, log_every=200,
                 callback=lambda r: print(
                     {k: round(float(v), 4)
                      for k, v in r.items()
                      if k in ('iteration', 'loss', 'psnr')}, flush=True))
    rec["B_train_s"] = round(time.time() - t0, 1)

    score_mode = 'decoded' if args.pure_fit else 'eval'
    ps2, _, _d = mean_trainview_psnr(bs2, bs2.model, mode=score_mode)
    bkey = "B2_pure_fit" if args.pure_fit else "B_consistent_scene"
    rec[bkey] = {
        "mean_psnr": round(float(np.mean(ps2)), 3),
        "median_psnr": round(float(np.median(ps2)), 3),
        "min_psnr": round(float(np.min(ps2)), 3),
        "max_psnr": round(float(np.max(ps2)), 3),
        "n_views": len(ps2), "score_mode": score_mode,
        "noise_phases": not args.pure_fit}
    if args.pure_fit:
        # raw (unquantized) fit of the ORIGINAL stub-scene model, for
        # the symmetric comparison
        psa_raw, _, _dd = mean_trainview_psnr(bs, bs.model,
                                              mode='decoded')
        rec["A_stub_scene_raw"] = {
            "mean_psnr": round(float(np.mean(psa_raw)), 3),
            "median_psnr": round(float(np.median(psa_raw)), 3)}
        rec["conclusion_pure_fit"] = (
            ("pure-fit B (no codec noise, raw renders) reaches "
             f"{float(np.mean(ps2)):.1f} dB vs raw A "
             f"{float(np.mean(psa_raw)):.1f} dB: ")
            + ("the rendering/training machinery fits consistent data "
               "tightly; the flagship ceiling decomposes into stub-"
               "supervision inconsistency + the codec's quantization-"
               "noise regularization (a designed rate-distortion cost),"
               " not an optimizer/renderer defect"
               if np.mean(ps2) >= 25.0 else
               "the machinery itself plateaus on consistent data — a "
               "genuine training-path limitation"))
    else:
        rec["conclusion"] = (
            "B >> A with identical machinery/schedule => the stub "
            "scene's train-PSNR ceiling is supervision inconsistency, "
            "not a model/optimizer defect"
            if np.mean(ps2) >= np.mean(ps) + 5 else
            "B !>> A: the fit ceiling is NOT explained by supervision "
            "inconsistency — investigate the training path")

    merged = {**prior, **rec}
    with open(args.out, 'w') as f:
        json.dump(merged, f, indent=2)
    print(json.dumps(merged), flush=True)


if __name__ == '__main__':
    main()
