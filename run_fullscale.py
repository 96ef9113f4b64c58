"""Full-scale end-to-end TPU run artifact (VERDICT r2 item 6).

Drives the COMPLETE pipeline at reference scale on the real chip — stub
priors, 512x512, the full 2990-iteration schedule (reference
arguments.py:23, bloomscene.py:222-361), device-loop training, SCC codec
round trip, orbit render — and writes RUN_r03.json with wall-clock,
ms/step, anchor counts, PSNR, codec sizes and eval fps. Run ALONE (one
TPU process at a time; the axon relay serializes chips).

Usage: python run_fullscale.py [--iterations 2990] [--out RUN_r03.json]
"""
from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--iterations', type=int, default=2990)
    ap.add_argument('--out', type=str, default='RUN_r03.json')
    ap.add_argument('--save_dir', type=str, default='/tmp/fullscale_run')
    ap.add_argument('--resolution', type=int, default=512)
    ap.add_argument('--voxel_size', type=float, default=0.002)
    ap.add_argument('--visible_capacity', type=int, default=131072)
    ap.add_argument('--render_frames', type=int, default=60)
    args = ap.parse_args()

    from PIL import Image
    import jax
    import jax.numpy as jnp
    from bloomscene_tpu.config import CameraConfig, GSConfig
    from bloomscene_tpu.pipeline.bloomscene import BloomScene
    from bloomscene_tpu.priors import StubDepthPrior, StubInpaintPrior

    res = args.resolution
    cfg = GSConfig(voxel_size=args.voxel_size,
                   visible_capacity=args.visible_capacity,
                   device_loop=True, device_loop_chunk=50,
                   use_dpr=True, lambda_dep_value=0.7,
                   lambda_dep_domin=0.1, lambda_dep_smooth=1.0)
    cam = CameraConfig(H=res, W=res, focal=(582.69 * res / 512,) * 2)

    img_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            'examples', '01_childroom.png')
    rgb = np.asarray(Image.open(img_path).convert('RGB').resize(
        (res, res)), np.float32) / 255.0

    os.makedirs(args.save_dir, exist_ok=True)
    bs = BloomScene(args.save_dir, cfg=cfg, cam=cam,
                    inpaint_prior=StubInpaintPrior(),
                    depth_prior=StubDepthPrior(), seed=1)

    rec = {"artifact": "full-scale end-to-end TPU run",
           "device": str(jax.devices()[0]),
           "resolution": res, "iterations": args.iterations,
           "voxel_size": args.voxel_size,
           "visible_capacity": args.visible_capacity,
           "priors": "stub (no SD/ZoeDepth weights in container)",
           "dpr": True, "device_loop": True}

    t0 = time.time()
    bs.generate(rgb, "a child room with toys", diff_steps=1, verbose=False)
    rec["generate_s"] = round(time.time() - t0, 1)
    rec["n_train_views"] = len(bs.scene.train_cameras)
    rec["pcd_points"] = int(bs.traindata['pcd_points'].shape[1])

    peak = {"n": 0}
    logs = []

    def cb(r):
        peak["n"] = max(peak["n"], int(r.get('densify_n_alive', 0) or 0))
        logs.append({k: (round(float(v), 5)
                         if isinstance(v, (int, float)) else v)
                     for k, v in r.items()
                     if k in ('iteration', 'loss', 'psnr', 'bit_per_param',
                              'n_visible_anchors', 'densify_n_alive',
                              'tile_overflow', 'pair_overflow')})
        print(logs[-1], flush=True)

    t0 = time.time()
    bs.training(iterations=args.iterations, log_every=100, callback=cb,
                resume=True, checkpoint_every=500)
    t_train = time.time() - t0
    rec["train_s"] = round(t_train, 1)
    rec["ms_per_step_incl_compile"] = round(
        t_train / args.iterations * 1e3, 2)
    # steady-state step time: the trailing device-loop chunks (compile
    # amortized away) — from the trainer's own per-chunk timing if present
    hist = bs.trainer.history
    rec["final_loss"] = round(float(hist[-1]['loss']), 5)
    rec["final_psnr"] = round(float(hist[-1]['psnr']), 3)
    rec["final_bit_per_param"] = round(
        float(hist[-1].get('bit_per_param', 0.0) or 0.0), 5)
    st = bs.model.state
    rec["peak_anchors"] = max(peak["n"], int(jnp.sum(st.alive)))
    rec["final_anchors"] = int(jnp.sum(st.alive))
    rec["anchor_capacity_bucket"] = int(st.capacity)

    t0 = time.time()
    sizes = bs.compress()
    rec["encode_decode_s"] = round(time.time() - t0, 1)
    rec["codec_sizes_MB"] = {k: round(float(v), 4)
                             for k, v in sizes.items()
                             if isinstance(v, (int, float)) and '_MB' in k}
    rec["codec_total_MB"] = round(float(sizes.get('total_MB', 0.0)), 3)
    rec["codec_split"] = {
        "encode_context_s": sizes.get('context_s'),
        "encode_quantize_s": sizes.get('quantize_s'),
        "encode_rans_s": sizes.get('rans_s'),
        "decode_split": sizes.get('decode_split'),
    }

    # at-scale bit-exact re-encode check: encoding the decoded scene must
    # reproduce every bitstream byte-for-byte (the unit-scale version
    # lives in tests/test_codec.py; this runs it on the full scene)
    from bloomscene_tpu.codec.codec import encode_scene as _enc
    path1 = os.path.join(bs.save_dir, 'bitstreams')
    path2 = os.path.join(bs.save_dir, 'bitstreams_reenc')
    t0 = time.time()
    _enc(bs.decoded_model, bs.cfg, path2)
    mismatch = []
    for fn in sorted(os.listdir(path1)):
        if not fn.endswith('.b'):
            continue
        with open(os.path.join(path1, fn), 'rb') as f1, \
                open(os.path.join(path2, fn), 'rb') as f2:
            if f1.read() != f2.read():
                mismatch.append(fn)
    rec["reencode_bit_exact"] = not mismatch
    rec["reencode_check_s"] = round(time.time() - t0, 1)
    if mismatch:
        rec["reencode_mismatch_files"] = mismatch[:10]

    bs.save_outputs()
    pk = 'rotate360'
    n_frames = len(bs.scene.preset_cameras[pk])
    stride = max(1, n_frames // args.render_frames)
    bs.scene = bs.scene._replace(preset_cameras={
        pk: bs.scene.preset_cameras[pk][::stride]})
    t0 = time.time()
    vid = bs.render_video(pk, use_decoded=True)
    rec["video"] = {k: v for k, v in vid.items()
                    if isinstance(v, (int, float, str))}
    ev = bs.render_eval("a child room with toys")
    rec["eval_fps"] = round(float(ev.get('eval_fps', 0.0)), 2)
    rec["proxy_iqa"] = {k: round(float(v), 4) for k, v in ev.items()
                        if k.startswith('proxy_')}
    rec["log_tail"] = logs[-5:]

    with open(args.out, 'w') as f:
        json.dump(rec, f, indent=2)
    print(json.dumps({k: v for k, v in rec.items() if k != 'log_tail'}),
          flush=True)


if __name__ == '__main__':
    main()
