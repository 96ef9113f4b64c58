"""Minimal end-to-end training demo: fit the anchor model to one view.

Builds a tiny synthetic scene (a colored disk target + a sphere-shell
point cloud), trains the full stack (neural decode -> tile rasterizer ->
loss -> 13-group Adam, densification on) for a few hundred steps, and
writes before/after renders + a loss curve JSON.

Run on CPU (sanitized env in this container) or TPU:

    python -m bloomscene_tpu.examples.fit_single_view \
        --steps 300 --out /tmp/fit_single_view

This is the smallest honest slice of the reference training loop
(bloomscene.py:222-361) — the full image+text pipeline lives in
bloomscene_tpu.pipeline.run.
"""
from __future__ import annotations

import argparse
import json
import os

import jax
import numpy as np


def build_scene(n_points: int = 1500, seed: int = 0, res: int = 128):
    from ..scene.cameras import camera_from_rt

    rng = np.random.default_rng(seed)
    th = rng.uniform(0, np.pi, n_points)
    ph = rng.uniform(0, 2 * np.pi, n_points)
    pts = np.stack([np.sin(th) * np.cos(ph), np.sin(th) * np.sin(ph),
                    np.cos(th)], -1).astype(np.float32) * 0.7
    pts[:, 2] += 2.5

    cam = camera_from_rt(np.eye(3), np.zeros(3), 1.0, 1.0, res, res)
    yy, xx = np.mgrid[0:res, 0:res]
    r2 = (xx - res // 2) ** 2 + (yy - res // 2) ** 2
    img = np.zeros((res, res, 3), np.float32)
    img[r2 < (res // 3) ** 2] = [0.85, 0.45, 0.2]
    img[r2 < (res // 6) ** 2] = [0.2, 0.5, 0.85]
    depth = np.where(r2 < (res // 3) ** 2, 2.5, 0.0).astype(np.float32)
    return pts, cam, img, depth


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--steps', type=int, default=300)
    ap.add_argument('--res', type=int, default=128)
    ap.add_argument('--out', type=str, default='/tmp/fit_single_view')
    ap.add_argument('--device_loop', action='store_true',
                    help='train in scan chunks (one dispatch per chunk)')
    ap.add_argument('--seed', type=int, default=0)
    ap.add_argument('--color_mode', type=str, default='mlp',
                    choices=('mlp', 'sh'))
    ap.add_argument('--sh_degree', type=int, default=1)
    args = ap.parse_args()

    import jax.numpy as jnp

    from ..config import GSConfig
    from ..models.model import init_model
    from ..models.render import render
    from ..train.loop import Trainer

    os.makedirs(args.out, exist_ok=True)
    pts, cam, img, depth = build_scene(seed=args.seed, res=args.res)
    cfg = GSConfig(iterations=args.steps, voxel_size=0.08,
                   max_splats_per_tile=2048,
                   start_stat=10, update_from=50, update_interval=100,
                   update_until=max(60, args.steps - 20),
                   noise_from_step=10 ** 9, context_from_step=10 ** 9,
                   color_mode=args.color_mode, sh_degree=args.sh_degree)

    model, voxel_size = init_model(jax.random.PRNGKey(args.seed), pts, cfg)
    views = [(cam.device_arrays(), jnp.asarray(img), jnp.asarray(depth))]

    def snapshot(m, path):
        res_r = render(m, cam.intrinsics, cam.device_arrays(), cfg,
                       phase=0, mode='eval', bg=jnp.zeros(3))
        arr = np.clip(np.asarray(res_r.out.color), 0, 1)
        try:
            import imageio.v2 as imageio
            imageio.imwrite(path, (arr * 255).astype(np.uint8))
        except ImportError:
            np.save(path + '.npy', arr)
        return arr

    before = snapshot(model, os.path.join(args.out, 'before.png'))

    trainer = Trainer(model, cfg, cam.intrinsics, voxel_size,
                      seed=args.seed)
    model = trainer.run(views, log_every=25,
                        device_loop=args.device_loop,
                        callback=lambda rec: print(
                            f"step {rec['iteration']:4d} "
                            f"loss {rec['loss']:.4f} "
                            f"psnr {rec['psnr']:.2f}", flush=True))

    after = snapshot(model, os.path.join(args.out, 'after.png'))
    hist = trainer.history
    with open(os.path.join(args.out, 'loss_curve.json'), 'w') as f:
        json.dump(hist, f, indent=1)

    err_before = float(np.mean(np.abs(before - img)))
    err_after = float(np.mean(np.abs(after - img)))
    print(json.dumps({'steps': args.steps,
                      'loss_first': hist[0]['loss'],
                      'loss_last': hist[-1]['loss'],
                      'l1_before': round(err_before, 4),
                      'l1_after': round(err_after, 4),
                      'out': args.out}))
    assert err_after < err_before, "training did not improve the render"


if __name__ == '__main__':
    main()
