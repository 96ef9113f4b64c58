"""Multi-device tile-throughput scaling harness (north-star config 5).

Measures the tile-parallel full train step (parallel/sharded.py) on meshes
of 1..N devices and reports throughput scaling. On real multi-chip TPU
hardware this measures ICI scaling; on a single-chip or CPU host it runs on
the virtual device mesh (functional validation + scheduling overheads only
— XLA collectives over host "devices" share one core, so CPU numbers are
NOT a performance signal).

Usage: python bench_scaling.py [--devices 1 2 4 8] [--splats 20000]
Prints one JSON line per mesh size.
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--devices', type=int, nargs='+', default=None)
    ap.add_argument('--splats', type=int, default=20000)
    ap.add_argument('--res', type=int, default=256)
    ap.add_argument('--iters', type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from bloomscene_tpu.config import GSConfig
    from bloomscene_tpu.models.model import init_model
    from bloomscene_tpu.models.anchors import update_anchor_bounds
    from bloomscene_tpu.parallel.mesh import make_mesh, replicated
    from bloomscene_tpu.parallel.sharded import make_tile_parallel_train_step
    from bloomscene_tpu.train.optim import make_optimizer
    from bloomscene_tpu.scene.cameras import camera_from_rt

    n_avail = len(jax.devices())
    sizes = args.devices or [d for d in (1, 2, 4, 8) if d <= n_avail]

    W = H = args.res
    cfg = GSConfig(voxel_size=0.05, max_splats_per_tile=512)
    rng = np.random.default_rng(0)
    n_pts = max(64, args.splats // cfg.n_offsets)
    pts = rng.uniform(-1, 1, (n_pts, 3)).astype(np.float32)
    pts[:, 2] += 2.5
    model, _ = init_model(jax.random.PRNGKey(0), pts, cfg)
    model = model._replace(bounds=update_anchor_bounds(model.state))
    cam = camera_from_rt(np.eye(3), np.zeros(3), 1.0, 1.0, W, H)
    optimizer = make_optimizer(cfg, 1.0, model)
    opt_state = optimizer.init(model)
    gt_img = jnp.zeros((H, W, 3))
    gt_dep = jnp.zeros((H, W))

    base = None
    for nd in sizes:
        mesh = make_mesh(nd, data=1)
        step = make_tile_parallel_train_step(cfg, cam.intrinsics, optimizer,
                                             jnp.zeros(3), mesh, phase=0)
        rep = replicated(mesh)
        put = lambda x: jax.device_put(x, rep)
        m, o = put(model), put(opt_state)
        arrs = put(cam.device_arrays())
        key = put(jax.random.PRNGKey(1))
        m2, o2, loss = step(m, o, arrs, put(gt_img), put(gt_dep), key)
        jax.block_until_ready(loss)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            m2, o2, loss = step(m, o, arrs, put(gt_img), put(gt_dep), key)
        jax.block_until_ready(loss)
        dt = (time.perf_counter() - t0) / args.iters
        mpix = W * H / dt / 1e6
        if base is None:
            base = mpix
        print(json.dumps({
            'devices': nd, 'step_ms': round(dt * 1000, 2),
            'mpix_per_s': round(mpix, 3),
            'scaling_efficiency': round(mpix / (base * nd), 4),
            'platform': jax.devices()[0].platform,
        }))


if __name__ == '__main__':
    main()
