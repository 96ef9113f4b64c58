"""Worker process for the 2-host CPU multi-process test.

Launched by tests/test_multihost.py as:
    python multihost_worker.py <coordinator> <process_id> <num_processes>
with JAX_PLATFORMS=cpu and XLA_FLAGS forcing 4 virtual devices, in the
sanitized (axon-free) environment. Builds the SAME tiny scene as the
single-process reference, runs the data-parallel and tile-parallel train
steps on the global 2x4 mesh, and prints one JSON line with both losses.
(SURVEY.md section 4 prescribes exactly this jax.distributed CPU recipe —
the reference has no multi-host anything to mirror.)
"""
import json
import sys


def build_scene():
    import numpy as np
    import jax
    from bloomscene_tpu.config import GSConfig
    from bloomscene_tpu.models.model import init_model
    from bloomscene_tpu.models.anchors import update_anchor_bounds
    from bloomscene_tpu.scene.cameras import camera_from_rt

    cfg = GSConfig(voxel_size=0.15, max_splats_per_tile=128)
    rng = np.random.default_rng(0)
    pts = rng.uniform(-1, 1, (200, 3)).astype(np.float32)
    pts[:, 2] += 2.5
    model, _ = init_model(jax.random.PRNGKey(0), pts, cfg)
    model = model._replace(bounds=update_anchor_bounds(model.state))
    cam = camera_from_rt(np.eye(3), np.zeros(3), 1.0, 1.0, 64, 64)
    return cfg, model, cam


def run(mesh_data: int | None = None):
    """Returns (dp_loss, tp_loss); runs on whatever devices exist."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P
    from bloomscene_tpu.parallel.mesh import (make_host_mesh,
                                              make_global_tree)
    from bloomscene_tpu.parallel.sharded import (
        make_dp_train_step, make_tile_parallel_train_step)
    from bloomscene_tpu.models import densify
    from bloomscene_tpu.train.optim import make_optimizer

    cfg, model, cam = build_scene()
    intr = cam.intrinsics
    arrs = cam.device_arrays()
    optimizer = make_optimizer(cfg, 1.0, model)
    opt_state = optimizer.init(model)
    bg = jnp.zeros(3)
    W = H = 64
    B = 2
    rng = np.random.default_rng(7)
    gt_images = jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)), jnp.float32)
    gt_depths = jnp.asarray(rng.uniform(1, 4, (B, H, W)), jnp.float32)
    cams = jax.tree.map(lambda x: jnp.stack([x] * B), arrs)
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    stats = densify.init_stats(model.state.capacity, cfg.n_offsets)

    # --- DP across hosts: data axis = B = host count (the integrated
    # trainer step from train.loop: stats + metrics + NaN guard) ---
    mesh = make_host_mesh(data=B)
    rep = lambda t: make_global_tree(t, mesh, P())
    dat = lambda t: make_global_tree(t, mesh, P('data'))
    step_dp = make_dp_train_step(cfg, intr, optimizer, bg, mesh=mesh)
    idx = jnp.arange(B, dtype=jnp.int32)
    _, _, _, metrics = step_dp(rep(model), rep(opt_state), rep(stats),
                               rep(cams), rep(gt_images), rep(gt_depths),
                               dat(idx), dat(keys),
                               phase=0, track_stats=True)
    dp_loss = float(metrics.loss)

    # --- tile-parallel across ALL devices of both hosts ---
    mesh_tp = make_host_mesh(data=1)
    rep_tp = lambda t: make_global_tree(t, mesh_tp, P())
    step_tp = make_tile_parallel_train_step(cfg, intr, optimizer, bg,
                                            mesh_tp, phase=0)
    _, _, tp_loss = step_tp(rep_tp(model), rep_tp(opt_state), rep_tp(arrs),
                            rep_tp(gt_images[0]), rep_tp(gt_depths[0]),
                            rep_tp(jax.random.PRNGKey(1)))
    return dp_loss, float(tp_loss)


def main():
    coordinator, pid, nprocs = (sys.argv[1], int(sys.argv[2]),
                                int(sys.argv[3]))
    import jax
    from bloomscene_tpu.parallel.mesh import init_distributed
    init_distributed(coordinator, nprocs, pid)
    assert jax.process_count() == nprocs, jax.process_count()
    assert len(jax.local_devices()) == 4, len(jax.local_devices())
    assert jax.device_count() == 4 * nprocs, jax.device_count()
    dp_loss, tp_loss = run()
    print(json.dumps({'process': pid, 'dp_loss': dp_loss,
                      'tp_loss': tp_loss}), flush=True)


if __name__ == '__main__':
    main()
