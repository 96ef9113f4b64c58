"""Sharded train steps on the 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bloomscene_tpu.config import GSConfig
from bloomscene_tpu.models.model import init_model
from bloomscene_tpu.models.anchors import update_anchor_bounds
from bloomscene_tpu.parallel.mesh import make_mesh, shard_batch, replicated
from bloomscene_tpu.parallel.sharded import (make_dp_train_step,
                                             make_tile_parallel_render,
                                             make_tile_parallel_train_step)
from bloomscene_tpu.train.optim import make_optimizer
from bloomscene_tpu.models.render import render
from bloomscene_tpu.scene.cameras import camera_from_rt

CFG = GSConfig(voxel_size=0.12, max_splats_per_tile=128)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    pts = rng.uniform(-0.8, 0.8, (250, 3)).astype(np.float32)
    pts[:, 2] += 2.5
    model, vs = init_model(jax.random.PRNGKey(0), pts, CFG)
    model = model._replace(bounds=update_anchor_bounds(model.state))
    cam = camera_from_rt(np.eye(3), np.zeros(3), 1.0, 1.0, 64, 64)
    opt = make_optimizer(CFG, 1.0, model)
    return model, vs, cam, opt, opt.init(model)


def test_dp_step_matches_mean_of_views(setup):
    """DP over identical views == single-view step (gradient averaging)."""
    from bloomscene_tpu.models import densify
    model, vs, cam, opt, opt_state = setup
    n_dev = len(jax.devices())
    mesh = make_mesh(n_dev, data=n_dev)
    arrs = cam.device_arrays()
    B = n_dev
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.uniform(0, 1, (64, 64, 3)).astype(np.float32))
    dep = jnp.zeros((64, 64))
    cams_stacked = jax.tree.map(lambda x: x[None], arrs)   # 1 camera
    stats = densify.init_stats(model.state.capacity, CFG.n_offsets)

    step = make_dp_train_step(CFG, cam.intrinsics, opt, jnp.zeros(3),
                              mesh=mesh)
    idx = jnp.zeros((B,), jnp.int32)
    keys = jnp.stack([jax.random.PRNGKey(5)] * B)
    m_dp, _, stats_dp, metrics_dp = step(
        model, opt_state, stats, cams_stacked, img[None], dep[None],
        shard_batch(idx, mesh), shard_batch(keys, mesh),
        phase=0, track_stats=True)

    # same-view replicated batch must equal the single-view update
    step1 = make_tile_parallel_train_step(CFG, cam.intrinsics, opt,
                                          jnp.zeros(3),
                                          make_mesh(1, data=1), phase=0)
    m_1, _, loss_1 = step1(model, opt_state, arrs, img, dep,
                           jax.random.PRNGKey(5))
    np.testing.assert_allclose(float(metrics_dp.loss), float(loss_1),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(m_dp), jax.tree.leaves(m_1)):
        if jnp.issubdtype(a.dtype, jnp.floating):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5, rtol=1e-4)
    # stats accumulated B identical views => B x the single-view stat
    assert float(jnp.max(stats_dp.anchor_demon)) == float(B)


def test_tile_parallel_render_matches_local(setup):
    model, vs, cam, opt, opt_state = setup
    n_dev = len(jax.devices())
    mesh = make_mesh(n_dev, data=1)
    arrs = cam.device_arrays()
    rfun = make_tile_parallel_render(CFG, cam.intrinsics, mesh, phase=0,
                                     mode='train')
    rep = replicated(mesh)
    out_sharded = rfun(jax.device_put(model, rep),
                       jax.device_put(arrs, rep),
                       jax.device_put(jax.random.PRNGKey(2), rep))
    out_local = render(model, cam.intrinsics, arrs, CFG, phase=0,
                       mode='train', key=jax.random.PRNGKey(2)).out
    np.testing.assert_allclose(np.asarray(out_sharded.color),
                               np.asarray(out_local.color), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_sharded.depth),
                               np.asarray(out_local.depth), atol=1e-4)


def test_tile_sharded_pallas_matches_unsharded():
    """backend='pallas' under a tile-sharded mesh must run the Mosaic
    kernels per-device via shard_map (not silently downgrade) and match
    the unsharded Pallas render and gradients."""
    import bloomscene_tpu.ops.pallas.blend as pb
    from jax.sharding import NamedSharding, PartitionSpec as P
    from bloomscene_tpu.ops import graphics, projection
    from bloomscene_tpu.ops.tile_rasterizer import rasterize_tiles

    pb.INTERPRET = True
    try:
        rng = np.random.default_rng(7)
        n, W, H = 150, 64, 64
        means = np.stack([rng.uniform(-1.2, 1.2, n),
                          rng.uniform(-1.2, 1.2, n),
                          rng.uniform(0.8, 5.0, n)], -1).astype(np.float32)
        scales = rng.uniform(0.02, 0.25, (n, 3)).astype(np.float32)
        quats = rng.normal(size=(n, 4)).astype(np.float32)
        quats /= np.linalg.norm(quats, axis=1, keepdims=True)
        colors = jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32))
        opac = jnp.asarray(rng.uniform(0.1, 0.95, n).astype(np.float32))
        view = graphics.world_to_view(np.eye(3), np.zeros(3))
        proj_m = graphics.projection_matrix(0.01, 100.0, 1.0, 1.0) @ view
        fx = graphics.fov2focal(1.0, W)
        t = float(np.tan(0.5))
        mesh = make_mesh(len(jax.devices()), data=1)
        shard = NamedSharding(mesh, P('tile'))

        def run(sharding):
            def loss(args):
                means, colors, opac = args
                cov6 = projection.build_cov3d(jnp.asarray(scales),
                                              jnp.asarray(quats))
                p = projection.project_gaussians(
                    means, cov6, jnp.asarray(view), jnp.asarray(proj_m),
                    W, H, fx, fx, t, t)
                out, _ = rasterize_tiles(p, colors, opac, jnp.zeros(3),
                                         W, H, tile=16, tile_capacity=128,
                                         backend='pallas',
                                         tile_sharding=sharding)
                return (jnp.mean(out.color) + 0.3 * jnp.mean(out.depth)
                        + 0.1 * jnp.mean(out.alpha)), out

            args = (jnp.asarray(means), colors, opac)
            (l, out), g = jax.jit(jax.value_and_grad(
                loss, has_aux=True))(args)
            return l, out, g

        l_s, out_s, g_s = run(shard)
        l_u, out_u, g_u = run(None)
        np.testing.assert_allclose(np.asarray(out_s.color),
                                   np.asarray(out_u.color), atol=1e-6)
        np.testing.assert_allclose(np.asarray(out_s.depth),
                                   np.asarray(out_u.depth), atol=1e-5)
        np.testing.assert_allclose(float(l_s), float(l_u), rtol=1e-6)
        for a, b in zip(g_s, g_u):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5, rtol=1e-4)
    finally:
        pb.INTERPRET = False


def test_dp_trainer_matches_single_device_curve():
    """The INTEGRATED data-parallel Trainer (mesh, B views/step, densify
    stats + adjust_anchor + phase schedule) must reproduce the
    single-device batched trainer's loss curve and densification."""
    from bloomscene_tpu.train.loop import Trainer

    cfg = GSConfig(voxel_size=0.12, max_splats_per_tile=2560,
                   iterations=24, start_stat=2, update_from=6,
                   update_interval=8, update_until=22,
                   densify_pause_from=98, densify_pause_until=99,
                   noise_from_step=6, context_from_step=12)
    rng = np.random.default_rng(3)
    pts = rng.uniform(-0.8, 0.8, (200, 3)).astype(np.float32)
    pts[:, 2] += 2.5
    from bloomscene_tpu.models.model import init_model
    cam = camera_from_rt(np.eye(3), np.zeros(3), 1.0, 1.0, 64, 64)
    cameras = []
    for i in range(3):
        img = jnp.asarray(rng.uniform(0, 1, (64, 64, 3)).astype(np.float32))
        dep = jnp.asarray(rng.uniform(1, 4, (64, 64)).astype(np.float32))
        cameras.append((cam.device_arrays(), img, dep))

    def run(mesh):
        model, vs = init_model(jax.random.PRNGKey(0), pts, cfg)
        tr = Trainer(model, cfg, cam.intrinsics, vs, seed=11, mesh=mesh,
                     dp_batch=4)
        tr.run(cameras, iterations=cfg.iterations, log_every=4)
        return tr

    n_dev = len(jax.devices())
    tr_mesh = run(make_mesh(n_dev, data=min(4, n_dev)))
    tr_one = run(None)
    assert len(tr_mesh.history) == len(tr_one.history)
    for a, b in zip(tr_mesh.history, tr_one.history):
        np.testing.assert_allclose(a['loss'], b['loss'], rtol=5e-4,
                                   atol=1e-5)
        np.testing.assert_allclose(a['psnr'], b['psnr'], rtol=5e-3)
    # densification made the same growth decisions
    assert (int(jnp.sum(tr_mesh.model.state.alive))
            == int(jnp.sum(tr_one.model.state.alive)))
