"""Training integration: loss decreases, densification surgery works."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bloomscene_tpu.config import GSConfig
from bloomscene_tpu.models.model import init_model
from bloomscene_tpu.models import densify
from bloomscene_tpu.train.loop import Trainer, phase_of_step
from bloomscene_tpu.train.schedules import expon_lr
from bloomscene_tpu.scene.cameras import camera_from_rt


def small_cfg(**kw):
    base = dict(voxel_size=0.08, max_splats_per_tile=2048, iterations=120,
                start_stat=10, update_from=20, update_interval=40,
                update_until=110, densify_pause_from=10 ** 9,
                noise_from_step=10 ** 9, context_from_step=10 ** 9)
    base.update(kw)
    return GSConfig(**base)


def synthetic_scene(n=800, seed=0):
    rng = np.random.default_rng(seed)
    th, ph = rng.uniform(0, np.pi, n), rng.uniform(0, 2 * np.pi, n)
    pts = np.stack([np.sin(th) * np.cos(ph), np.sin(th) * np.sin(ph),
                    np.cos(th)], -1).astype(np.float32) * 0.7
    pts[:, 2] += 2.5
    return pts


def target_views(W=64, H=64):
    cam = camera_from_rt(np.eye(3), np.zeros(3), 1.0, 1.0, W, H)
    yy, xx = np.mgrid[0:H, 0:W]
    img = np.zeros((H, W, 3), np.float32)
    img[(xx - W // 2) ** 2 + (yy - H // 2) ** 2 < (W // 3) ** 2] = [0.8, 0.4, 0.2]
    depth = np.where((xx - W // 2) ** 2 + (yy - H // 2) ** 2 < (W // 3) ** 2,
                     2.5, 0.0).astype(np.float32)
    return cam, [(cam.device_arrays(), jnp.asarray(img), jnp.asarray(depth))]


def test_expon_lr_schedule():
    f = expon_lr(1e-2, 1e-4, max_steps=100)
    assert abs(float(f(0)) - 1e-2) < 1e-9
    assert abs(float(f(100)) - 1e-4) < 1e-9
    assert 1e-4 < float(f(50)) < 1e-2


def test_phase_of_step():
    cfg = GSConfig()
    assert phase_of_step(1, cfg) == 0
    assert phase_of_step(1000, cfg) == 0
    assert phase_of_step(1001, cfg) == 1
    assert phase_of_step(2000, cfg) == 1
    assert phase_of_step(2001, cfg) == 2


def test_training_loss_decreases():
    cfg = small_cfg(iterations=80, update_from=10 ** 9)  # no densify
    pts = synthetic_scene()
    model, vs = init_model(jax.random.PRNGKey(0), pts, cfg)
    cam, views = target_views()
    tr = Trainer(model, cfg, cam.intrinsics, vs)
    tr.run(views, log_every=20)
    first = tr.history[0]['loss']
    last = tr.history[-1]['loss']
    assert last < first * 0.7, (first, last)
    assert tr.history[-1]['tile_overflow'] == 0


def test_capacity_overflow_warns():
    """An undersized per-tile capacity must WARN loudly (depth-aware
    truncation is graceful, never silent) — the inverse of the sized
    configs above, which must stay warning-free in CI."""
    import warnings
    cfg = small_cfg(iterations=12, update_from=10 ** 9,
                    max_splats_per_tile=32)
    pts = synthetic_scene(600)
    model, vs = init_model(jax.random.PRNGKey(2), pts, cfg)
    cam, views = target_views()
    tr = Trainer(model, cfg, cam.intrinsics, vs)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        tr.run(views, iterations=12, log_every=4)
    msgs = [str(w.message) for w in rec
            if "capacity overflow" in str(w.message)]
    assert msgs, "expected a rasterizer capacity-overflow warning"
    assert tr.history[-1]['tile_overflow'] > 0


def test_training_with_densification_and_rate():
    """Cross an adjust_anchor boundary and the context phase."""
    cfg = small_cfg(iterations=100, update_from=20, update_interval=30,
                    update_until=95, noise_from_step=30, context_from_step=60)
    pts = synthetic_scene(400)
    model, vs = init_model(jax.random.PRNGKey(1), pts, cfg)
    cam, views = target_views()
    tr = Trainer(model, cfg, cam.intrinsics, vs)
    m = tr.run(views, log_every=10)
    # model survived surgery; rate loss kicked in after context_from_step
    assert any(r.get('bit_per_param', 0) > 0 for r in tr.history)
    assert int(m.state.num_alive()) > 0
    assert all(np.isfinite(r['loss']) for r in tr.history)


def test_visible_compaction_trains_and_matches_dense():
    """cfg.visible_capacity bounds per-step decode to visible anchors;
    a full training run (incl. densification stats scatter) works and
    reaches a similar loss to the dense path."""
    pts = synthetic_scene(500)
    cam, views = target_views()
    losses = {}
    for name, extra in (('dense', {}), ('compact', {'visible_capacity': 512})):
        cfg = small_cfg(iterations=60, update_from=20, update_interval=25,
                        update_until=55, **extra)
        model, vs = init_model(jax.random.PRNGKey(3), pts, cfg)
        if name == 'compact':
            assert model.state.capacity > cfg.visible_capacity
        tr = Trainer(model, cfg, cam.intrinsics, vs)
        tr.run(views, log_every=10)
        assert all(np.isfinite(r['loss']) for r in tr.history)
        losses[name] = tr.history[-1]['loss']
    # both converge into the same ballpark (not bit-identical: the
    # compacted rate-loss subsample draws different randoms)
    assert losses['compact'] < losses['dense'] * 1.5 + 0.05


def test_adjust_anchor_grow_and_prune():
    cfg = small_cfg()
    pts = synthetic_scene(300)
    model, vs = init_model(jax.random.PRNGKey(2), pts, cfg)
    C, K = model.state.capacity, cfg.n_offsets
    from bloomscene_tpu.train.optim import make_optimizer
    opt = make_optimizer(cfg, 1.0, model)
    opt_state = opt.init(model)

    stats = densify.init_stats(C, K)
    n0 = int(model.state.num_alive())
    # fabricate stats: strong gradients on children of first 50 anchors,
    # zero opacity on the last 50 alive anchors (prune candidates)
    alive_idx = np.where(np.asarray(model.state.alive))[0]
    ga = np.zeros((C, K), np.float32)
    gd = np.zeros((C, K), np.float32)
    ga[alive_idx[:50]] = 0.02 * 21        # avg grad over 21 visits
    gd[alive_idx[:50]] = 21
    oa = np.zeros(C, np.float32)
    ad = np.zeros(C, np.float32)
    oa[alive_idx] = 10.0                  # healthy opacity
    oa[alive_idx[-50:]] = 0.0             # dead opacity -> prune
    ad[alive_idx] = 40.0                  # > update_interval*0.8
    stats = densify.DensifyStats(jnp.asarray(oa), jnp.asarray(ad),
                                 jnp.asarray(ga), jnp.asarray(gd))
    # give the hot anchors spread-out offsets so grown voxels are new
    off = np.array(model.state.offset)
    off[alive_idx[:50]] = np.random.default_rng(0).uniform(
        -40, 40, (50, K, 3))
    model = model._replace(state=model.state._replace(
        offset=jnp.asarray(off),
        scaling_log=model.state.scaling_log))

    m2, stats2, opt2, info = densify.adjust_anchor(
        model, stats, opt_state, cfg, vs, np.random.default_rng(0))
    assert info['n_new'] > 0
    assert info['n_pruned'] == 50
    assert info['n_alive'] == n0 + info['n_new'] - 50
    # stats for changed slots were reset
    assert float(jnp.sum(stats2.anchor_demon)) <= float(jnp.sum(stats.anchor_demon))
    # cov log-scales clamped at 0.05
    assert float(jnp.max(m2.state.scaling_log[:, 3:])) <= 0.05 + 1e-6


def test_device_loop_matches_host_loop_short():
    """device_loop=True runs the SAME step/camera/RNG sequence as the host
    loop; float rounding differs slightly (the scan body fuses
    differently), and Adam's eps=1e-15 amplifies it — so compare a short
    horizon with tolerances calibrated to that drift (measured rel ~7e-4
    after 4 steps)."""
    cfg = small_cfg(iterations=4, start_stat=10 ** 9, update_from=10 ** 9)
    pts = synthetic_scene(250, seed=3)
    cam, views = target_views()
    views = views + views  # >1 camera so the in-graph draw matters

    model, vs = init_model(jax.random.PRNGKey(2), pts, cfg)
    tr_a = Trainer(model, cfg, cam.intrinsics, vs, seed=11)
    m_a = tr_a.run(views, log_every=1)

    model_b, _ = init_model(jax.random.PRNGKey(2), pts, cfg)
    tr_b = Trainer(model_b, cfg, cam.intrinsics, vs, seed=11)
    m_b = tr_b.run(views, log_every=1, device_loop=True, max_chunk=4)

    for la, lb in zip(jax.tree.leaves(m_a), jax.tree.leaves(m_b)):
        a, b = np.asarray(la), np.asarray(lb)
        if a.dtype.kind == 'f':
            np.testing.assert_allclose(a, b, rtol=5e-3, atol=1e-4)
    assert [r['iteration'] for r in tr_a.history] == \
        [r['iteration'] for r in tr_b.history]
    for ra, rb in zip(tr_a.history, tr_b.history):
        np.testing.assert_allclose(ra['loss'], rb['loss'], rtol=1e-4)


def test_device_loop_chunking_events():
    """Chunk boundaries reproduce the host loop's DISCRETE events across
    phase transitions, stat-tracking flips and densification steps: same
    logged iterations, same anchor capacity trajectory, training still
    converges. (Float drift makes long-horizon leaf equality meaningless
    — see the short test above.) Region boundaries sit on max_chunk
    multiples so the scan compiles ONE n_steps shape."""
    cfg = small_cfg(iterations=24, start_stat=4, update_from=4,
                    update_interval=8, update_until=21,
                    noise_from_step=8, context_from_step=17)
    pts = synthetic_scene(250, seed=3)
    cam, views = target_views()
    views = views + views

    caps = {}
    for name, dev in (('host', False), ('scan', True)):
        model, vs = init_model(jax.random.PRNGKey(2), pts, cfg)
        tr = Trainer(model, cfg, cam.intrinsics, vs, seed=11)
        m = tr.run(views, log_every=4, device_loop=dev, max_chunk=4)
        caps[name] = (m.state.capacity,
                      [r['iteration'] for r in tr.history],
                      [r['loss'] for r in tr.history])
    assert caps['host'][0] == caps['scan'][0]      # densify grew identically
    assert caps['host'][1] == caps['scan'][1]      # same logged steps
    np.testing.assert_allclose(caps['host'][2], caps['scan'][2],
                               rtol=0.05)          # same training trajectory
    assert caps['scan'][2][-1] < caps['scan'][2][0]
