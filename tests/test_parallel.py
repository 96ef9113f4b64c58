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
    model, vs, cam, opt, opt_state = setup
    n_dev = len(jax.devices())
    mesh = make_mesh(n_dev, data=n_dev)
    arrs = cam.device_arrays()
    B = n_dev
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.uniform(0, 1, (64, 64, 3)).astype(np.float32))
    dep = jnp.zeros((64, 64))
    cams = jax.tree.map(lambda x: jnp.stack([x] * B), arrs)
    keys = jnp.stack([jax.random.PRNGKey(5)] * B)

    step = make_dp_train_step(CFG, cam.intrinsics, opt, jnp.zeros(3), mesh,
                              phase=0)
    m_dp, _, loss_dp = step(model, opt_state,
                            shard_batch(cams, mesh),
                            shard_batch(jnp.stack([img] * B), mesh),
                            shard_batch(jnp.stack([dep] * B), mesh),
                            shard_batch(keys, mesh))

    # same-view replicated batch must equal the single-view update
    step1 = make_tile_parallel_train_step(CFG, cam.intrinsics, opt,
                                          jnp.zeros(3),
                                          make_mesh(1, data=1), phase=0)
    m_1, _, loss_1 = step1(model, opt_state, arrs, img, dep,
                           jax.random.PRNGKey(5))
    np.testing.assert_allclose(float(loss_dp), float(loss_1), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(m_dp), jax.tree.leaves(m_1)):
        if jnp.issubdtype(a.dtype, jnp.floating):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5, rtol=1e-4)


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
