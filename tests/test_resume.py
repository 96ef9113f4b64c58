"""Trainer checkpoint/resume: deterministic continuation."""
import jax
import jax.numpy as jnp
import numpy as np

from bloomscene_tpu.config import GSConfig
from bloomscene_tpu.models.model import init_model
from bloomscene_tpu.train.loop import Trainer
from bloomscene_tpu.scene.cameras import camera_from_rt


def setup(seed=0):
    cfg = GSConfig(voxel_size=0.1, iterations=20, start_stat=10 ** 9,
                   update_from=10 ** 9, noise_from_step=10 ** 9,
                   context_from_step=10 ** 9, max_splats_per_tile=3072)
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-0.8, 0.8, (300, 3)).astype(np.float32)
    pts[:, 2] += 2.5
    model, vs = init_model(jax.random.PRNGKey(seed), pts, cfg)
    cam = camera_from_rt(np.eye(3), np.zeros(3), 1.0, 1.0, 32, 32)
    img = jnp.asarray(rng.uniform(0, 1, (32, 32, 3)).astype(np.float32))
    dep = jnp.zeros((32, 32))
    views = [(cam.device_arrays(), img, dep)]
    return cfg, model, vs, cam, views


def test_save_restore_resume_matches_straight_run(tmp_path):
    cfg, model, vs, cam, views = setup()
    # straight 20-iteration run
    tr_a = Trainer(model, cfg, cam.intrinsics, vs, seed=7)
    m_a = tr_a.run(views, iterations=20, log_every=20)

    # 10 iterations, checkpoint, fresh trainer, restore, 10 more
    tr_b = Trainer(model, cfg, cam.intrinsics, vs, seed=7)
    tr_b.run(views, iterations=10, log_every=10)
    ck = str(tmp_path / "trainer.npz")
    tr_b.save(ck)

    tr_c = Trainer(model, cfg, cam.intrinsics, vs, seed=7)
    tr_c.restore(ck)
    assert tr_c.step == 10
    m_c = tr_c.run(views, iterations=20, log_every=20)

    for a, c in zip(jax.tree.leaves(m_a), jax.tree.leaves(m_c)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=1e-6)
