"""End-to-end pipeline smoke: stub priors -> pcd -> training -> codec."""
import json
import os

import numpy as np
import pytest

from bloomscene_tpu.config import CameraConfig, GSConfig
from bloomscene_tpu.pipeline.bloomscene import BloomScene
from bloomscene_tpu.pipeline import pcdgen
from bloomscene_tpu.priors import StubDepthPrior, StubInpaintPrior
from bloomscene_tpu.scene.trajectory import (get_camera_paths,
                                             get_pcd_gen_poses)


def test_trajectory_shapes():
    poses = get_pcd_gen_poses('rotate360')
    assert poses.shape == (10, 3, 4)
    # rotations are valid
    for p in poses:
        np.testing.assert_allclose(p[:3, :3] @ p[:3, :3].T, np.eye(3),
                                   atol=1e-8)
    hemi = get_pcd_gen_poses('hemisphere', [2.0, 3.0])
    assert hemi.shape == (10, 3, 4)
    paths = get_camera_paths()
    assert len(paths['rotate360']['frames']) == 180


def test_stub_priors_deterministic():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)
    mask = np.zeros((64, 64), np.float32)
    mask[20:40, 20:40] = 1
    ip = StubInpaintPrior()
    out1 = ip(img, mask, "prompt", seed=3)
    out2 = ip(img, mask, "prompt", seed=3)
    np.testing.assert_array_equal(out1, out2)
    # known pixels unchanged
    np.testing.assert_allclose(out1[~(mask > 0.5)], img[~(mask > 0.5)])
    dp = StubDepthPrior()
    d = dp(img)
    assert d.shape == (64, 64) and d.min() > 0


@pytest.fixture(scope="module")
def tiny_cam():
    return CameraConfig(H=64, W=64, focal=(72.8, 72.8))


def test_generate_pcd_stub(tiny_cam):
    rng = np.random.default_rng(1)
    rgb = rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)
    data = pcdgen.generate_pcd(
        rgb, "a room", "", 'rotate360', seed=0, diff_steps=2,
        cam=tiny_cam, inpaint=StubInpaintPrior(),
        depth_prior=StubDepthPrior())
    assert data['pcd_points'].shape[0] == 3
    assert data['pcd_points'].shape[1] == data['pcd_colors'].shape[0]
    assert data['pcd_points'].shape[1] > 64 * 64  # grew beyond view 0
    assert len(data['frames']) > 40              # ~50 supervision frames
    fr = data['frames'][0]
    assert fr['image'].shape == (64, 64, 3)
    assert fr['depth'].shape == (64, 64)
    assert np.isfinite(data['pcd_points']).all()


def test_full_pipeline_smoke(tmp_path, tiny_cam):
    """The whole create() flow at miniature scale."""
    cfg = GSConfig(voxel_size=0.1, iterations=30, start_stat=5,
                   update_from=10 ** 9, noise_from_step=10 ** 9,
                   context_from_step=10 ** 9, max_splats_per_tile=2048)
    rng = np.random.default_rng(2)
    rgb = rng.uniform(0.2, 0.8, (64, 64, 3)).astype(np.float32)
    bs = BloomScene(str(tmp_path / "out"), cfg=cfg, cam=tiny_cam,
                    inpaint_prior=StubInpaintPrior(),
                    depth_prior=StubDepthPrior(), seed=0)
    bs.generate(rgb, "a colorful room", diff_steps=1, verbose=False)
    assert len(bs.scene.train_cameras) > 40
    bs.training(iterations=30, log_every=10)
    assert bs.model is not None
    assert np.isfinite(bs.logs[-1]['loss'])

    sizes = bs.compress()
    assert sizes['total_MB'] > 0
    assert os.path.exists(tmp_path / "out" / "bitstreams" / "meta.json")

    bs.save_outputs()
    assert os.path.exists(tmp_path / "out" / "gsplat.ply")
    assert os.path.exists(tmp_path / "out" / "checkpoint.npz")

    # orbit render (subset of frames for speed)
    bs.scene = bs.scene._replace(preset_cameras={
        'rotate360': bs.scene.preset_cameras['rotate360'][:8]})
    info = bs.render_video('rotate360')
    assert info['n_frames'] == 8
    ev = bs.render_eval("a colorful room")
    assert 'proxy_sharpness' in ev

    # cold start: a FRESH BloomScene rebuilt purely from disk artifacts
    # (checkpoint.npz + bitstreams + gsplat.ply + traindata cache) must
    # render the decoded scene (reference bloomscene.py:411-421)
    bs2 = BloomScene.load(str(tmp_path / "out"), cfg=cfg, cam=tiny_cam)
    assert bs2.decoded_model is not None and bs2.scene is not None
    bs2.scene = bs2.scene._replace(preset_cameras={
        'rotate360': bs2.scene.preset_cameras['rotate360'][:2]})
    info2 = bs2.render_video('rotate360', use_decoded=True)
    assert info2['n_frames'] == 2
    # decoded state reloaded from the bitstream must match the in-memory
    # decoded model bit-for-bit (codec is deterministic)
    np.testing.assert_array_equal(
        np.asarray(bs2.decoded_model.state.anchor),
        np.asarray(bs.decoded_model.state.anchor))


def test_camera_path_json_preset(tmp_path, tiny_cam):
    """Reference-style camera-path jsons load as render presets
    (utils/camera.py:23-51 parity: the file's camera_angle_x wins)."""
    import json
    from bloomscene_tpu.scene.dataset import read_scene_data
    from bloomscene_tpu.scene.trajectory import get_camera_paths

    frames = get_camera_paths()['rotate360']['frames'][:5]
    path = str(tmp_path / "orbit.json")
    with open(path, 'w') as f:
        json.dump({"camera_angle_x": 0.9, "frames": frames}, f)

    rng = np.random.default_rng(1)
    rgb = rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)
    td = pcdgen.generate_pcd(rgb, "x", "", 'rotate360', seed=0,
                             diff_steps=1, cam=tiny_cam,
                             inpaint=StubInpaintPrior(),
                             depth_prior=StubDepthPrior())
    scene = read_scene_data(td, preset_json={'orbit': path})
    assert len(scene.preset_cameras['orbit']) == 5
    cam = scene.preset_cameras['orbit'][0]
    # fov comes from the json (0.9), not the scene fov
    assert abs(cam.intrinsics.fovx - 0.9) < 1e-6


def test_shipped_rotate360_720_frame_preset(tmp_path, tiny_cam):
    """The SHIPPED cameras/rotate360.json (720-frame orbit, the analog of
    the reference's asset consumed by utils/camera.py:23-51) loads as a
    render preset out of the box and renders through the full model."""
    import jax
    from bloomscene_tpu.models.model import init_model
    from bloomscene_tpu.models.render import render
    from bloomscene_tpu.scene.dataset import read_scene_data
    from bloomscene_tpu.scene.trajectory import write_rotate360_json

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    shipped = os.path.join(repo, 'cameras', 'rotate360.json')
    assert os.path.exists(shipped), "cameras/rotate360.json not shipped"
    # the committed asset is exactly what the generator produces
    regen = write_rotate360_json(str(tmp_path / 'r.json'))
    assert json.load(open(shipped)) == regen

    rng = np.random.default_rng(4)
    rgb = rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)
    td = pcdgen.generate_pcd(rgb, "x", "", 'rotate360', seed=0,
                             diff_steps=1, cam=tiny_cam,
                             inpaint=StubInpaintPrior(),
                             depth_prior=StubDepthPrior())
    scene = read_scene_data(td, preset_json={'rotate360_720': shipped})
    cams = scene.preset_cameras['rotate360_720']
    assert len(cams) == 720
    assert abs(cams[0].intrinsics.fovx - 0.8279103882874479) < 1e-9

    cfg = GSConfig(voxel_size=0.1, max_splats_per_tile=256)
    model, _ = init_model(jax.random.PRNGKey(0),
                          np.asarray(td['pcd_points']).T[:500], cfg)
    res = render(model, cams[0].intrinsics, cams[0].device_arrays(), cfg,
                 phase=0, mode='eval')
    assert np.isfinite(np.asarray(res.out.color)).all()


def test_io_roundtrips(tmp_path):
    from bloomscene_tpu.utils import io as io_utils
    rng = np.random.default_rng(0)
    pts = rng.normal(0, 1, (100, 3)).astype(np.float32)
    cols = rng.uniform(0, 1, (100, 3)).astype(np.float32)
    p = str(tmp_path / "pc.ply")
    io_utils.save_ply_pointcloud(p, pts, cols)
    pts2, cols2 = io_utils.load_ply_pointcloud(p)
    np.testing.assert_allclose(pts2, pts, atol=1e-6)
    assert np.abs(cols2 - cols).max() < 1 / 255 + 1e-6

    # anchor state PLY roundtrip
    import jax
    from bloomscene_tpu.models.model import init_model
    cfg = GSConfig(voxel_size=0.1)
    model, _ = init_model(jax.random.PRNGKey(0), pts + [0, 0, 3], cfg)
    ap = str(tmp_path / "anchors.ply")
    io_utils.save_anchor_ply(ap, model.state)
    st2 = io_utils.load_anchor_ply(ap, cfg.n_offsets, cfg.feat_dim)
    n = int(model.state.num_alive())
    assert int(st2.num_alive()) == n
    alive = np.asarray(model.state.alive)
    np.testing.assert_allclose(np.asarray(st2.anchor)[:n],
                               np.asarray(model.state.anchor)[alive],
                               atol=1e-6)

    # checkpoint roundtrip
    ck = {'heads': model.heads, 'grid': model.grid, 'bounds': model.bounds}
    cp = str(tmp_path / "ck.npz")
    io_utils.save_checkpoint(cp, ck)
    ck2 = io_utils.load_checkpoint(cp, ck)
    for a, b in zip(jax.tree.leaves(ck), jax.tree.leaves(ck2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_eval_render_compaction_matches_dense(tmp_path, tiny_cam,
                                              monkeypatch):
    """_render_model's snug visible-compaction + measured pair-capacity
    path must produce the same frames as the dense render through the
    SAME chunked lax.map machinery (lax.map and a direct render() call
    compile with different fusion/rewrites on CPU and differ by ~3e-3,
    so the baseline must share the map; compaction itself is exact).
    Also asserts render()-level invariance to snug pair capacities."""
    import jax.numpy as jnp
    from bloomscene_tpu.pipeline import bloomscene as bs_mod
    from bloomscene_tpu.models.render import (count_pairs,
                                              prefilter_anchors,
                                              render as render_fn)

    cfg = GSConfig(voxel_size=0.1, iterations=20, start_stat=5,
                   update_from=10 ** 9, noise_from_step=10 ** 9,
                   context_from_step=10 ** 9, max_splats_per_tile=2048)
    rng = np.random.default_rng(5)
    rgb = rng.uniform(0.2, 0.8, (64, 64, 3)).astype(np.float32)
    bs = BloomScene(str(tmp_path / "out"), cfg=cfg, cam=tiny_cam,
                    inpaint_prior=StubInpaintPrior(),
                    depth_prior=StubDepthPrior(), seed=0)
    bs.generate(rgb, "a colorful room", diff_steps=1, verbose=False)
    bs.training(iterations=20, log_every=10)
    cams = bs.scene.train_cameras[:3]

    # compacted (tiny granule so the path engages at toy scale)
    monkeypatch.setattr(bs_mod, 'EVAL_VCAP_GRANULE', 64)
    got, _, _ = bs._render_model(bs.model, cams, mode='eval')
    # dense baseline through the SAME machinery (granule > capacity
    # disables compaction; pcap measuring still runs identically)
    monkeypatch.setattr(bs_mod, 'EVAL_VCAP_GRANULE',
                        int(bs.model.state.capacity) * 2)
    want, _, _ = bs._render_model(bs.model, cams, mode='eval')
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, atol=2e-5)

    # render()-level: snug pair/packed capacities are value-invariant
    intr = cams[0].intrinsics
    arrs = cams[0].device_arrays()
    vis = prefilter_anchors(bs.model, intr, arrs)
    mp = int(count_pairs(bs.model, intr, arrs, cfg, mode='eval',
                         visible=vis))
    pcap = max(16384, -(-int(mp * 1.02) // 16384) * 16384)
    res_a = render_fn(bs.model, intr, arrs, cfg, phase=0, mode='eval',
                      visible=vis)
    res_b = render_fn(bs.model, intr, arrs, cfg, phase=0, mode='eval',
                      visible=vis, pair_capacity=pcap,
                      packed_capacity=pcap)
    np.testing.assert_array_equal(np.asarray(res_a.out.color),
                                  np.asarray(res_b.out.color))


def test_training_checkpoint_resume(tmp_path, tiny_cam):
    """BloomScene.training(resume=True, checkpoint_every=N): a fresh
    process restores the trainer checkpoint and continues from its step
    (crash resilience for the full-scale TPU runs)."""
    cfg = GSConfig(voxel_size=0.1, iterations=30, start_stat=5,
                   update_from=10 ** 9, noise_from_step=10 ** 9,
                   context_from_step=10 ** 9, max_splats_per_tile=2048)
    rng = np.random.default_rng(7)
    rgb = rng.uniform(0.2, 0.8, (64, 64, 3)).astype(np.float32)
    bs = BloomScene(str(tmp_path / "out"), cfg=cfg, cam=tiny_cam,
                    inpaint_prior=StubInpaintPrior(),
                    depth_prior=StubDepthPrior(), seed=0)
    bs.generate(rgb, "a room", diff_steps=1, verbose=False)
    bs.training(iterations=20, log_every=10, checkpoint_every=10)
    assert os.path.exists(tmp_path / "out" / "train_ckpt.meta.json")

    # "crashed" process: rebuild from disk, resume to 30
    bs2 = BloomScene(str(tmp_path / "out"), cfg=cfg, cam=tiny_cam,
                     inpaint_prior=StubInpaintPrior(),
                     depth_prior=StubDepthPrior(), seed=0)
    bs2.generate(rgb, "a room", diff_steps=1, verbose=False)  # cache hit
    bs2.training(iterations=30, log_every=10, resume=True)
    assert bs2.trainer.step == 30
    # resumed from 20, not retrained from scratch
    assert bs2.trainer.history[0]['iteration'] > 20
