"""SH color path: parity with the reference CUDA formulas (restated in
torch as the spec) + analytic-gradient checks vs finite differences,
including the clamp mask and the direction-normalization chain to means
(forward.cu:20-72, backward.cu:20-142)."""
import jax
import jax.numpy as jnp
import numpy as np
import torch

from bloomscene_tpu.ops import sh


def _torch_eval_sh(deg, coeffs, means, campos):
    """computeColorFromSH restated in torch (forward.cu:20-72)."""
    C0 = 0.28209479177387814
    C1 = 0.4886025119029199
    C2 = [1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
          -1.0925484305920792, 0.5462742152960396]
    C3 = [-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
          0.3731763325901154, -0.4570457994644658, 1.445305721320277,
          -0.5900435899266435]
    d = means - campos[None]
    dir = d / d.norm(dim=-1, keepdim=True)
    x, y, z = dir[:, 0:1], dir[:, 1:2], dir[:, 2:3]
    res = C0 * coeffs[:, 0]
    if deg > 0:
        res = res - C1 * y * coeffs[:, 1] + C1 * z * coeffs[:, 2] \
            - C1 * x * coeffs[:, 3]
    if deg > 1:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        res = (res + C2[0] * xy * coeffs[:, 4] + C2[1] * yz * coeffs[:, 5]
               + C2[2] * (2 * zz - xx - yy) * coeffs[:, 6]
               + C2[3] * xz * coeffs[:, 7] + C2[4] * (xx - yy) * coeffs[:, 8])
    if deg > 2:
        res = (res + C3[0] * y * (3 * xx - yy) * coeffs[:, 9]
               + C3[1] * xy * z * coeffs[:, 10]
               + C3[2] * y * (4 * zz - xx - yy) * coeffs[:, 11]
               + C3[3] * z * (2 * zz - 3 * xx - 3 * yy) * coeffs[:, 12]
               + C3[4] * x * (4 * zz - xx - yy) * coeffs[:, 13]
               + C3[5] * z * (xx - yy) * coeffs[:, 14]
               + C3[6] * x * (xx - 3 * yy) * coeffs[:, 15])
    res = res + 0.5
    return torch.clamp(res, min=0.0)


def _random_inputs(rng, n=64, m=16):
    coeffs = rng.normal(0, 0.5, (n, m, 3)).astype(np.float32)
    means = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    means[:, 2] += 4.0
    campos = np.array([0.1, -0.2, 0.05], np.float32)
    return coeffs, means, campos


def test_eval_sh_matches_reference_formula_all_degrees():
    rng = np.random.default_rng(0)
    coeffs, means, campos = _random_inputs(rng)
    for deg in range(4):
        ours = np.asarray(sh.eval_sh(deg, jnp.asarray(coeffs),
                                     jnp.asarray(means),
                                     jnp.asarray(campos)))
        theirs = _torch_eval_sh(deg, torch.tensor(coeffs),
                                torch.tensor(means),
                                torch.tensor(campos)).numpy()
        np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)


def test_eval_sh_grads_match_torch_autograd():
    """Grads to BOTH coeffs and means equal the torch-autograd gradients
    of the same formula (which equal the hand-derived backward.cu chain,
    clamp mask and dnormvdv included)."""
    rng = np.random.default_rng(1)
    coeffs, means, campos = _random_inputs(rng, n=48)
    # bias coeffs so a healthy fraction of channels clamps below zero
    coeffs[:, 0] -= 1.2

    def loss_j(c, mn):
        out = sh.eval_sh(3, c, mn, jnp.asarray(campos))
        return jnp.sum(out * out) + jnp.sum(out)

    gj_c, gj_m = jax.grad(loss_j, argnums=(0, 1))(
        jnp.asarray(coeffs), jnp.asarray(means))

    tc = torch.tensor(coeffs, requires_grad=True)
    tm = torch.tensor(means, requires_grad=True)
    out = _torch_eval_sh(3, tc, tm, torch.tensor(campos))
    (torch.sum(out * out) + torch.sum(out)).backward()

    # some channels must actually be clamped for this test to bite
    clamped = np.asarray(sh.sh_clamp_mask(3, jnp.asarray(coeffs),
                                          jnp.asarray(means),
                                          jnp.asarray(campos)))
    assert clamped.any() and not clamped.all()
    np.testing.assert_allclose(np.asarray(gj_c), tc.grad.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gj_m), tm.grad.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_eval_sh_grads_match_finite_differences():
    rng = np.random.default_rng(2)
    coeffs, means, campos = _random_inputs(rng, n=6)
    w = jnp.asarray(rng.normal(0, 1, (6, 3)).astype(np.float32))

    def loss(c, mn):
        return jnp.sum(sh.eval_sh(2, c, mn, jnp.asarray(campos)) * w)

    g_c, g_m = jax.grad(loss, argnums=(0, 1))(
        jnp.asarray(coeffs), jnp.asarray(means))
    eps = 1e-3
    for arr, g, name in ((coeffs, np.asarray(g_c), 'coeffs'),
                         (means, np.asarray(g_m), 'means')):
        flat = arr.reshape(-1)
        for i in rng.choice(flat.size, 12, replace=False):
            p = flat.copy()
            p[i] += eps
            q = flat.copy()
            q[i] -= eps
            args_p = [coeffs, means]
            args_q = [coeffs, means]
            k = 0 if name == 'coeffs' else 1
            args_p[k] = p.reshape(arr.shape)
            args_q[k] = q.reshape(arr.shape)
            fd = (float(loss(jnp.asarray(args_p[0]), jnp.asarray(args_p[1])))
                  - float(loss(jnp.asarray(args_q[0]),
                               jnp.asarray(args_q[1])))) / (2 * eps)
            np.testing.assert_allclose(g.reshape(-1)[i], fd, rtol=2e-2,
                                       atol=2e-3)


def test_clamped_channels_get_zero_coeff_grads():
    """backward.cu:29-37 zeroes the color gradient of clamped channels;
    autodiff through max() must reproduce that exactly."""
    rng = np.random.default_rng(3)
    coeffs, means, campos = _random_inputs(rng, n=32)
    coeffs[:, 0] -= 1.5
    clamped = np.asarray(sh.sh_clamp_mask(0, jnp.asarray(coeffs),
                                          jnp.asarray(means),
                                          jnp.asarray(campos)))
    assert clamped.any()

    g = jax.grad(lambda c: jnp.sum(
        sh.eval_sh(0, c, jnp.asarray(means), jnp.asarray(campos))))(
        jnp.asarray(coeffs))
    g0 = np.asarray(g)[:, 0, :]              # only the DC coeff matters
    assert np.all(g0[clamped] == 0.0)
    assert np.all(g0[~clamped] != 0.0)


def test_sh_colors_feed_rasterizer_with_mean_grads():
    """End-to-end: SH colors into the golden rasterizer; gradients reach
    the means through BOTH the SH direction chain and the projection."""
    from bloomscene_tpu.ops import graphics, projection
    from bloomscene_tpu.ops.reference_rasterizer import rasterize_reference

    rng = np.random.default_rng(4)
    n = 32
    means = rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)
    means[:, 2] += 3.0
    coeffs = rng.normal(0, 0.3, (n, 4, 3)).astype(np.float32)
    scales = np.full((n, 3), 0.1, np.float32)
    quats = np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1))
    opac = np.full((n,), 0.8, np.float32)
    viewmat = np.eye(4, dtype=np.float32)
    fov = 1.0
    W = H = 64
    projm = graphics.projection_matrix(0.01, 100.0, fov, fov)
    full = (projm @ viewmat).astype(np.float32)
    campos = jnp.zeros(3)

    def loss(mn, c):
        cov6 = projection.build_cov3d(jnp.asarray(scales), jnp.asarray(quats))
        proj = projection.project_gaussians(
            mn, cov6, jnp.asarray(viewmat), jnp.asarray(full), W, H,
            graphics.fov2focal(fov, W), graphics.fov2focal(fov, H),
            np.tan(fov / 2), np.tan(fov / 2))
        colors = sh.eval_sh(1, c, mn, campos)
        out = rasterize_reference(proj, colors, jnp.asarray(opac),
                                  jnp.zeros(3), W, H)
        return jnp.mean(out.color)

    g_m, g_c = jax.grad(loss, argnums=(0, 1))(
        jnp.asarray(means), jnp.asarray(coeffs))
    assert np.isfinite(np.asarray(g_m)).all()
    assert np.isfinite(np.asarray(g_c)).all()
    assert float(jnp.sum(jnp.abs(g_c))) > 0
    assert float(jnp.sum(jnp.abs(g_m))) > 0


def test_sh_product_path_degree1_beats_degree0():
    """color_mode='sh' through the REAL training loop: on a fixture whose
    color flips with viewpoint (red disc from the left view, blue from
    the right), degree-1 SH must fit substantially tighter than degree-0
    (a view-independent color can only average the two).
    VERDICT r4 item 3: SH in the product path, not just the op."""
    from bloomscene_tpu.config import GSConfig
    from bloomscene_tpu.models.model import init_model
    from bloomscene_tpu.train.loop import Trainer
    from bloomscene_tpu.scene.cameras import camera_from_rt

    def run(sh_degree):
        cfg = GSConfig(voxel_size=0.08, max_splats_per_tile=2048,
                       iterations=150, start_stat=10 ** 9,
                       update_from=10 ** 9, noise_from_step=10 ** 9,
                       context_from_step=10 ** 9,
                       color_mode='sh', sh_degree=sh_degree)
        rng = np.random.default_rng(0)
        n = 600
        th = rng.uniform(0, np.pi, n)
        ph = rng.uniform(0, 2 * np.pi, n)
        pts = np.stack([np.sin(th) * np.cos(ph), np.sin(th) * np.sin(ph),
                        np.cos(th)], -1).astype(np.float32) * 0.6
        center = np.array([0, 0, 2.5], np.float32)
        pts += center

        W = H = 64
        views = []
        cam0 = None
        for ang, col in ((-0.5, [0.9, 0.1, 0.1]), (0.5, [0.1, 0.1, 0.9])):
            c, s = np.cos(ang), np.sin(ang)
            R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
            # camera position orbiting the scene center at radius 2.5,
            # always looking at it (3DGS convention: R is C2W rotation,
            # T the W2C translation)
            p = center - R @ np.array([0, 0, 2.5], np.float32)
            t = -R.T @ p
            cam = camera_from_rt(R, t, 1.0, 1.0, W, H)
            if cam0 is None:
                cam0 = cam
            yy, xx = np.mgrid[0:H, 0:W]
            img = np.zeros((H, W, 3), np.float32)
            img[(xx - W // 2) ** 2 + (yy - H // 2) ** 2 < (W // 3) ** 2] = col
            depth = np.full((H, W), 2.5, np.float32)
            views.append((cam.device_arrays(), jnp.asarray(img),
                          jnp.asarray(depth)))

        model, vs = init_model(jax.random.PRNGKey(0), pts, cfg)
        tr = Trainer(model, cfg, cam0.intrinsics, vs)
        tr.run(views, log_every=50)
        return float(np.mean([h['loss'] for h in tr.history[-2:]]))

    loss0 = run(0)
    loss1 = run(1)
    assert np.isfinite(loss0) and np.isfinite(loss1)
    # degree-1 must beat degree-0 clearly on the view-dependent fixture
    assert loss1 < loss0 * 0.8, (loss0, loss1)
