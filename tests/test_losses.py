"""Loss ports checked against independent torch implementations of the same
formulas (the reference's semantics, re-stated here as the spec)."""
import numpy as np
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from bloomscene_tpu.train import losses


def test_l1():
    a = np.random.default_rng(0).uniform(0, 1, (8, 8, 3)).astype(np.float32)
    b = np.random.default_rng(1).uniform(0, 1, (8, 8, 3)).astype(np.float32)
    assert abs(float(losses.l1_loss(jnp.asarray(a), jnp.asarray(b)))
               - np.abs(a - b).mean()) < 1e-6


def _torch_ssim(img1, img2, window_size=11):
    """Reference SSIM (loss.py:91-134) re-stated in torch, channels-first."""
    from math import exp
    sigma = 1.5
    g = torch.tensor([exp(-(x - window_size // 2) ** 2 / (2 * sigma ** 2))
                      for x in range(window_size)])
    g = (g / g.sum()).unsqueeze(1)
    w2 = g.mm(g.t()).unsqueeze(0).unsqueeze(0)
    c = img1.size(-3)
    window = w2.expand(c, 1, window_size, window_size).contiguous()
    pad = window_size // 2
    mu1 = F.conv2d(img1, window, padding=pad, groups=c)
    mu2 = F.conv2d(img2, window, padding=pad, groups=c)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 ** 2, mu2 ** 2, mu1 * mu2
    # variance clamp matches our documented deviation (losses.py ssim)
    s1 = (F.conv2d(img1 * img1, window, padding=pad, groups=c)
          - mu1_sq).clamp(min=0)
    s2 = (F.conv2d(img2 * img2, window, padding=pad, groups=c)
          - mu2_sq).clamp(min=0)
    s12 = F.conv2d(img1 * img2, window, padding=pad, groups=c) - mu1_mu2
    C1, C2 = 0.01 ** 2, 0.03 ** 2
    m = ((2 * mu1_mu2 + C1) * (2 * s12 + C2)) / \
        ((mu1_sq + mu2_sq + C1) * (s1 + s2 + C2))
    return m.mean()


def test_ssim_matches_torch():
    rng = np.random.default_rng(2)
    a = rng.uniform(0, 1, (32, 32, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.1, a.shape), 0, 1).astype(np.float32)
    ours = float(losses.ssim(jnp.asarray(a), jnp.asarray(b)))
    theirs = float(_torch_ssim(
        torch.tensor(a).permute(2, 0, 1).unsqueeze(0),
        torch.tensor(b).permute(2, 0, 1).unsqueeze(0)))
    assert abs(ours - theirs) < 1e-5
    assert abs(float(losses.ssim(jnp.asarray(a), jnp.asarray(a))) - 1.0) < 1e-5


def test_cmd_matches_torch():
    rng = np.random.default_rng(3)
    x1 = rng.uniform(0, 1, (1, 16, 16)).astype(np.float32)
    x2 = rng.uniform(0, 1, (1, 1, 16, 16)).astype(np.float32)

    # torch restatement of CMD.forward (loss.py:26-60)
    tx1, tx2 = torch.tensor(x1), torch.tensor(x2)
    mx1, mx2 = tx1.mean(0), tx2.mean(0)
    sx1, sx2 = tx1 - mx1, tx2 - mx2

    def matchnorm(a, b):
        power = torch.clamp(torch.pow(torch.abs(a - b) + 1e-6, 2), max=1e6)
        return torch.sqrt(torch.clamp(power.sum(), max=1e6) + 1e-6)

    scms = matchnorm(mx1, mx2)
    for k in range(2, 6):
        ss1 = torch.mean(torch.pow(torch.abs(sx1) + 1e-6, k), 0)
        ss2 = torch.mean(torch.pow(torch.abs(sx2) + 1e-6, k), 0)
        scms = scms + matchnorm(ss1, ss2)
    expected = float(scms / x1.shape[0])

    ours = float(losses.cmd(jnp.asarray(x1), jnp.asarray(x2)))
    assert abs(ours - expected) < 1e-4


def test_cmd_normalized_is_resolution_independent():
    """normalized=True replaces the L2 sums with RMS norms: for a batch
    of 1 (the training shapes) the value equals the raw-CMD value divided
    by sqrt(numel), so its scale no longer grows with resolution and stays
    commensurate with L1/SSIM (losses.py cmd docstring)."""
    rng = np.random.default_rng(7)
    vals = {}
    for n in (16, 64):
        x1 = rng.uniform(0, 1, (1, n, n)).astype(np.float32)
        x2 = rng.uniform(0, 1, (1, 1, n, n)).astype(np.float32)
        raw = float(losses.cmd(jnp.asarray(x1), jnp.asarray(x2)))
        norm = float(losses.cmd(jnp.asarray(x1), jnp.asarray(x2),
                                normalized=True))
        # (loose: the 1e-6 eps inside sqrt scales differently per mode)
        assert abs(norm - raw / n) < 0.01
        vals[n] = (raw, norm)
    # raw CMD grows ~linearly with side length; normalized stays flat
    assert vals[64][0] > 3.0 * vals[16][0]
    assert abs(vals[64][1] - vals[16][1]) < 0.1
    # and the normalized value is O(rms diff), i.e. same ballpark as L1
    assert vals[64][1] < 1.0


def test_bilateral_smoothness_zero_for_constant():
    d = jnp.full((16, 16), 2.0)
    assert float(losses.bilateral_smoothness(d)) < 1e-10


def test_bilateral_matches_torch():
    rng = np.random.default_rng(4)
    d = rng.uniform(0, 1, (16, 16)).astype(np.float32)

    # torch restatement of bilateral_filter (loss.py:63-80)
    depth = torch.tensor(d).unsqueeze(0)
    ss, cs, k = 2.0, 5.0, 5
    x = torch.arange(k, dtype=torch.float32) - k // 2
    y = x.unsqueeze(0).expand(k, k)
    spatial = torch.exp(-(y ** 2 + y.t() ** 2) / (2 * ss ** 2))
    spatial = spatial / spatial.sum()
    dp = F.pad(depth, (k // 2,) * 4, mode='replicate').unsqueeze(1)
    unf = F.unfold(dp, kernel_size=k).view(1, 1, k, k, 16, 16)
    unf = unf.permute(0, 4, 5, 1, 2, 3).squeeze(3)
    diff = depth.unsqueeze(3).unsqueeze(4) - unf
    ck = torch.exp(-diff.abs() / (2 * cs ** 2))
    expected = float((spatial * ck * diff ** 2).sum(dim=(3, 4)).mean())

    ours = float(losses.bilateral_smoothness(jnp.asarray(d),
                                             color_sigma=cs))
    assert abs(ours - expected) / max(expected, 1e-9) < 1e-4


def test_huber_l1_matches_torch():
    rng = np.random.default_rng(5)
    H = W = 16
    pred = rng.uniform(0, 1, (H, W)).astype(np.float32)
    gt = rng.uniform(0, 1, (H, W)).astype(np.float32)
    rgb = rng.uniform(0, 1, (H, W, 3)).astype(np.float32)

    # torch restatement of HuberL1.forward (loss.py:170-202), generalized HxW
    tp, tg = torch.tensor(pred), torch.tensor(gt)
    trgb = torch.tensor(rgb).unsqueeze(0)                 # [1, H, W, 3]
    l1 = (tp - tg).abs()
    dd = 0.2 * l1.max()
    loss = ((tp - tg) ** 2 + dd ** 2) / (2 * dd)
    loss[l1 >= dd] = l1[l1 >= dd]
    gx = torch.mean((trgb[..., :, :-1, :] - trgb[..., :, 1:, :]).abs(), -1,
                    keepdim=True)
    gy = torch.mean((trgb[..., :-1, :, :] - trgb[..., 1:, :, :]).abs(), -1,
                    keepdim=True)
    lo = loss.reshape(H, W).unsqueeze(0).unsqueeze(-1)
    lx = torch.exp(-gx) * lo[..., :, :-1, :]
    ly = torch.exp(-gy) * lo[..., :-1, :, :]
    expected = float(lx.mean() + ly.mean())

    ours = float(losses.huber_l1_edge_aware(
        jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(rgb)))
    assert abs(ours - expected) / max(expected, 1e-9) < 1e-4


def test_minmax_normalize():
    x = jnp.asarray([[1.0, 3.0], [2.0, 5.0]])
    out = losses.minmax_normalize(x)
    assert abs(float(out.min())) < 1e-6
    assert abs(float(out.max()) - 1.0) < 1e-6
