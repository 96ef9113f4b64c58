"""Training losses — jnp ports of reference utils/loss.py.

- l1 / l2 (loss.py:83-88)
- SSIM with an 11x11 sigma=1.5 gaussian window (loss.py:91-134)
- CMD central-moment discrepancy, 5 moments (loss.py:26-60)
- bilateral depth smoothness (loss.py:63-80)
- HuberL1 edge-aware depth loss (loss.py:170-202), generalized from the
  hardcoded 512x512 reshape (loss.py:194) to any H, W
- sobel edge mask as the canny stand-in (image2canny, loss.py:138-142, uses
  cv2 on host; the in-graph variant here is a sobel threshold)

Images here are [H, W, 3] and depths [H, W] (channels-last, TPU-friendly);
the reference uses channels-first.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def l1_loss(x, y):
    return jnp.mean(jnp.abs(x - y))


def l2_loss(x, y):
    return jnp.mean((x - y) ** 2)


@functools.lru_cache(maxsize=4)
def _gaussian_window(window_size: int = 11, sigma: float = 1.5):
    # cache plain numpy — caching a jnp array created inside a jit trace
    # would leak a tracer across calls
    g = np.exp(-((np.arange(window_size) - window_size // 2) ** 2)
               / (2 * sigma ** 2))
    g = g / g.sum()
    return np.outer(g, g).astype(np.float32)


def _depthwise_conv(img, window):
    """img [H, W, C], window [k, k] numpy -> same-padded depthwise conv."""
    k = window.shape[0]
    c = img.shape[-1]
    x = img[None].transpose(0, 3, 1, 2)                   # [1, C, H, W]
    w = jnp.broadcast_to(jnp.asarray(window), (c, 1, k, k))
    out = jax.lax.conv_general_dilated(
        x, w, (1, 1), 'SAME', feature_group_count=c,
        dimension_numbers=('NCHW', 'OIHW', 'NCHW'))
    return out[0].transpose(1, 2, 0)                      # [H, W, C]


def ssim(img1, img2, window_size: int = 11):
    """Mean SSIM; matches reference zero-padded conv formulation."""
    w = _gaussian_window(window_size)
    mu1 = _depthwise_conv(img1, w)
    mu2 = _depthwise_conv(img2, w)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    # documented deviation from the reference: clamp the windowed variance
    # estimates at zero — zero-padding makes them go negative near borders,
    # which lets the SSIM map exceed 1 and ill-conditions the denominators
    sigma1_sq = jnp.maximum(_depthwise_conv(img1 * img1, w) - mu1_sq, 0.0)
    sigma2_sq = jnp.maximum(_depthwise_conv(img2 * img2, w) - mu2_sq, 0.0)
    sigma12 = _depthwise_conv(img1 * img2, w) - mu1_mu2
    C1, C2 = 0.01 ** 2, 0.03 ** 2
    ssim_map = (((2 * mu1_mu2 + C1) * (2 * sigma12 + C2))
                / ((mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2)))
    return jnp.mean(ssim_map)


def _matchnorm(x1, x2, normalized: bool = False):
    power = jnp.minimum((jnp.abs(x1 - x2) + 1e-6) ** 2, 1e6)
    if normalized:
        # RMS instead of the reference's raw L2 sum — see cmd() docstring
        return jnp.sqrt(jnp.mean(power) + 1e-6)
    summed = jnp.minimum(jnp.sum(power), 1e6)
    return jnp.sqrt(summed + 1e-6)


def cmd(x1, x2, n_moments: int = 5, normalized: bool = False):
    """Central moment discrepancy between leading-axis batches.

    ``normalized=False`` reproduces the reference exactly (loss.py:26-60):
    the moment-difference norm is an UN-normalized L2 sum over all pixels,
    so on a 512x512 depth map the value (and its gradient-norm) is ~500x
    a mean-based loss. The reference can afford that because its
    rasterizer's depth backward is disabled (backward.cu:539-554) — the
    CMD term never produces parameter gradients there. This build
    implements the full depth backward (BASELINE.json north star), so
    reference scaling lets dep_domin swamp the RGB loss by ~50x and
    training oscillates (measured: RUN_r03 loss_dep_domin 8-23 vs
    loss_rgb 0.2-0.35, final PSNR 10.4; with DPR off, 20.8 — DPR_AB.json).
    ``normalized=True`` replaces each L2 sum with an RMS (mean-based)
    norm, making the loss scale resolution-independent and commensurate
    with L1/SSIM; use it whenever depth gradients actually flow.
    """
    x1 = jnp.clip(x1, -1e6, 1e6)
    x2 = jnp.clip(x2, -1e6, 1e6)
    mx1 = jnp.mean(x1, 0)
    mx2 = jnp.mean(x2, 0)
    sx1 = x1 - mx1
    sx2 = x2 - mx2
    scms = _matchnorm(mx1, mx2, normalized)
    for k in range(2, n_moments + 1):
        ss1 = jnp.mean((jnp.abs(sx1) + 1e-6) ** k, 0)
        ss2 = jnp.mean((jnp.abs(sx2) + 1e-6) ** k, 0)
        scms = scms + _matchnorm(ss1, ss2, normalized)
    return scms / x1.shape[0]


def bilateral_smoothness(depth, spatial_sigma: float = 2.0,
                         color_sigma: float = 5.0, kernel_size: int = 5):
    """Edge-preserving depth smoothness (bilateral_filter, loss.py:63-80).

    ``depth`` is [H, W]; replicate-padded 5x5 neighborhoods, gaussian
    spatial kernel, exponential range kernel on |depth difference|.
    """
    k = kernel_size
    half = k // 2
    x = jnp.arange(k, dtype=jnp.float32) - half
    spatial = jnp.exp(-(x[None, :] ** 2 + x[:, None] ** 2)
                      / (2 * spatial_sigma ** 2))
    spatial = spatial / jnp.sum(spatial)

    dpad = jnp.pad(depth, half, mode='edge')
    H, W = depth.shape
    # neighborhoods via shifted slices (static unroll of k*k shifts)
    loss = jnp.zeros(())
    for dy in range(k):
        for dx in range(k):
            nb = jax.lax.dynamic_slice(dpad, (dy, dx), (H, W))
            diff = depth - nb
            color_k = jnp.exp(-jnp.abs(diff) / (2 * color_sigma ** 2))
            loss = loss + jnp.mean(spatial[dy, dx] * color_k * diff * diff)
    return loss


def huber_l1_edge_aware(pred_depth, gt_depth, rgb, thresh: float = 0.2):
    """Edge-aware HuberL1 (loss.py:170-202): huber on depth with the cutoff
    at thresh*max|err|, weighted by exp(-|rgb gradient|), summed over x/y
    neighbor directions. ``pred_depth``/``gt_depth`` [H, W], rgb [H, W, 3]."""
    l1 = jnp.abs(pred_depth - gt_depth)
    d = thresh * jnp.max(l1)
    d = jnp.maximum(d, 1e-12)
    huber = ((pred_depth - gt_depth) ** 2 + d * d) / (2 * d)
    loss = jnp.where(l1 >= d, l1, huber)                  # [H, W]

    grad_x = jnp.mean(jnp.abs(rgb[:, :-1, :] - rgb[:, 1:, :]), -1)  # [H,W-1]
    grad_y = jnp.mean(jnp.abs(rgb[:-1, :, :] - rgb[1:, :, :]), -1)  # [H-1,W]
    loss_x = jnp.exp(-grad_x) * loss[:, :-1]
    loss_y = jnp.exp(-grad_y) * loss[:-1, :]
    return jnp.mean(loss_x) + jnp.mean(loss_y)


def minmax_normalize(x, eps: float = 1e-8):
    """The reference's depth pre-normalization (bloomscene.py:298-305)."""
    return (x - jnp.min(x)) / (jnp.max(x) - jnp.min(x) + eps)


def sobel_edge_mask(image, threshold: float = 0.1, edge_is_one: bool = True):
    """In-graph stand-in for image2canny (loss.py:138-142). [H, W, 3] ->
    [H, W] float mask."""
    gray = jnp.mean(image, -1)
    gx = jnp.zeros_like(gray).at[:, 1:-1].set(gray[:, 2:] - gray[:, :-2])
    gy = jnp.zeros_like(gray).at[1:-1, :].set(gray[2:, :] - gray[:-2, :])
    mag = jnp.sqrt(gx * gx + gy * gy)
    edge = (mag > threshold).astype(jnp.float32)
    return edge if edge_is_one else 1.0 - edge
