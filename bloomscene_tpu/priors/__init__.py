"""Pluggable generative priors: diffusion inpainting + monocular depth.

The reference hard-wires StableDiffusion-2-inpainting (fp16 + DDIM) and
ZoeDepth-N loaded from torch hub (bloomscene.py:73-82, 89-138). Here they
are protocol interfaces with three implementations each:

- Stub*Prior: deterministic, dependency-free — CI and zero-egress
  environments (this container cannot download weights).
- Diffusers/ZoeDepth adapters: lazy imports; used when the weights are
  available locally.

Both operate on numpy HxWx3 float images in [0, 1].
"""
from __future__ import annotations

from typing import Protocol

import numpy as np


class InpaintPrior(Protocol):
    def __call__(self, image: np.ndarray, mask: np.ndarray, prompt: str,
                 negative_prompt: str = "", seed: int = 0,
                 num_steps: int = 50) -> np.ndarray:
        """Fill mask==1 regions of image; returns HxWx3 float [0,1]."""
        ...


class DepthPrior(Protocol):
    def __call__(self, image: np.ndarray) -> np.ndarray:
        """Monocular metric-ish depth; returns HxW float."""
        ...


class StubInpaintPrior:
    """Deterministic inpainting stub: iterative neighborhood diffusion of
    known pixels into the hole + low-frequency noise tied to the seed.
    Good enough to exercise the full progressive pipeline in CI."""

    def __init__(self, iterations: int = 200):
        self.iterations = iterations

    def __call__(self, image, mask, prompt, negative_prompt="", seed=0,
                 num_steps: int = 50):
        from scipy.ndimage import distance_transform_edt, gaussian_filter
        img = np.array(image, np.float32)
        m = np.asarray(mask, np.float32)
        if m.ndim == 3:
            m = m[..., 0]
        hole = m > 0.5
        if not hole.any():
            return np.clip(img, 0, 1)
        # fill with the nearest known pixel, then smooth inside the hole
        idx = distance_transform_edt(hole, return_distances=False,
                                     return_indices=True)
        filled = img[idx[0], idx[1]]
        sm = gaussian_filter(filled, sigma=(9, 9, 0))
        out = np.where(hole[..., None], sm, img)
        # deterministic low-frequency texture so the fill isn't flat
        rng = np.random.default_rng(seed)
        noise = gaussian_filter(
            rng.normal(0, 1, img.shape[:2]).astype(np.float32), 8)
        noise = noise / (np.abs(noise).max() + 1e-8) * 0.05
        out = out + hole[..., None] * noise[..., None]
        return np.clip(out, 0, 1)


class StubDepthPrior:
    """Deterministic monocular-depth stub: smooth base depth + luminance
    modulation (dark pixels slightly farther), in a plausible indoor
    range. Replaces ZoeDepth for CI."""

    def __init__(self, base_depth: float = 2.5, amplitude: float = 0.8):
        self.base = base_depth
        self.amp = amplitude

    def __call__(self, image):
        from scipy.ndimage import gaussian_filter
        img = np.asarray(image, np.float32)
        lum = img.mean(-1)
        H, W = lum.shape
        yy, xx = np.mgrid[0:H, 0:W]
        r = np.sqrt(((xx - W / 2) / W) ** 2 + ((yy - H / 2) / H) ** 2)
        depth = self.base + self.amp * (0.5 - gaussian_filter(lum, 5)) \
            + 0.6 * r
        return np.clip(depth, 0.3, 12.0).astype(np.float32)


class DiffusersInpaintPrior:
    """StableDiffusion-2 inpainting via diffusers (the reference's prior,
    bloomscene.py:73-78, 89-134). Requires local weights."""

    def __init__(self, model_id: str = "stabilityai/stable-diffusion-2-inpainting",
                 device: str = "cpu", dtype=None):
        import torch
        from diffusers import (StableDiffusionInpaintPipeline,
                               DDIMScheduler)
        dtype = dtype or (torch.float16 if device != "cpu"
                          else torch.float32)
        self.pipe = StableDiffusionInpaintPipeline.from_pretrained(
            model_id, torch_dtype=dtype).to(device)
        self.pipe.scheduler = DDIMScheduler.from_config(
            self.pipe.scheduler.config)

    def __call__(self, image, mask, prompt, negative_prompt="", seed=0,
                 num_steps: int = 50):
        import torch
        from PIL import Image
        g = torch.Generator(device=self.pipe.device).manual_seed(seed)
        im = Image.fromarray((np.clip(image, 0, 1) * 255).astype(np.uint8))
        mk = np.asarray(mask)
        if mk.ndim == 3:
            mk = mk[..., 0]
        mk = Image.fromarray((np.clip(mk, 0, 1) * 255).astype(np.uint8))
        out = self.pipe(prompt=prompt, negative_prompt=negative_prompt,
                        image=im, mask_image=mk, generator=g,
                        num_inference_steps=num_steps).images[0]
        return np.asarray(out, np.float32) / 255.0


class ZoeDepthPrior:
    """ZoeDepth-N monocular depth (the reference's prior, bloomscene.py:82,
    ZoeDepth/zoedepth/models/depth_model.py:131). Requires local weights."""

    def __init__(self, repo: str = "isl-org/ZoeDepth", device: str = "cpu"):
        import torch
        self.model = torch.hub.load(repo, "ZoeD_N", pretrained=True)
        self.model = self.model.to(device).eval()

    def __call__(self, image):
        from PIL import Image
        im = Image.fromarray((np.clip(image, 0, 1) * 255).astype(np.uint8))
        return np.asarray(self.model.infer_pil(im), np.float32)
