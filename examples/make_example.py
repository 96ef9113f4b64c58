"""Generate a synthetic example input image (the reference ships photos;
this repo generates one so the pipeline is runnable without assets).

Usage: python examples/make_example.py [out.png]
"""
import sys

import numpy as np


def make_room(size: int = 512) -> np.ndarray:
    """A simple synthetic 'room': floor/wall gradients + furniture boxes."""
    rng = np.random.default_rng(6)
    img = np.zeros((size, size, 3), np.float32)
    yy, xx = np.mgrid[0:size, 0:size] / size
    horizon = 0.55
    wall = np.stack([0.75 - 0.25 * yy, 0.70 - 0.2 * yy, 0.62 - 0.1 * yy], -1)
    floor = np.stack([0.45 + 0.25 * yy, 0.30 + 0.18 * yy,
                      0.20 + 0.12 * yy], -1)
    img = np.where((yy < horizon)[..., None], wall, floor)
    # window
    img[60:180, 80:220] = [0.55, 0.75, 0.95]
    img[60:180, 145:155] = [0.9, 0.9, 0.85]
    img[115:125, 80:220] = [0.9, 0.9, 0.85]
    # rug
    ry, rx = np.mgrid[0:size, 0:size]
    rug = ((rx - 300) ** 2 / 90 ** 2 + (ry - 420) ** 2 / 40 ** 2) < 1
    img[rug] = [0.62, 0.18, 0.2]
    # cabinet
    img[260:380, 330:470] = [0.45, 0.3, 0.18]
    img[268:300, 338:398] = [0.55, 0.38, 0.24]
    img[268:300, 406:462] = [0.55, 0.38, 0.24]
    img += rng.normal(0, 0.012, img.shape)
    return np.clip(img, 0, 1)


if __name__ == '__main__':
    from PIL import Image
    out = sys.argv[1] if len(sys.argv) > 1 else 'examples/room.png'
    Image.fromarray((make_room() * 255).astype(np.uint8)).save(out)
    print('wrote', out)
