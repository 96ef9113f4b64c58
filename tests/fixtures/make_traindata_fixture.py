"""Regenerate the committed traindata fixture (stub priors, 64px).

Run from the repo root:
    python tests/fixtures/make_traindata_fixture.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..', '..'))

from bloomscene_tpu.config import CameraConfig
from bloomscene_tpu.pipeline import pcdgen
from bloomscene_tpu.pipeline.bloomscene import _save_traindata
from bloomscene_tpu.priors import StubDepthPrior, StubInpaintPrior


def main():
    rng = np.random.default_rng(11)
    res = 64
    yy, xx = np.mgrid[0:res, 0:res] / res
    rgb = np.stack([0.5 + 0.4 * np.sin(7 * xx),
                    0.5 + 0.4 * np.cos(5 * yy + 1),
                    0.5 + 0.3 * np.sin(4 * (xx + yy))], -1)
    rgb = np.clip(rgb + rng.normal(0, 0.02, rgb.shape), 0,
                  1).astype(np.float32)
    cam = CameraConfig(H=res, W=res, focal=(72.8, 72.8))
    td = pcdgen.generate_pcd(rgb, 'fixture scene', '', 'rotate360', seed=0,
                             diff_steps=1, cam=cam,
                             inpaint=StubInpaintPrior(),
                             depth_prior=StubDepthPrior())
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       'traindata_stub_64.npz')
    # images/depths stored f16 to keep the committed fixture small
    td['frames'] = [dict(f, image=f['image'].astype(np.float16),
                         depth=f['depth'].astype(np.float16))
                    for f in td['frames']]
    td['pcd_points'] = td['pcd_points'].astype(np.float16)
    td['pcd_colors'] = td['pcd_colors'].astype(np.float16)
    _save_traindata(out, td)
    print(out, os.path.getsize(out) / 1e6, 'MB')


if __name__ == '__main__':
    main()
