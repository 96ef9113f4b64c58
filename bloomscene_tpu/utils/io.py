"""Scene IO: PLY point clouds / anchor snapshots, checkpoints, video.

Replaces the reference's open3d PLY write (bloomscene.py:585-588), plyfile
anchor snapshots (gaussian_model.py:617-700), torch state-dict MLP
checkpoints (:954-987), and imageio video writing (bloomscene.py:174-219)
with dependency-light equivalents (hand-rolled binary PLY, npz pytree
checkpoints, imageio mp4 when available).
"""
from __future__ import annotations

import json
import os
import struct
from typing import Optional

import jax
import numpy as np


# ---------------- PLY ----------------

def save_ply_pointcloud(path: str, points: np.ndarray,
                        colors: Optional[np.ndarray] = None) -> None:
    """Binary little-endian PLY with xyz (+ rgb)."""
    points = np.asarray(points, np.float32)
    n = points.shape[0]
    os.makedirs(os.path.dirname(path) or '.', exist_ok=True)
    props = ["property float x", "property float y", "property float z"]
    if colors is not None:
        props += ["property uchar red", "property uchar green",
                  "property uchar blue"]
    header = ("ply\nformat binary_little_endian 1.0\n"
              f"element vertex {n}\n" + "\n".join(props)
              + "\nend_header\n")
    with open(path, 'wb') as f:
        f.write(header.encode())
        if colors is None:
            f.write(points.astype('<f4').tobytes())
        else:
            c8 = (np.clip(colors, 0, 1) * 255).astype(np.uint8)
            rec = np.zeros(n, dtype=[('x', '<f4'), ('y', '<f4'),
                                     ('z', '<f4'), ('r', 'u1'),
                                     ('g', 'u1'), ('b', 'u1')])
            rec['x'], rec['y'], rec['z'] = points.T
            rec['r'], rec['g'], rec['b'] = c8.T
            f.write(rec.tobytes())


def load_ply_pointcloud(path: str):
    """Reads the PLYs written above (+ ascii xyz/rgb). Returns (pts, rgb)."""
    with open(path, 'rb') as f:
        header = b""
        while not header.endswith(b"end_header\n"):
            header += f.readline()
        lines = header.decode().splitlines()
        n = next(int(l.split()[-1]) for l in lines
                 if l.startswith("element vertex"))
        props = [l.split()[-1] for l in lines if l.startswith("property")]
        has_rgb = "red" in props
        fmt = [('x', '<f4'), ('y', '<f4'), ('z', '<f4')]
        if has_rgb:
            fmt += [('r', 'u1'), ('g', 'u1'), ('b', 'u1')]
        rec = np.frombuffer(f.read(), dtype=np.dtype(fmt), count=n)
    pts = np.stack([rec['x'], rec['y'], rec['z']], -1)
    rgb = (np.stack([rec['r'], rec['g'], rec['b']], -1) / 255.0
           if has_rgb else None)
    return pts, rgb


def save_anchor_ply(path: str, state) -> None:
    """Anchor snapshot as PLY vertex properties (save_ply equivalent,
    gaussian_model.py:632-650): x y z, f_offset_*, f_anchor_feat_*,
    f_mask_*, scale_*, rot_*, opacity — alive anchors only."""
    import numpy as np
    alive = np.asarray(state.alive)
    anchor = np.asarray(state.anchor)[alive]
    offset = np.asarray(state.offset)[alive].reshape(anchor.shape[0], -1)
    mask = np.asarray(state.mask_logit)[alive].reshape(anchor.shape[0], -1)
    feat = np.asarray(state.feat)[alive]
    scaling = np.asarray(state.scaling_log)[alive]
    rot = np.asarray(state.rotation)[alive]
    opac = np.asarray(state.opacity_raw)[alive]
    cols = {'x': anchor[:, 0], 'y': anchor[:, 1], 'z': anchor[:, 2]}
    for i in range(offset.shape[1]):
        cols[f'f_offset_{i}'] = offset[:, i]
    for i in range(mask.shape[1]):
        cols[f'f_mask_{i}'] = mask[:, i]
    for i in range(feat.shape[1]):
        cols[f'f_anchor_feat_{i}'] = feat[:, i]
    for i in range(scaling.shape[1]):
        cols[f'scale_{i}'] = scaling[:, i]
    for i in range(rot.shape[1]):
        cols[f'rot_{i}'] = rot[:, i]
    cols['opacity'] = opac[:, 0]
    n = anchor.shape[0]
    os.makedirs(os.path.dirname(path) or '.', exist_ok=True)
    names = list(cols)
    header = ("ply\nformat binary_little_endian 1.0\n"
              f"element vertex {n}\n"
              + "\n".join(f"property float {c}" for c in names)
              + "\nend_header\n")
    rec = np.zeros(n, dtype=[(c, '<f4') for c in names])
    for c in names:
        rec[c] = cols[c].astype(np.float32)
    with open(path, 'wb') as f:
        f.write(header.encode())
        f.write(rec.tobytes())


def load_anchor_ply(path: str, n_offsets: int, feat_dim: int,
                    capacity: Optional[int] = None):
    """Inverse of save_anchor_ply -> AnchorState (capacity-padded)."""
    from ..models.anchors import AnchorState
    import jax.numpy as jnp
    with open(path, 'rb') as f:
        header = b""
        while not header.endswith(b"end_header\n"):
            header += f.readline()
        lines = header.decode().splitlines()
        n = next(int(l.split()[-1]) for l in lines
                 if l.startswith("element vertex"))
        names = [l.split()[-1] for l in lines if l.startswith("property")]
        rec = np.frombuffer(f.read(), dtype=np.dtype(
            [(c, '<f4') for c in names]), count=n)

    def grab(prefix, d):
        return np.stack([rec[f'{prefix}_{i}'] for i in range(d)], -1)

    anchor = np.stack([rec['x'], rec['y'], rec['z']], -1)
    offset = grab('f_offset', 3 * n_offsets).reshape(n, n_offsets, 3)
    mask = grab('f_mask', n_offsets).reshape(n, n_offsets, 1)
    feat = grab('f_anchor_feat', feat_dim)
    scaling = grab('scale', 6)
    rot = grab('rot', 4)
    opac = rec['opacity'][:, None]
    cap = capacity or max(64, int(2 ** np.ceil(np.log2(n * 1.5))))

    def pad(a):
        out = np.zeros((cap,) + a.shape[1:], np.float32)
        out[:n] = a
        return jnp.asarray(out)

    return AnchorState(anchor=pad(anchor), offset=pad(offset),
                       mask_logit=pad(mask), feat=pad(feat),
                       scaling_log=pad(scaling), rotation=pad(rot),
                       opacity_raw=pad(opac),
                       alive=jnp.asarray(np.arange(cap) < n))


# ---------------- checkpoints ----------------

def save_checkpoint(path: str, pytree, meta: Optional[dict] = None) -> None:
    """Flat npz checkpoint of any pytree (MLPs + hash grids + bounds —
    save_mlp_checkpoints equivalent, gaussian_model.py:954-975)."""
    os.makedirs(os.path.dirname(path) or '.', exist_ok=True)
    leaves, treedef = jax.tree.flatten(pytree)
    arrays = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    arrays["__treedef__"] = np.frombuffer(
        json.dumps({'meta': meta or {}, 'repr': str(treedef)}).encode(),
        dtype=np.uint8)
    np.savez(path, **arrays)


def load_checkpoint(path: str, like_pytree):
    """Restore into the structure of ``like_pytree``."""
    import jax.numpy as jnp
    data = np.load(path if path.endswith('.npz') else path + '.npz',
                   allow_pickle=False)
    leaves, treedef = jax.tree.flatten(like_pytree)
    new_leaves = [jnp.asarray(data[f"leaf_{i}"])
                  for i in range(len(leaves))]
    return jax.tree.unflatten(treedef, new_leaves)


# ---------------- video ----------------

def write_video(path: str, frames, fps: int = 30) -> bool:
    """mp4 via imageio when available; falls back to PNG frames dir."""
    frames8 = [np.asarray(np.clip(f, 0, 1) * 255, np.uint8) for f in frames]
    try:
        import imageio.v2 as imageio
        os.makedirs(os.path.dirname(path) or '.', exist_ok=True)
        imageio.mimwrite(path, frames8, fps=fps,
                         quality=8, macro_block_size=1)
        return True
    except Exception:
        d = os.path.splitext(path)[0]
        os.makedirs(d, exist_ok=True)
        try:
            import imageio.v2 as imageio
            for i, fr in enumerate(frames8):
                imageio.imwrite(os.path.join(d, f"{i:04d}.png"), fr)
            return True
        except Exception:
            return False
