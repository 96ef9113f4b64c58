"""Anchor model state: capacity-padded pytrees + initialization.

State layout mirrors the reference GaussianModel tensors
(scene/gaussian_model.py:171-186, 440-479) but as an immutable pytree with a
static capacity and an ``alive`` mask so densification never changes array
shapes (XLA static-shape requirement; SURVEY.md section 7.3 item 2).

Per-anchor state:
- anchor [C, 3]        position (trained; 16-bit quantized on read)
- offset [C, K, 3]     child offsets (trained)
- mask_logit [C, K, 1] learned binary child mask (trained)
- feat [C, F]          anchor feature (trained)
- scaling_log [C, 6]   log-scales: [:3] offset scale, [3:] cov scale (trained)
- rotation [C, 4]      quaternion — created but NOT trained, like the
                       reference (:477); used only by the anchor prefilter
- opacity_raw [C, 1]   inverse-sigmoid opacity — NOT trained (:478)
- alive [C]            bool capacity mask (replaces dynamic cat/prune)
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.knn import knn_mean_sq_dist
from ..ops.quantization import quantize_anchor


def inverse_sigmoid(x):
    return jnp.log(x / (1.0 - x))


def capacity_bucket(n: int, granularity: int = 8192) -> int:
    """Anchor-capacity buckets: multiples of ``granularity`` (power-of-two
    rounding wastes up to 2x decode/projection work; each new bucket costs
    one re-jit)."""
    return max(256, -(-n // granularity) * granularity)


@jax.tree_util.register_pytree_node_class
class AnchorState:
    """Anchor state pytree whose LEAVES are flat 1D arrays.

    TPU HBM tiles the two minor dims of every array to (8, 128): a
    [C, 10, 3] offset buffer pads 68x, [C, 10, 1] masks 204x, [C, 3]
    anchors 42x — with Adam moments that layout OOMs 16G HBM around
    150K anchors. Flat [C*k] leaves pad to the next 1024 elements
    (negligible), so the PERSISTENT buffers (params, grads, moments) are
    tight; the 2D/3D views consumers read (``.anchor`` -> [C, 3], ...)
    are reshape ops that fuse away inside jit. Constructor accepts either
    the view shapes or flat arrays. Reference state layout this mirrors:
    gaussian_model.py:171-186.
    """
    _fields = ('anchor', 'offset', 'mask_logit', 'feat', 'scaling_log',
               'rotation', 'opacity_raw', 'alive')
    # trailing elements per anchor for fixed-width fields
    _widths = {'anchor': 3, 'scaling_log': 6, 'rotation': 4,
               'opacity_raw': 1}

    def __init__(self, anchor, offset, mask_logit, feat, scaling_log,
                 rotation, opacity_raw, alive):
        def flat(x):
            return x.reshape(-1) if getattr(x, 'ndim', 0) > 1 else x
        self._anchor = flat(anchor)
        self._offset = flat(offset)
        self._mask_logit = flat(mask_logit)
        self._feat = flat(feat)
        self._scaling_log = flat(scaling_log)
        self._rotation = flat(rotation)
        self._opacity_raw = flat(opacity_raw)
        self._alive = alive

    # --- pytree protocol ---
    def tree_flatten(self):
        return ((self._anchor, self._offset, self._mask_logit, self._feat,
                 self._scaling_log, self._rotation, self._opacity_raw,
                 self._alive), None)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        obj = cls.__new__(cls)
        (obj._anchor, obj._offset, obj._mask_logit, obj._feat,
         obj._scaling_log, obj._rotation, obj._opacity_raw,
         obj._alive) = leaves
        return obj

    # --- NamedTuple-compatible surface ---
    def _replace(self, **kw):
        vals = {f: getattr(self, '_' + f) for f in self._fields}
        vals.update(kw)
        return AnchorState(**vals)

    def _asdict(self):
        return {f: getattr(self, f) for f in self._fields}

    # --- view accessors (reshapes; fused away under jit) ---
    @property
    def capacity(self) -> int:
        return self._alive.shape[0]

    @property
    def n_offsets(self) -> int:
        return self._offset.size // (self.capacity * 3)

    @property
    def feat_dim(self) -> int:
        return self._feat.size // self.capacity

    def _view(self, name):
        x = getattr(self, '_' + name)
        if getattr(x, 'ndim', None) != 1:
            return x                       # label/placeholder leaf
        if name == 'offset':
            return x.reshape(-1, self.n_offsets, 3)
        if name == 'mask_logit':
            return x.reshape(-1, self.n_offsets, 1)
        if name == 'feat':
            return x.reshape(-1, self.feat_dim)
        return x.reshape(-1, self._widths[name])

    @property
    def anchor(self):
        return self._view('anchor')

    @property
    def offset(self):
        return self._view('offset')

    @property
    def mask_logit(self):
        return self._view('mask_logit')

    @property
    def feat(self):
        return self._view('feat')

    @property
    def scaling_log(self):
        return self._view('scaling_log')

    @property
    def rotation(self):
        return self._view('rotation')

    @property
    def opacity_raw(self):
        return self._view('opacity_raw')

    @property
    def alive(self):
        return self._alive

    def num_alive(self):
        return jnp.sum(self._alive)

    def gather_rows(self, idx, alive) -> "AnchorState":
        """Row-gather every per-anchor field by ``idx`` on the FLAT
        leaves (reshaped [C, k] first). Indexing the 3D views instead
        (e.g. ``state.offset[idx]``) makes XLA materialize the view with
        its (8,128)-padded layout — 68x for [C, 10, 3] — which OOMs HBM
        at multi-million-anchor capacities; the [C, k] row form pads only
        k -> 128. ``alive`` becomes the gathered state's alive mask."""
        C = self.capacity
        vals = {f: getattr(self, '_' + f).reshape(C, -1)[idx]
                for f in self._fields if f != 'alive'}
        return AnchorState(alive=alive, **vals)


class AnchorBounds(NamedTuple):
    """Anchor AABB for quantization/hash normalization
    (gaussian_model.py:157-158, 401-411)."""
    x_min: jnp.ndarray   # [1, 3]
    x_max: jnp.ndarray   # [1, 3]

    @staticmethod
    def initial():
        return AnchorBounds(x_min=jnp.zeros((1, 3)), x_max=jnp.ones((1, 3)))


def update_anchor_bounds(state: AnchorState) -> AnchorBounds:
    """AABB over alive anchors with the reference's 1.2/0.8 margin rule
    (gaussian_model.py:401-411)."""
    big = 1e9
    a = jnp.where(state.alive[:, None], state.anchor, big)
    x_min = jnp.min(a, 0, keepdims=True)
    a = jnp.where(state.alive[:, None], state.anchor, -big)
    x_max = jnp.max(a, 0, keepdims=True)
    x_min = jnp.where(x_min < 0, x_min * 1.2, x_min * 0.8)
    x_max = jnp.where(x_max > 0, x_max * 1.2, x_max * 0.8)
    return AnchorBounds(x_min=x_min, x_max=x_max)


def voxelize_points(points: np.ndarray, voxel_size: float,
                    seed: int = 0) -> np.ndarray:
    """Shuffle + round-to-voxel + unique (gaussian_model.py:435-438)."""
    rng = np.random.default_rng(seed)
    pts = np.array(points)
    rng.shuffle(pts)
    return np.unique(np.round(pts / voxel_size), axis=0) * voxel_size


def adaptive_voxel_size(points: np.ndarray) -> float:
    """Median 3-NN mean-square distance (gaussian_model.py:445-449)."""
    d2 = np.asarray(knn_mean_sq_dist(jnp.asarray(points, jnp.float32)))
    return float(np.quantile(d2, 0.5))


def init_from_points(points: np.ndarray, *, n_offsets: int, feat_dim: int,
                     voxel_size: float = 0.001, capacity: int | None = None,
                     seed: int = 0) -> tuple[AnchorState, float]:
    """create_from_pcd equivalent (gaussian_model.py:440-479).

    Voxelizes the point cloud into anchors, sets offset scales from 3-NN
    distances, zero offsets/features, all-on masks, identity rotations,
    opacity 0.1. Pads to ``capacity`` (default: next power-of-two-ish
    bucket) with dead anchors.
    """
    if voxel_size <= 0:
        voxel_size = adaptive_voxel_size(points)
    pts = voxelize_points(points, voxel_size, seed).astype(np.float32)
    n = pts.shape[0]
    if capacity is None:
        capacity = capacity_bucket(int(n * 1.25))

    d2 = np.asarray(knn_mean_sq_dist(jnp.asarray(pts)))
    scales = np.log(np.sqrt(np.clip(d2, 1e-7, None)))[:, None].repeat(6, 1)

    def pad(x, fill=0.0):
        out = np.full((capacity,) + x.shape[1:], fill, x.dtype)
        out[:n] = x
        return jnp.asarray(out)

    state = AnchorState(
        anchor=pad(pts),
        offset=jnp.zeros((capacity, n_offsets, 3), jnp.float32),
        mask_logit=pad(np.ones((n, n_offsets, 1), np.float32)),
        feat=jnp.zeros((capacity, feat_dim), jnp.float32),
        scaling_log=pad(scales.astype(np.float32)),
        rotation=pad(np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1))),
        opacity_raw=pad(np.full((n, 1), float(inverse_sigmoid(0.1)),
                                np.float32)),
        alive=jnp.asarray(np.arange(capacity) < n),
    )
    return state, voxel_size


# --- activated getters (gaussian_model.py:342-399) ---

def get_scaling(state: AnchorState) -> jnp.ndarray:
    # the exponent clamp is a stability guard only: normal training keeps
    # log-scales in [-10, 0]; unbounded exp is how conflicting objectives
    # overflow to inf and NaN-poison every parameter in one step
    return jnp.exp(jnp.clip(state.scaling_log, -20.0, 10.0))


def get_mask(state: AnchorState) -> jnp.ndarray:
    """STE-binarized child mask in {0,1} (get_mask, :348-353):
    forward (sigmoid > 0.01), straight-through sigmoid gradient."""
    sig = jax.nn.sigmoid(state.mask_logit)
    hard = (sig > 0.01).astype(jnp.float32)
    return sig + jax.lax.stop_gradient(hard - sig)


def get_mask_anchor(state: AnchorState) -> jnp.ndarray:
    """[C] float: anchor alive if any child mask on (:355-364)."""
    m = jax.lax.stop_gradient(get_mask(state))
    return (jnp.sum(m[:, :, 0], axis=1) > 0).astype(jnp.float32)


def get_anchor_quantized(state: AnchorState,
                         bounds: AnchorBounds) -> jnp.ndarray:
    """16-bit quantized anchors with straight-through grads (:394-399)."""
    q, _ = quantize_anchor(state.anchor, bounds.x_min, bounds.x_max)
    return q


def normalize_anchor(anchor: jnp.ndarray, bounds: AnchorBounds):
    """Map to [0,1]^3 for the hash encoder (calc_interp_feat, :413-419)."""
    return (anchor - bounds.x_min) / (bounds.x_max - bounds.x_min)
