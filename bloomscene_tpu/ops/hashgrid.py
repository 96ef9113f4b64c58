"""Multi-resolution hash-grid encoder (HAC variant) in pure JAX.

TPU-native re-design of the reference gridencoder CUDA extension
(submodules/gridencoder/src/gridencoder.cu:100-360 ``kernel_grid``) with the
exact HAC conventions:

- explicit per-level resolution list (no growth factor);
- position mapping ``pos = x * (R - 2) + 0.5`` (gridencoder.cu:183-187);
- corner coords clamped to R-1; corners on the boundary ring (coordinate 0 or
  R-1) are EXCLUDED and the remaining corner weights renormalized
  (zero_flag/wn logic, gridencoder.cu:255-334);
- dense row-major indexing while R^d fits the level's (8-padded) table,
  otherwise XOR-prime fast_hash, then modulo table size
  (gridencoder.cu:45-88);
- inputs outside [0, 1] produce zeros (gridencoder.cu:135-155);
- one flat parameter table per encoder, binarized with STE each forward when
  ``ste_binary`` (utils/encodings.py:417-418).

The backward (scatter-add of corner weights into the table) is plain JAX
autodiff of the gather — XLA lowers it to a deterministic scatter-add, no
atomics. Tables are at most 2^15 * n_features entries, so everything stays
comfortably in VMEM on TPU.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from .quantization import ste_binary

_PRIMES = (1, 2654435761, 805459861, 3674653429, 2097192037, 1434869437,
           2165219737)


def _level_table_size(resolution: int, num_dim: int,
                      log2_hashmap_size: int) -> int:
    max_params = 2 ** log2_hashmap_size
    params = min(max_params, resolution ** num_dim)
    return int(np.ceil(params / 8) * 8)        # 8-padded, encodings.py:384


@dataclasses.dataclass(frozen=True)
class GridSpec:
    """Static configuration of one hash-grid encoder."""
    num_dim: int
    n_features: int
    resolutions: Tuple[int, ...]
    log2_hashmap_size: int
    ste_binary: bool = True

    @property
    def level_sizes(self) -> Tuple[int, ...]:
        return tuple(_level_table_size(r, self.num_dim,
                                       self.log2_hashmap_size)
                     for r in self.resolutions)

    @property
    def offsets(self) -> Tuple[int, ...]:
        offs = [0]
        for s in self.level_sizes:
            offs.append(offs[-1] + s)
        return tuple(offs)

    @property
    def n_params(self) -> int:
        return self.offsets[-1]

    @property
    def output_dim(self) -> int:
        return len(self.resolutions) * self.n_features


def init_grid_params(spec: GridSpec, key, std: float = 1e-4) -> jnp.ndarray:
    """Uniform(-std, std) init (encodings.py:401-403).

    Stored FLAT [n_params * F]: a persistent [n_params, 4] f32 table pads
    32x under TPU (8,128) tiling (and Adam keeps two more copies);
    ``grid_encode`` views it as [n_params, F] on the fly."""
    import jax
    return jax.random.uniform(key, (spec.n_params * spec.n_features,),
                              jnp.float32, -std, std)


def _corner_index(coords: jnp.ndarray, resolution: int, table_size: int,
                  num_dim: int) -> jnp.ndarray:
    """coords [..., d] int32 -> flat table index, dense-or-hash. [...]"""
    dense_fits = resolution ** num_dim <= table_size
    if dense_fits:
        idx = jnp.zeros(coords.shape[:-1], jnp.uint32)
        stride = 1
        for d in range(num_dim):
            idx = idx + coords[..., d].astype(jnp.uint32) * np.uint32(stride)
            stride *= resolution
    else:
        idx = jnp.zeros(coords.shape[:-1], jnp.uint32)
        for d in range(num_dim):
            idx = idx ^ (coords[..., d].astype(jnp.uint32)
                         * np.uint32(_PRIMES[d] % (2 ** 32)))
    return (idx % np.uint32(table_size)).astype(jnp.int32)


def grid_encode(params: jnp.ndarray, x: jnp.ndarray,
                spec: GridSpec) -> jnp.ndarray:
    """Encode x in [0,1]^d -> [N, n_levels * n_features].

    ``params`` is the table (flat [n_params*F] or [n_params, F];
    pre-activation; STE binarization applied here when spec.ste_binary).
    """
    params = params.reshape(-1, spec.n_features)
    emb = ste_binary(params) if spec.ste_binary else params
    n = x.shape[0]
    num_dim = spec.num_dim

    in_bounds = jnp.all((x >= 0.0) & (x <= 1.0), axis=-1)     # [N]

    outs = []
    offsets = spec.offsets
    for li, R in enumerate(spec.resolutions):
        table = emb[offsets[li]:offsets[li + 1]]               # [S, F]
        table_size = spec.level_sizes[li]
        pos = x * (R - 2) + 0.5                                # [N, d]
        pos0 = jnp.floor(pos)
        frac = pos - pos0
        pos0 = pos0.astype(jnp.int32)

        acc = jnp.zeros((n, spec.n_features), jnp.float32)
        wn = jnp.zeros((n, 1), jnp.float32)
        for corner in range(2 ** num_dim):
            w = jnp.ones((n,), jnp.float32)
            coords = []
            for d in range(num_dim):
                if (corner >> d) & 1:
                    w = w * frac[:, d]
                    coords.append(jnp.minimum(pos0[:, d] + 1, R - 1))
                else:
                    w = w * (1.0 - frac[:, d])
                    coords.append(pos0[:, d])
            coords = jnp.stack(coords, -1)                     # [N, d]
            # boundary-ring exclusion (zero_flag, gridencoder.cu:255-261)
            on_ring = jnp.any((coords == 0) | (coords == R - 1), axis=-1)
            valid = ~on_ring
            idx = _corner_index(jnp.clip(coords, 0, R - 1), R, table_size,
                                num_dim)
            vals = table[idx]                                  # [N, F]
            wv = jnp.where(valid, w, 0.0)
            acc = acc + wv[:, None] * vals
            wn = wn + wv[:, None]
        level_out = acc / (wn + 1e-9)
        outs.append(level_out)

    out = jnp.concatenate(outs, -1)                            # [N, L*F]
    return jnp.where(in_bounds[:, None], out, 0.0)


@dataclasses.dataclass(frozen=True)
class Mix3D2DSpec:
    """HAC's mixed 3D + three 2D-plane encoding (gaussian_model.py:39-105)."""
    n_features: int
    resolutions_3d: Tuple[int, ...]
    log2_hashmap_size_3d: int
    resolutions_2d: Tuple[int, ...]
    log2_hashmap_size_2d: int
    ste_binary: bool = True

    @property
    def spec_xyz(self) -> GridSpec:
        return GridSpec(3, self.n_features, tuple(self.resolutions_3d),
                        self.log2_hashmap_size_3d, self.ste_binary)

    @property
    def spec_2d(self) -> GridSpec:
        return GridSpec(2, self.n_features, tuple(self.resolutions_2d),
                        self.log2_hashmap_size_2d, self.ste_binary)

    @property
    def output_dim(self) -> int:
        return self.spec_xyz.output_dim + 3 * self.spec_2d.output_dim


def init_mix_params(spec: Mix3D2DSpec, key) -> dict:
    import jax
    k = jax.random.split(key, 4)
    return {
        'xyz': init_grid_params(spec.spec_xyz, k[0]),
        'xy': init_grid_params(spec.spec_2d, k[1]),
        'xz': init_grid_params(spec.spec_2d, k[2]),
        'yz': init_grid_params(spec.spec_2d, k[3]),
    }


def mix_encode(params: dict, x: jnp.ndarray,
               spec: Mix3D2DSpec) -> jnp.ndarray:
    """x [N,3] in [0,1] -> concat(xyz, xy, xz, yz) features."""
    out_xyz = grid_encode(params['xyz'], x, spec.spec_xyz)
    out_xy = grid_encode(params['xy'], x[:, (0, 1)], spec.spec_2d)
    out_xz = grid_encode(params['xz'], x[:, (0, 2)], spec.spec_2d)
    out_yz = grid_encode(params['yz'], x[:, (1, 2)], spec.spec_2d)
    return jnp.concatenate([out_xyz, out_xy, out_xz, out_yz], -1)


def all_grid_params_flat(params: dict) -> jnp.ndarray:
    """Concatenated raw tables (for codec / size estimation), like
    get_encoding_params (gaussian_model.py:269-281)."""
    return jnp.concatenate([params['xyz'], params['xy'], params['xz'],
                            params['yz']], 0)
