"""Scene compression codec: rate estimation + encode/decode round trip.

The HAC-style structured context compression head (reference
scene/gaussian_model.py:1016-1377): per 1000-anchor chunk, the hash-grid
context MLP predicts gaussian entropy parameters and adaptive quantization
steps for feat/scaling/offsets; quantized values are rANS-coded against
those gaussians; hash tables and child masks are Bernoulli-coded; anchors
are stored raw at 16 bits/coordinate. The TPU computes contexts/params
in-graph; the host packs bitstreams (codec/rans.py, native C++).

Differences from the reference, by design:
- one directory of .b chunk files + meta.npz instead of pickled tuples;
- anchors stored as uint16 quantization codes + AABB (the reference
  torch.saves the float anchors, gaussian_model.py:1112, which defeats its
  own 16-bit estimate; we store actual 16-bit codes).
"""
from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..config import GSConfig
from ..models import heads as heads_lib
from ..models.anchors import (AnchorBounds, AnchorState, get_mask,
                              get_mask_anchor, get_anchor_quantized,
                              get_scaling)
from ..models.model import Model, calc_interp_feat
from ..ops.entropy import entropy_gaussian_bits, binary_entropy_bits
from ..ops.hashgrid import all_grid_params_flat
from ..ops.quantization import (ANCHOR_ROUND_DIGITS, Q_ANCHOR,
                                quantize_anchor, ste_multistep)
from . import rans

BIT2MB = 8 * 1024 * 1024
CHUNK = 1000


def _anchors_from_codes(codes: np.ndarray, bmin: np.ndarray,
                        bmax: np.ndarray) -> np.ndarray:
    """Deterministic float32 anchor reconstruction from 16-bit codes.

    Used identically on the encode and decode sides so the context MLP
    (which conditions the entropy model) sees bit-identical inputs — a
    mismatch would derail the rANS stream. Encode/decode must also run on
    the same backend for the MLP itself to be deterministic. The arithmetic
    mirrors quantize_anchor's f32 ops so re-quantization is exact under its
    nudged floor.
    """
    bmin32 = bmin.astype(np.float32)
    bmax32 = bmax.astype(np.float32)
    interval = np.float32((bmax32 - bmin32) * np.float32(Q_ANCHOR)
                          + np.float32(1e-6))
    return (codes.astype(np.float32) * interval + bmin32).astype(np.float32)


def _context_params(model: Model, anchors: jnp.ndarray, cfg: GSConfig):
    """grid MLP -> entropy params + adaptive Q for given anchors."""
    ctx = calc_interp_feat(model, anchors, cfg)
    out = heads_lib.apply_grid(model.heads, ctx)
    F, K = cfg.feat_dim, cfg.n_offsets
    splits = np.cumsum([F, F, 6, 6, 3 * K, 3 * K, 1, 1, 1])[:-1]
    (mean_f, scale_f, mean_s, scale_s, mean_o, scale_o,
     qf_adj, qs_adj, qo_adj) = jnp.split(out, splits.tolist(), axis=-1)
    q_f = cfg.q_base_feat * (1 + jnp.tanh(qf_adj))
    q_s = cfg.q_base_scaling * (1 + jnp.tanh(qs_adj))
    q_o = cfg.q_base_offsets * (1 + jnp.tanh(qo_adj))
    return (mean_f, scale_f, mean_s, scale_s, mean_o, scale_o, q_f, q_s, q_o)


# jitted so the per-megachunk MLP apply compiles once instead of
# retracing per chunk (the former per-1000-anchor loop spent ~70s of a
# 60K-anchor encode on CPU dispatch alone)
_context_params_jit = jax.jit(_context_params, static_argnames=('cfg',))

# anchors per context-MLP dispatch. Both coder sides MUST use the same
# megachunk size: XLA may vectorize a different batch shape differently,
# and the entropy model conditions the rANS streams on these floats.
MEGACHUNK = 64 * CHUNK


def _cpu_device():
    return jax.devices('cpu')[0]


def _slim_for_context(model: Model) -> Model:
    """Model with per-anchor state cut to one row: the context path only
    reads heads/grid/bounds, and the slim state keeps the host-CPU
    transfer below a kilobyte instead of shipping the full (possibly
    device-resident) anchor arrays through a TPU relay."""
    tiny = jax.tree.map(lambda x: x[:1], model.state)
    return model._replace(state=tiny)


def _context_params_np(model: Model, anchors: np.ndarray, cfg: GSConfig):
    """Context params for ALL anchors as host arrays, computed in
    MEGACHUNK-sized jitted dispatches (identical on encode and decode).

    Always runs on the host CPU backend: the codec is a checkpoint-time
    host pipeline, and pulling ~80 MB of entropy params back through a
    TPU relay dominated wall time (RUN_r04: 395 s encode+decode at 110K
    anchors vs ~20 s host-side). CPU floats are also host-portable —
    any machine can decode the bitstream; the context digest still
    guards encode/decode consistency.
    """
    cpu = _cpu_device()
    slim = jax.device_put(_slim_for_context(model), cpu)
    n = anchors.shape[0]
    cols = None
    for lo in range(0, n, MEGACHUNK):
        chunk = jax.device_put(
            jnp.asarray(anchors[lo:lo + MEGACHUNK], jnp.float32), cpu)
        part = _context_params_jit(slim, chunk, cfg)
        part = [np.asarray(p) for p in part]
        if cols is None:
            cols = [[p] for p in part]
        else:
            for c, p in zip(cols, part):
                c.append(p)
    return [np.concatenate(c, 0) if len(c) > 1 else c[0] for c in cols]


# host-CPU quantizer dispatch (same reasoning as _context_params_np: the
# ste_multistep rounding of full [n, F]/[n, 6]/[n, 3K] arrays is
# checkpoint-time host work; f32 jnp semantics preserved)
_ste_multistep_cpu = jax.jit(ste_multistep)


def _quantize_np(x: np.ndarray, q: np.ndarray, mean: float) -> np.ndarray:
    cpu = _cpu_device()
    return np.asarray(_ste_multistep_cpu(
        jax.device_put(jnp.asarray(x, jnp.float32), cpu),
        jax.device_put(jnp.asarray(q, jnp.float32), cpu),
        jnp.float32(mean)))


def _context_digest(params) -> str:
    """SHA-256 over the (clipped) context-param floats that condition the
    rANS streams. Encode stores it in meta.json; decode recomputes and
    compares. Any nondeterminism between the two sides — different
    backend, different XLA version, a perturbed hash table — changes
    these floats and would otherwise derail the entropy decoder into a
    silently garbled scene; the digest turns that into a loud error."""
    import hashlib
    h = hashlib.sha256()
    for a in params:
        h.update(np.ascontiguousarray(a, np.float32).tobytes())
    return h.hexdigest()


def _alive_arrays(model: Model, cfg: GSConfig):
    """Compacted (host-side) per-anchor arrays for coding: only alive
    anchors whose child mask is non-empty (get_mask_anchor)."""
    st = model.state
    keep = np.asarray(st.alive) & (np.asarray(get_mask_anchor(st)) > 0)
    idx = np.where(keep)[0]
    anchor_q = np.asarray(get_anchor_quantized(st, model.bounds))[idx]
    return idx, {
        'anchor': anchor_q,
        'feat': np.asarray(st.feat)[idx],
        'offsets': np.asarray(st.offset)[idx],
        'scaling': np.asarray(get_scaling(st))[idx],
        'mask': np.asarray(get_mask(st))[idx],
    }


def estimate_final_bits(model: Model, cfg: GSConfig) -> dict:
    """estimate_final_bits equivalent (gaussian_model.py:1016-1071).

    Runs entirely on the host CPU backend (same reasoning and megachunk
    dispatch as ``_context_params_np``): the one-shot whole-scene jit
    this used to trace on the accelerator spent minutes COMPILING at
    100K+ anchors through the TPU relay (RUN_r05 first measured it at
    ~170 s of the codec wall), for an informational estimate whose
    float-exactness is not load-bearing."""
    idx, arr = _alive_arrays(model, cfg)
    n = idx.size
    if n == 0:
        return {'total_MB': 0.0, 'n_anchors': 0,
                'error': 'no alive anchors with non-empty masks'}
    cpu = _cpu_device()
    (mean_f, scale_f, mean_s, scale_s, mean_o, scale_o,
     q_f, q_s, q_o) = [
        jax.device_put(jnp.asarray(a), cpu)
        for a in _context_params_np(model, arr['anchor'], cfg)]

    feat = _quantize_np(arr['feat'], np.asarray(q_f),
                        float(arr['feat'].mean()))
    scaling = _quantize_np(arr['scaling'], np.asarray(q_s),
                           float(arr['scaling'].mean()))
    offsets = _quantize_np(arr['offsets'], np.asarray(q_o)[:, :, None],
                           float(arr['offsets'].mean()))
    offsets = offsets.reshape(n, -1)

    def dput(x):
        return jax.device_put(jnp.asarray(x, jnp.float32), cpu)

    bit_feat = jnp.sum(entropy_gaussian_bits(
        dput(feat), mean_f, scale_f, q_f, float(feat.mean())))
    bit_scaling = jnp.sum(entropy_gaussian_bits(
        dput(scaling), mean_s, scale_s, q_s, float(scaling.mean())))
    mask3 = np.repeat(arr['mask'][:, :, 0], 3, axis=-1)
    bit_offsets = jnp.sum(entropy_gaussian_bits(
        dput(offsets), mean_o, scale_o, q_o,
        float(offsets.mean())) * dput(mask3))

    hash_flat = np.asarray(all_grid_params_flat(model.grid))
    hash_bin = np.where(hash_flat >= 0, 1.0, -1.0)
    _, bit_hash = binary_entropy_bits(dput((hash_bin + 1) / 2))
    _, bit_masks = binary_entropy_bits(dput(arr['mask']))
    bit_anchor = n * 3 * ANCHOR_ROUND_DIGITS
    bit_mlp = heads_lib.mlp_param_bits(model.heads)

    sizes = {
        'anchor_MB': float(bit_anchor) / BIT2MB,
        'feat_MB': float(bit_feat) / BIT2MB,
        'scaling_MB': float(bit_scaling) / BIT2MB,
        'offsets_MB': float(bit_offsets) / BIT2MB,
        'hash_MB': float(bit_hash) / BIT2MB,
        'masks_MB': float(bit_masks) / BIT2MB,
        'MLPs_MB': float(bit_mlp) / BIT2MB,
    }
    sizes['total_MB'] = sum(sizes.values())
    sizes['n_anchors'] = n
    return sizes


def encode_scene(model: Model, cfg: GSConfig, path: str) -> dict:
    """conduct_encoding equivalent (gaussian_model.py:1073-1230)."""
    t1 = time.time()
    os.makedirs(path, exist_ok=True)
    idx, arr = _alive_arrays(model, cfg)
    n = idx.size
    if n == 0:
        raise ValueError("encode_scene: no alive anchors with non-empty "
                         "masks — the scene is empty (diverged training?)")
    steps = -(-n // CHUNK)

    # anchors: store actual 16-bit codes + bounds. arr['anchor'] is already
    # the quantized reconstruction q*interval+min, so round() recovers q
    # exactly (floor would be off-by-one at ulp boundaries).
    bounds_min = np.asarray(model.bounds.x_min)
    bounds_max = np.asarray(model.bounds.x_max)
    interval = ((bounds_max.astype(np.float64)
                 - bounds_min.astype(np.float64)) * Q_ANCHOR + 1e-6)
    codes = np.clip(np.round((arr['anchor'].astype(np.float64)
                              - bounds_min) / interval),
                    0, 2 ** ANCHOR_ROUND_DIGITS - 1).astype(np.uint16)
    np.save(os.path.join(path, 'anchor_codes.npy'), codes)
    # context conditioning uses the code-reconstructed anchors on BOTH
    # sides (see _anchors_from_codes)
    arr['anchor'] = _anchors_from_codes(codes, bounds_min, bounds_max)

    # per-stream symbol ranges ride inside each .b blob (bucketed header,
    # codec/rans.py encode_gaussian) rather than in meta
    meta = {'n': int(n), 'chunk': CHUNK, 'backend': 'cpu'}
    feat_mean = float(arr['feat'].mean())
    scaling_mean = float(arr['scaling'].mean())
    offsets_mean = float(arr['offsets'].mean())
    bit_feat = bit_scaling = bit_offsets = 0

    t_ctx = time.time()
    (mean_f, scale_f, mean_s, scale_s, mean_o, scale_o,
     q_f, q_s, q_o) = _context_params_np(model, arr['anchor'], cfg)
    scale_f = np.clip(scale_f, 1e-9, None)
    scale_s = np.clip(scale_s, 1e-9, None)
    scale_o = np.clip(scale_o, 1e-9, None)
    meta['context_sha256'] = _context_digest(
        (mean_f, scale_f, mean_s, scale_s, mean_o, scale_o, q_f, q_s, q_o))
    context_s = time.time() - t_ctx

    t_q = time.time()
    feat_q = _quantize_np(arr['feat'], q_f, feat_mean)
    scaling_q = _quantize_np(arr['scaling'], q_s, scaling_mean)
    offsets_q = _quantize_np(arr['offsets'], q_o[:, :, None],
                             offsets_mean).reshape(n, -1)
    quantize_s = time.time() - t_q

    t_rans = time.time()
    for s in range(steps):
        lo, hi = s * CHUNK, min((s + 1) * CHUNK, n)
        m = hi - lo
        qf = np.broadcast_to(q_f[lo:hi], (m, cfg.feat_dim)).ravel()
        qs = np.broadcast_to(q_s[lo:hi], (m, 6)).ravel()
        qo = np.broadcast_to(q_o[lo:hi], (m, 3 * cfg.n_offsets)).ravel()

        data_f = rans.encode_gaussian(
            feat_q[lo:hi].ravel(), mean_f[lo:hi].ravel(),
            scale_f[lo:hi].ravel(), qf)
        with open(os.path.join(path, f'feat_{s}.b'), 'wb') as f:
            f.write(data_f)

        data_s = rans.encode_gaussian(
            scaling_q[lo:hi].ravel(), mean_s[lo:hi].ravel(),
            scale_s[lo:hi].ravel(), qs)
        with open(os.path.join(path, f'scaling_{s}.b'), 'wb') as f:
            f.write(data_s)

        mask3 = np.repeat(arr['mask'][lo:hi, :, 0], 3, axis=-1) > 0.5
        mask3 = mask3.reshape(-1)
        offsets = offsets_q[lo:hi].ravel()
        data_o = rans.encode_gaussian(
            offsets[mask3], mean_o[lo:hi].ravel()[mask3],
            scale_o[lo:hi].ravel()[mask3], qo[mask3])
        with open(os.path.join(path, f'offsets_{s}.b'), 'wb') as f:
            f.write(data_o)

        bit_feat += len(data_f) * 8
        bit_scaling += len(data_s) * 8
        bit_offsets += len(data_o) * 8
    rans_s = time.time() - t_rans

    # hash tables: Bernoulli
    hash_flat = np.asarray(all_grid_params_flat(model.grid)).ravel()
    hash_bin = np.where(hash_flat >= 0, 1.0, -1.0).astype(np.float32)
    prob_hash = float((hash_bin > 0).mean())
    with open(os.path.join(path, 'hash.b'), 'wb') as f:
        f.write(rans.encode_binary(hash_bin, prob_hash))
    bit_hash = os.path.getsize(os.path.join(path, 'hash.b')) * 8

    # child masks: Bernoulli
    masks = arr['mask'].reshape(-1)
    prob_masks = float((masks > 0.5).mean())
    with open(os.path.join(path, 'masks.b'), 'wb') as f:
        f.write(rans.encode_binary(masks * 2 - 1, prob_masks))
    bit_masks = os.path.getsize(os.path.join(path, 'masks.b')) * 8

    meta.update(prob_hash=prob_hash, prob_masks=prob_masks,
                feat_mean=feat_mean, scaling_mean=scaling_mean,
                offsets_mean=offsets_mean,
                bounds_min=bounds_min.tolist(), bounds_max=bounds_max.tolist())
    with open(os.path.join(path, 'meta.json'), 'w') as f:
        json.dump(meta, f)

    bit_anchor = codes.size * ANCHOR_ROUND_DIGITS
    sizes = {
        'anchor_MB': bit_anchor / BIT2MB,
        'feat_MB': bit_feat / BIT2MB,
        'scaling_MB': bit_scaling / BIT2MB,
        'offsets_MB': bit_offsets / BIT2MB,
        'hash_MB': bit_hash / BIT2MB,
        'masks_MB': bit_masks / BIT2MB,
        'MLPs_MB': heads_lib.mlp_param_bits(model.heads) / BIT2MB,
        'encode_time_s': time.time() - t1,
        'context_s': round(context_s, 3),
        'quantize_s': round(quantize_s, 3),
        'rans_s': round(rans_s, 3),
        'n_anchors': int(n),
    }
    sizes['total_MB'] = sum(v for k, v in sizes.items()
                            if k.endswith('_MB'))
    return sizes


def decode_scene(model_shell: Model, cfg: GSConfig, path: str,
                 timings: dict | None = None) -> Model:
    """conduct_decoding equivalent (gaussian_model.py:1233-1377).

    ``model_shell`` provides the MLP heads + hash grids (from the MLP
    checkpoint); per-anchor state is rebuilt from the bitstream. The
    returned Model's state stores decoded values re-expressed so the
    standard activations reproduce them (log of decoded scaling, +-10
    mask logits); use mode='decoded' renders for bit-faithful eval.

    ``timings`` (optional dict) is filled with the per-phase wall split
    {'context_s', 'rans_s'}.
    """
    with open(os.path.join(path, 'meta.json')) as f:
        meta = json.load(f)
    n = meta['n']
    K, F = cfg.n_offsets, cfg.feat_dim

    # hash tables first (context depends on them)
    t_hash = time.time()
    hash_flat = all_grid_params_flat(model_shell.grid)
    total_hash = hash_flat.size
    with open(os.path.join(path, 'hash.b'), 'rb') as f:
        hash_bin = rans.decode_binary(f.read(), meta['prob_hash'],
                                      total_hash)
    grid = _unflatten_grid(model_shell.grid, hash_bin.reshape(-1))
    if timings is not None:
        timings['hash_s'] = round(time.time() - t_hash, 3)
    bounds = AnchorBounds(
        x_min=jnp.asarray(np.array(meta['bounds_min'], np.float32)),
        x_max=jnp.asarray(np.array(meta['bounds_max'], np.float32)))
    model = model_shell._replace(grid=grid, bounds=bounds)

    # anchors from 16-bit codes (same reconstruction as the encode side)
    codes = np.load(os.path.join(path, 'anchor_codes.npy'))
    bmin = np.array(meta['bounds_min'], np.float32)
    bmax = np.array(meta['bounds_max'], np.float32)
    anchors = _anchors_from_codes(codes, bmin, bmax)

    t_masks = time.time()
    with open(os.path.join(path, 'masks.b'), 'rb') as f:
        masks = rans.decode_binary(f.read(), meta['prob_masks'], n * K,
                                   as_pm1=False).reshape(n, K, 1)
    if timings is not None:
        timings['masks_s'] = round(time.time() - t_masks, 3)

    # context params batched exactly like the encode side (same MEGACHUNK
    # dispatch shapes -> bit-identical MLP floats -> same entropy model)
    t_ctx = time.time()
    (mean_f, scale_f, mean_s, scale_s, mean_o, scale_o,
     q_f, q_s, q_o) = _context_params_np(model, anchors, cfg)
    scale_f = np.clip(scale_f, 1e-9, None)
    scale_s = np.clip(scale_s, 1e-9, None)
    scale_o = np.clip(scale_o, 1e-9, None)
    if 'context_sha256' in meta:
        got = _context_digest((mean_f, scale_f, mean_s, scale_s, mean_o,
                               scale_o, q_f, q_s, q_o))
        if got != meta['context_sha256']:
            raise RuntimeError(
                "decode_scene: context-model mismatch — the entropy "
                f"parameters recomputed here (sha256 {got[:16]}…) differ "
                f"from the encode side ({meta['context_sha256'][:16]}…). "
                "Decoding would produce a silently garbled scene. Causes: "
                "decoding on a different backend/XLA version than encode "
                "(the context MLP floats are only backend-deterministic), "
                "or corrupted checkpoint/hash-grid tables.")
    if timings is not None:
        timings['context_s'] = round(time.time() - t_ctx, 3)

    t_rans = time.time()
    feat = np.zeros((n, F), np.float32)
    scaling = np.zeros((n, 6), np.float32)
    offsets = np.zeros((n, K, 3), np.float32)
    for s in range(-(-n // CHUNK)):
        lo, hi = s * CHUNK, min((s + 1) * CHUNK, n)
        m = hi - lo
        qf = np.broadcast_to(q_f[lo:hi], (m, F)).ravel()
        qs = np.broadcast_to(q_s[lo:hi], (m, 6)).ravel()
        qo = np.broadcast_to(q_o[lo:hi], (m, 3 * K)).ravel()

        with open(os.path.join(path, f'feat_{s}.b'), 'rb') as f:
            feat[lo:hi] = rans.decode_gaussian(
                f.read(), mean_f[lo:hi].ravel(), scale_f[lo:hi].ravel(),
                qf).reshape(m, F)
        with open(os.path.join(path, f'scaling_{s}.b'), 'rb') as f:
            scaling[lo:hi] = rans.decode_gaussian(
                f.read(), mean_s[lo:hi].ravel(), scale_s[lo:hi].ravel(),
                qs).reshape(m, 6)
        mask3 = np.repeat(masks[lo:hi, :, 0], 3, axis=-1).reshape(-1) > 0.5
        off_flat = np.zeros(m * 3 * K)
        if mask3.any():
            with open(os.path.join(path, f'offsets_{s}.b'), 'rb') as f:
                off_flat[mask3] = rans.decode_gaussian(
                    f.read(), mean_o[lo:hi].ravel()[mask3],
                    scale_o[lo:hi].ravel()[mask3], qo[mask3])
        offsets[lo:hi] = off_flat.reshape(m, K, 3)
    if timings is not None:
        timings['rans_s'] = round(time.time() - t_rans, 3)

    t_state = time.time()
    state = AnchorState(
        anchor=jnp.asarray(anchors, jnp.float32),
        offset=jnp.asarray(offsets),
        mask_logit=jnp.asarray(np.where(masks > 0.5, 10.0, -10.0),
                               jnp.float32),
        feat=jnp.asarray(feat),
        scaling_log=jnp.asarray(np.log(np.clip(scaling, 1e-9, None)),
                                jnp.float32),
        rotation=jnp.asarray(np.tile([1, 0, 0, 0], (n, 1)), jnp.float32),
        opacity_raw=jnp.zeros((n, 1), jnp.float32),
        alive=jnp.ones((n,), bool))
    if timings is not None:
        jax.block_until_ready(state.offset)
        timings['state_s'] = round(time.time() - t_state, 3)
    return model._replace(state=state)


def _unflatten_grid(grid_template: dict, flat_bin: np.ndarray) -> dict:
    out = {}
    pos = 0
    for key in ('xyz', 'xy', 'xz', 'yz'):
        t = np.asarray(grid_template[key])
        out[key] = jnp.asarray(
            flat_bin[pos:pos + t.size].astype(np.float32))
        pos += t.size
    assert pos == flat_bin.shape[0]
    return out
