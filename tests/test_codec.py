"""rANS coder + scene codec round-trip tests."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bloomscene_tpu.codec import rans
from bloomscene_tpu.codec.codec import (decode_scene, encode_scene,
                                        estimate_final_bits)
from bloomscene_tpu.config import GSConfig
from bloomscene_tpu.models.anchors import update_anchor_bounds
from bloomscene_tpu.models.model import init_model


def test_rans_roundtrip_uniform(rng):
    n, k = 5000, 16
    syms = rng.integers(0, k, n).astype(np.int32)
    cdf = np.tile(np.linspace(0, 1, k + 1), (n, 1))
    data = rans.encode_with_cdf(syms, cdf)
    out = rans.decode_with_cdf(data, cdf)
    np.testing.assert_array_equal(out, syms)
    # uniform 16-symbol alphabet: ~4 bits/symbol
    assert len(data) * 8 < 4.2 * n


def test_rans_roundtrip_skewed(rng):
    n = 20000
    p = np.array([0.9, 0.05, 0.03, 0.02])
    syms = rng.choice(4, n, p=p).astype(np.int32)
    cdf = np.tile(np.concatenate([[0.0], np.cumsum(p)]), (n, 1))
    data = rans.encode_with_cdf(syms, cdf)
    np.testing.assert_array_equal(rans.decode_with_cdf(data, cdf), syms)
    # entropy ~0.67 bits/sym; allow quantization overhead
    assert len(data) * 8 < 0.8 * n


def test_rans_per_symbol_cdfs(rng):
    """Each position has its own CDF (the conditioned-coding case)."""
    n, k = 3000, 8
    probs = rng.dirichlet(np.ones(k) * 0.5, size=n)
    cdf = np.concatenate([np.zeros((n, 1)), np.cumsum(probs, 1)], 1)
    syms = np.array([rng.choice(k, p=probs[i]) for i in range(n)],
                    np.int32)
    data = rans.encode_with_cdf(syms, cdf)
    np.testing.assert_array_equal(rans.decode_with_cdf(data, cdf), syms)


def test_rans_native_matches_python(rng):
    """Native C++ and the pure-python fallback must be bitstream-identical."""
    if rans._native_lib() is None:
        pytest.skip("native rans unavailable")
    n, k = 500, 6
    syms = rng.integers(0, k, n).astype(np.int32)
    cdf = np.tile(np.linspace(0, 1, k + 1), (n, 1))
    cdf_q = rans.quantize_cdf(cdf)
    native = rans.encode_with_cdf(syms, cdf)
    py = rans._py_encode(syms, cdf_q)
    assert native == py
    np.testing.assert_array_equal(rans._py_decode(native, cdf_q, n), syms)


def test_gaussian_coder_roundtrip(rng):
    n = 4000
    mean = rng.normal(0, 1, n)
    scale = rng.uniform(0.1, 2.0, n)
    q = np.full(n, 0.25)
    x = rng.normal(mean, scale)
    data = rans.encode_gaussian(x, mean, scale, q)
    out = rans.decode_gaussian(data, mean, scale, q)
    np.testing.assert_allclose(out, np.round(x / q) * q, atol=1e-12)


def test_gaussian_coder_wide_spread(rng):
    # means spread over thousands of quantization steps with one
    # wide-sigma outlier row: exercises the mean-centered + width-bucketed
    # path (a shared global table here would be ~40000 symbols wide)
    n = 5000
    mean = rng.normal(0, 5.0, n)
    scale = rng.uniform(0.01, 0.1, n)
    scale[7] = 30.0                      # huge-sigma outlier row
    q = np.full(n, 0.001)
    x = rng.normal(mean, scale)
    data = rans.encode_gaussian(x, mean, scale, q)
    out = rans.decode_gaussian(data, mean, scale, q)
    np.testing.assert_allclose(out, np.round(x / q) * q, atol=1e-9)
    # near-entropy size: residuals are ~N(0, scale), so about
    # log2(sqrt(2*pi*e)*scale/q) bits per symbol
    ent_bits = np.sum(np.log2(np.sqrt(2 * np.pi * np.e)
                              * np.maximum(scale / q, 1.0)))
    assert len(data) * 8 < ent_bits * 1.05 + 2048


def test_gaussian_native_matches_python(rng):
    # the native table-free path (on-the-fly CDF edges, native/rans.cpp
    # rans_encode_gaussian) must produce the same bytes as the python
    # table-building fallback — both sides share the Phi LUT
    if rans._native_lib() is None:
        pytest.skip("native coder unavailable")
    n = 3000
    mean = rng.normal(0, 2.0, n)
    scale = rng.uniform(0.01, 1.0, n)
    q = np.full(n, 0.01)
    x = rng.normal(mean, scale)
    data_native = rans.encode_gaussian(x, mean, scale, q)
    lib, tried = rans._lib, rans._lib_tried
    try:
        rans._lib, rans._lib_tried = None, True
        data_py = rans.encode_gaussian(x, mean, scale, q)
        out_py = rans.decode_gaussian(data_native, mean, scale, q)
    finally:
        rans._lib, rans._lib_tried = lib, tried
    assert data_native == data_py
    np.testing.assert_allclose(out_py, np.round(x / q) * q, atol=1e-12)
    out_native = rans.decode_gaussian(data_py, mean, scale, q)
    np.testing.assert_allclose(out_native, np.round(x / q) * q, atol=1e-12)


def test_binary_coder_roundtrip(rng):
    x = (rng.random(10000) < 0.23).astype(np.float32) * 2 - 1
    p = float((x > 0).mean())
    data = rans.encode_binary(x, p)
    out = rans.decode_binary(data, p, x.size)
    np.testing.assert_array_equal(out, x)
    # close to the Bernoulli entropy
    ent = -(p * np.log2(p) + (1 - p) * np.log2(1 - p))
    assert len(data) * 8 < ent * x.size * 1.05 + 64


def test_scene_codec_roundtrip(tmp_path, rng):
    cfg = GSConfig(voxel_size=0.1)
    pts = rng.uniform(-1, 1, (300, 3)).astype(np.float32)
    pts[:, 2] += 2.5
    model, _ = init_model(jax.random.PRNGKey(0), pts, cfg)
    # give attributes non-trivial values
    st = model.state
    C = st.capacity
    model = model._replace(state=st._replace(
        feat=jnp.asarray(rng.normal(0, 1, (C, cfg.feat_dim)),
                         jnp.float32),
        offset=jnp.asarray(rng.normal(0, 0.3, (C, cfg.n_offsets, 3)),
                           jnp.float32),
        mask_logit=jnp.asarray(rng.normal(2, 3, (C, cfg.n_offsets, 1)),
                               jnp.float32)))
    model = model._replace(bounds=update_anchor_bounds(model.state))

    est = estimate_final_bits(model, cfg)
    assert est['total_MB'] > 0

    path = str(tmp_path / "bitstreams")
    sizes = encode_scene(model, cfg, path)
    assert sizes['n_anchors'] > 0
    assert os.path.exists(os.path.join(path, 'meta.json'))

    decoded = decode_scene(model, cfg, path)
    n = sizes['n_anchors']
    assert int(decoded.state.num_alive()) == n

    # masks decode exactly
    from bloomscene_tpu.models.anchors import get_mask, get_mask_anchor
    alive = np.asarray(model.state.alive) \
        & (np.asarray(get_mask_anchor(model.state)) > 0)
    orig_mask = np.asarray(get_mask(model.state))[alive]
    dec_mask = np.asarray(get_mask(decoded.state))
    np.testing.assert_array_equal(dec_mask, orig_mask)

    # attributes decode to within one quantization step of the originals
    orig_feat = np.asarray(model.state.feat)[alive]
    dec_feat = np.asarray(decoded.state.feat)
    assert np.max(np.abs(dec_feat - orig_feat)) < 2 * cfg.q_base_feat

    from bloomscene_tpu.models.anchors import get_scaling
    orig_scaling = np.asarray(get_scaling(model.state))[alive]
    dec_scaling = np.asarray(get_scaling(decoded.state))
    assert np.max(np.abs(dec_scaling - orig_scaling)) \
        < 2 * cfg.q_base_scaling + 1e-5

    # hash grids binarize identically
    from bloomscene_tpu.ops.hashgrid import all_grid_params_flat
    ob = np.sign(np.asarray(all_grid_params_flat(model.grid)))
    db = np.asarray(all_grid_params_flat(decoded.grid))
    np.testing.assert_array_equal(np.where(ob >= 0, 1, -1), db)

    # bit-exact re-encode: encoding the decoded scene reproduces streams
    path2 = str(tmp_path / "bitstreams2")
    sizes2 = encode_scene(decoded, cfg, path2)
    for fn in sorted(os.listdir(path)):
        if fn.endswith('.b'):
            with open(os.path.join(path, fn), 'rb') as f1, \
                 open(os.path.join(path2, fn), 'rb') as f2:
                assert f1.read() == f2.read(), f"stream {fn} differs"


def test_decode_detects_context_mismatch(tmp_path, rng):
    """A perturbed context model (here: one hash-table float flipped hard
    enough to change its binarization) must fail LOUDLY at decode, not
    produce a silently garbled scene (codec.py _context_digest)."""
    cfg = GSConfig(voxel_size=0.1)
    pts = rng.uniform(-1, 1, (200, 3)).astype(np.float32)
    pts[:, 2] += 2.5
    model, _ = init_model(jax.random.PRNGKey(0), pts, cfg)
    model = model._replace(state=model.state._replace(
        feat=jnp.asarray(rng.normal(0, 1, (model.state.capacity,
                                           cfg.feat_dim)), jnp.float32)))
    model = model._replace(bounds=update_anchor_bounds(model.state))
    path = str(tmp_path / "bitstreams")
    encode_scene(model, cfg, path)

    # corrupt the context model: perturb one grid-MLP weight. (The hash
    # TABLES ride in the bitstream and are replaced at decode, so the
    # mismatch surface is the MLP-head checkpoint + backend numerics.)
    heads = dict(model.heads)
    layers = [dict(layer) for layer in heads['grid']]
    w = np.array(layers[0]['w'])
    w.reshape(-1)[3] += 0.25
    layers[0]['w'] = jnp.asarray(w)
    heads['grid'] = layers
    bad = model._replace(heads=heads)

    with pytest.raises(RuntimeError, match="context-model mismatch"):
        decode_scene(bad, cfg, path)

    # the pristine shell still decodes fine
    decoded = decode_scene(model, cfg, path)
    assert int(decoded.state.num_alive()) > 0
