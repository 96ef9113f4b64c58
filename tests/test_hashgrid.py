"""Hash-grid encoder semantics (reference gridencoder.cu conventions)."""
import jax
import jax.numpy as jnp
import numpy as np

from bloomscene_tpu.ops.hashgrid import (GridSpec, Mix3D2DSpec, grid_encode,
                                         init_grid_params, init_mix_params,
                                         mix_encode)


def small_spec(ste=False):
    return GridSpec(num_dim=3, n_features=4, resolutions=(6, 10),
                    log2_hashmap_size=13, ste_binary=ste)


def test_table_sizes_match_reference_rule():
    spec = GridSpec(3, 4, (18, 24), 13)
    # 18^3=5832 <= 8192 -> ceil8(5832)=5832; 24^3=13824 -> capped 8192
    assert spec.level_sizes == (5832, 8192)
    spec2 = GridSpec(2, 4, (130, 258), 15)
    # 130^2=16900 <= 32768 (dense); 258^2=66564 -> capped 32768
    assert spec2.level_sizes == (16904, 32768)


def test_out_of_bounds_zero():
    spec = small_spec()
    params = init_grid_params(spec, jax.random.PRNGKey(0), std=0.5)
    x = jnp.array([[1.5, 0.5, 0.5], [-0.1, 0.2, 0.3]])
    out = grid_encode(params, x, spec)
    np.testing.assert_allclose(out, 0.0)


def test_interior_interpolation_continuity():
    """Encoding must be continuous in x (piecewise-linear)."""
    spec = small_spec()
    params = init_grid_params(spec, jax.random.PRNGKey(1), std=0.5)
    x0 = jnp.array([[0.41, 0.52, 0.63]])
    eps = 1e-5
    o0 = grid_encode(params, x0, spec)
    o1 = grid_encode(params, x0 + eps, spec)
    assert np.max(np.abs(np.asarray(o1 - o0))) < 1e-3


def test_constant_table_gives_constant_output():
    """With all-equal table entries, interiors must return that constant
    (weight renormalization over non-boundary corners)."""
    spec = small_spec()
    params = jnp.full((spec.n_params, spec.n_features), 0.7)
    x = jnp.asarray(np.random.default_rng(0).uniform(0.2, 0.8, (32, 3)),
                    jnp.float32)
    out = grid_encode(params, x, spec)
    np.testing.assert_allclose(out, 0.7, atol=1e-5)


def test_ste_binary_binarizes_tables():
    spec = small_spec(ste=True)
    params = init_grid_params(spec, jax.random.PRNGKey(2))
    x = jnp.asarray(np.random.default_rng(1).uniform(0.3, 0.7, (16, 3)),
                    jnp.float32)
    out = np.asarray(grid_encode(params, x, spec))
    # outputs are convex combos of {-1, +1} => within [-1, 1]
    assert out.min() >= -1.0 - 1e-6 and out.max() <= 1.0 + 1e-6


def test_grad_flows_to_table():
    spec = small_spec()
    params = init_grid_params(spec, jax.random.PRNGKey(3), std=0.5)
    x = jnp.array([[0.5, 0.5, 0.5]])

    g = jax.grad(lambda p: jnp.sum(grid_encode(p, x, spec)))(params)
    g = np.asarray(g).reshape(-1, spec.n_features)  # params stored flat
    assert np.abs(g).sum() > 0
    # gradient hits at most 2^3 corners per level
    assert (np.abs(g).sum(1) > 0).sum() <= 16


def test_mix_encode_output_dim():
    spec = Mix3D2DSpec(n_features=4,
                       resolutions_3d=(18, 24, 33),
                       log2_hashmap_size_3d=13,
                       resolutions_2d=(130, 258),
                       log2_hashmap_size_2d=15)
    params = init_mix_params(spec, jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(2).uniform(0, 1, (8, 3)),
                    jnp.float32)
    out = mix_encode(params, x, spec)
    assert out.shape == (8, spec.output_dim)
    assert spec.output_dim == 3 * 4 + 3 * (2 * 4)
