"""STE quantizer semantics (reference encodings.py:177-227)."""
import jax
import jax.numpy as jnp
import numpy as np

from bloomscene_tpu.ops.quantization import (low_bound, quantize_anchor,
                                             ste_binary, ste_multistep)


def test_ste_binary_forward():
    x = jnp.array([-2.0, -0.5, 0.0, 0.5, 2.0])
    np.testing.assert_allclose(ste_binary(x), [-1, -1, 1, 1, 1])


def test_ste_binary_grad_window():
    g = jax.grad(lambda x: jnp.sum(ste_binary(x) * jnp.arange(1.0, 6.0)))(
        jnp.array([-2.0, -0.5, 0.0, 0.5, 2.0]))
    # grad passes only where |x| <= 1
    np.testing.assert_allclose(g, [0, 2, 3, 4, 0])


def test_ste_multistep_rounding():
    x = jnp.array([0.0, 0.26, 0.49, 1.3])
    q = jnp.float32(0.5)
    out = ste_multistep(x, q, x.mean())
    hard = jnp.round(x / q) * q
    # semi-soft: hard + tanh(residual)*q, residual in (-q/2, q/2)
    assert np.all(np.abs(np.asarray(out - hard)) <= 0.5 * float(q) + 1e-6)
    g = jax.grad(lambda v: jnp.sum(ste_multistep(v, q, v.mean())))(x)
    np.testing.assert_allclose(g, np.ones(4))  # straight-through


def test_quantize_anchor_roundtrip():
    x = jnp.array([[0.1, 0.5, 0.9], [-0.3, 0.0, 0.2]])
    mn = jnp.full((1, 3), -1.0)
    mx = jnp.full((1, 3), 1.0)
    xq, q = quantize_anchor(x, mn, mx)
    # 16-bit quantization over range 2 -> max error ~2/65535
    assert np.max(np.abs(np.asarray(xq - x))) < 2.5 / 65535 * 2
    assert np.all(np.asarray(q) >= 0) and np.all(np.asarray(q) < 2 ** 16)
    g = jax.grad(lambda v: jnp.sum(quantize_anchor(v, mn, mx)[0]))(x)
    np.testing.assert_allclose(g, np.ones((2, 3)))


def test_low_bound_grad_rule():
    x = jnp.array([1e-8, 1e-8, 0.5])
    # cotangent signs: positive, negative, positive
    def f(v):
        return jnp.sum(low_bound(v) * jnp.array([1.0, -1.0, 1.0]))
    g = jax.grad(f)(x)
    # below bound: positive cotangent blocked, negative passes
    np.testing.assert_allclose(g, [0.0, -1.0, 1.0])
