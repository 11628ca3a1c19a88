"""Fused (2+1)D inference block vs the composed reference ops."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from fastvideotagging_tpu.ops.fused_block import conv2plus1d_fused, fold_bn


def _composed(x, w_sp, scale, bias, w_tmp):
    y = lax.conv_general_dilated(
        x, w_sp[None], (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    y = jnp.maximum(y * scale + bias, 0.0)
    return lax.conv_general_dilated(
        y, w_tmp[:, None, None], (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


@pytest.mark.parametrize("shape,m,co,k", [
    ((2, 4, 8, 8, 32), 48, 32, 3),
    ((1, 6, 16, 12, 64), 64, 48, 3),
])
def test_fused_matches_composed(shape, m, co, k):
    key = jax.random.PRNGKey(0)
    c = shape[-1]
    x = jax.random.normal(key, shape, jnp.float32)
    w_sp = jax.random.normal(key, (k, k, c, m)) / np.sqrt(k * k * c)
    w_tmp = jax.random.normal(key, (k, m, co)) / np.sqrt(k * m)
    gamma = jnp.abs(jax.random.normal(key, (m,))) + 0.5
    beta = jax.random.normal(key, (m,)) * 0.1
    mean = jax.random.normal(key, (m,)) * 0.1
    var = jnp.abs(jax.random.normal(key, (m,))) + 0.5
    scale, bias = fold_bn(gamma, beta, mean, var)

    got = conv2plus1d_fused(x, w_sp, scale, bias, w_tmp)
    ref = _composed(x, w_sp.astype(jnp.float32), scale, bias, w_tmp)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_fold_bn_identity():
    m = 8
    scale, bias = fold_bn(jnp.ones(m), jnp.zeros(m), jnp.zeros(m),
                          jnp.ones(m) - 1e-5)
    np.testing.assert_allclose(np.asarray(scale), 1.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(bias), 0.0, atol=1e-6)


def test_rejects_unsupported():
    x = jnp.zeros((1, 4, 8, 8, 8))  # C < MIN_C
    with pytest.raises(ValueError):
        conv2plus1d_fused(x, jnp.zeros((3, 3, 8, 16)), jnp.zeros(16),
                          jnp.zeros(16), jnp.zeros((3, 16, 8)))
