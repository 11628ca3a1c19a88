"""Numerics-parity tier for the Pallas (2+1)D kernels (SURVEY.md §5.1).

On CPU these run the Pallas interpreter (same kernel logic, no Mosaic);
FVT_TEST_PLATFORM=tpu runs them compiled on the chip. Oracle:
lax.conv_general_dilated in f32.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from fastvideotagging_tpu.ops import conv2plus1d as ops


# References use symmetric (k//2, k//2) padding — the framework-wide conv
# semantics (torch/MXNet-faithful; equals 'SAME' at stride 1 for odd k).
def _lax_spatial(x, w, stride=1):
    p = w.shape[0] // 2
    return lax.conv_general_dilated(
        x, w[None], window_strides=(1, stride, stride),
        padding=((0, 0), (p, p), (p, p)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def _lax_temporal(x, w, stride=1):
    p = w.shape[0] // 2
    return lax.conv_general_dilated(
        x, w[:, None, None], window_strides=(stride, 1, 1),
        padding=((p, p), (0, 0), (0, 0)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def _rand(key, shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32)


class TestSpatialConv:
    @pytest.mark.parametrize("shape,co,k", [
        ((2, 3, 8, 8, 32), 48, 3),
        ((1, 2, 16, 12, 64), 40, 3),
        ((1, 1, 8, 8, 32), 32, 5),
    ])
    def test_forward_parity(self, shape, co, k):
        x = _rand(0, shape)
        w = _rand(1, (k, k, shape[-1], co)) / np.sqrt(k * k * shape[-1])
        got = ops.spatial_conv(x, w)
        ref = _lax_spatial(x, w)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)

    def test_grad_parity(self):
        x = _rand(0, (1, 2, 8, 8, 32))
        w = _rand(1, (3, 3, 32, 32)) / 17.0

        def loss_pallas(x, w):
            return (ops.spatial_conv(x, w) ** 2).sum()

        def loss_lax(x, w):
            return (_lax_spatial(x, w) ** 2).sum()

        gx_p, gw_p = jax.grad(loss_pallas, argnums=(0, 1))(x, w)
        gx_l, gw_l = jax.grad(loss_lax, argnums=(0, 1))(x, w)
        np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_l),
                                   rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_l),
                                   rtol=1e-3, atol=1e-3)

    def test_strided_falls_back(self):
        x = _rand(0, (1, 2, 8, 8, 32))
        w = _rand(1, (3, 3, 32, 32)) / 17.0
        got = ops.spatial_conv(x, w, stride=2)
        ref = _lax_spatial(x, w, stride=2)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_small_channels_fall_back(self):
        x = _rand(0, (1, 2, 8, 8, 3))
        w = _rand(1, (7, 7, 3, 16)) / 12.0
        got = ops.spatial_conv(x, w, stride=1)
        ref = _lax_spatial(x, w, stride=1)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


class TestTemporalConv:
    @pytest.mark.parametrize("shape,co,k", [
        ((2, 4, 6, 6, 32), 48, 3),
        ((1, 8, 4, 4, 64), 32, 3),
        ((1, 5, 4, 4, 32), 32, 5),
    ])
    def test_forward_parity(self, shape, co, k):
        x = _rand(0, shape)
        w = _rand(1, (k, shape[-1], co)) / np.sqrt(k * shape[-1])
        got = ops.temporal_conv(x, w)
        ref = _lax_temporal(x, w)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)

    def test_grad_parity(self):
        x = _rand(0, (2, 4, 4, 4, 32))
        w = _rand(1, (3, 32, 32)) / 10.0

        gx_p, gw_p = jax.grad(
            lambda x, w: (ops.temporal_conv(x, w) ** 2).sum(), argnums=(0, 1)
        )(x, w)
        gx_l, gw_l = jax.grad(
            lambda x, w: (_lax_temporal(x, w) ** 2).sum(), argnums=(0, 1)
        )(x, w)
        np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_l),
                                   rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_l),
                                   rtol=1e-3, atol=1e-3)

    def test_strided_falls_back(self):
        x = _rand(0, (1, 8, 4, 4, 32))
        w = _rand(1, (3, 32, 32)) / 10.0
        got = ops.temporal_conv(x, w, stride=2)
        ref = _lax_temporal(x, w, stride=2)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


class TestModelWithPallasBackend:
    def test_r2plus1d_block_pallas_matches_xla(self):
        from fastvideotagging_tpu.models.r2plus1d import R2Plus1D

        x = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 16, 16, 3))
        m_xla = R2Plus1D(stage_blocks=(1,), num_classes=4, backend="xla",
                         dtype=jnp.float32)
        m_pal = R2Plus1D(stage_blocks=(1,), num_classes=4, backend="pallas",
                         dtype=jnp.float32)
        variables = jax.jit(m_xla.init, static_argnames="train")(
            jax.random.PRNGKey(0), x, train=False)
        y_xla = jax.jit(lambda v, x: m_xla.apply(v, x, train=False))(variables, x)
        y_pal = jax.jit(lambda v, x: m_pal.apply(v, x, train=False))(variables, x)
        np.testing.assert_allclose(np.asarray(y_xla), np.asarray(y_pal),
                                   rtol=2e-3, atol=2e-3)
