"""Temporal-axis sharding with ppermute halo exchange (SURVEY.md §6.7)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax
from jax.sharding import Mesh

from fastvideotagging_tpu.parallel.temporal import temporal_conv_time_sharded



pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device CPU mesh")

def _ref_conv(x, w):
    return lax.conv_general_dilated(
        x, w[:, None, None], (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


@pytest.fixture()
def time_mesh():
    return Mesh(np.array(jax.devices()).reshape(8), ("time",))


@pytest.mark.parametrize("t,k", [(16, 3), (32, 5), (8, 1)])
def test_matches_unsharded(time_mesh, t, k):
    x = jax.random.normal(jax.random.PRNGKey(0), (2, t, 4, 4, 32))
    w = jax.random.normal(jax.random.PRNGKey(1), (k, 32, 16)) / (k * 32) ** 0.5
    got = temporal_conv_time_sharded(x, w, time_mesh, "time")
    ref = _ref_conv(x, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_boundary_zero_padding_semantics(time_mesh):
    """First/last shards must see zeros, not ring-wrapped frames."""
    x = jnp.ones((1, 16, 2, 2, 32))
    w = jnp.ones((3, 32, 1))
    got = np.asarray(temporal_conv_time_sharded(x, w, time_mesh, "time"))
    ref = np.asarray(_ref_conv(x, w))
    # edges see 2/3 of the mass, interior 3/3 — any wraparound would break this
    np.testing.assert_allclose(got, ref, rtol=1e-5)
    assert got[0, 0, 0, 0, 0] == pytest.approx(2 * 32)
    assert got[0, 8, 0, 0, 0] == pytest.approx(3 * 32)


def test_too_many_shards_raises(time_mesh):
    x = jnp.ones((1, 8, 2, 2, 32))  # T_local = 1 < halo 2
    w = jnp.ones((5, 32, 1))
    with pytest.raises(ValueError):
        temporal_conv_time_sharded(x, w, time_mesh, "time")
