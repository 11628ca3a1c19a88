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


def test_strided_halo_conv_matches_unsharded(time_mesh):
    """Stage-entry form: temporal stride 2 with halo exchange."""
    import functools

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from fastvideotagging_tpu.parallel.temporal import halo_temporal_conv

    x = jax.random.normal(jax.random.PRNGKey(2), (2, 32, 4, 4, 16))
    w = jax.random.normal(jax.random.PRNGKey(3), (3, 16, 8)) / 7.0
    fn = shard_map(
        functools.partial(halo_temporal_conv, axis_name="time", stride=2),
        mesh=time_mesh, in_specs=(P(None, "time"), P()),
        out_specs=P(None, "time"))
    got = jax.jit(fn)(x, w)
    ref = lax.conv_general_dilated(
        x, w[:, None, None], (2, 1, 1), ((1, 1), (0, 0), (0, 0)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    assert got.shape == ref.shape == (2, 16, 4, 4, 8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_long_clip_whole_model_exact():
    """Whole r2plus1d_18 forward with T sharded over 4 devices == unsharded.

    The sequence-parallel long-clip path (evaluation/long_clip.py): temporal
    convs halo-exchange at every depth (incl. strided stage entries), pooling
    psums over the time axis, head applied once.
    """
    from fastvideotagging_tpu.evaluation.long_clip import (
        make_time_mesh, score_long_clip,
    )
    from fastvideotagging_tpu.models import get_model

    def factory(**kw):
        return get_model("r2plus1d_18", num_classes=5, dtype=jnp.float32,
                         dropout=0.0, **kw)

    model = factory()
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 32, 32, 32, 3),
                          jnp.float32)
    variables = jax.jit(model.init, static_argnames="train")(
        jax.random.PRNGKey(0), x[:, :8], train=False)
    ref_logits = jax.jit(
        lambda v, x: model.apply(v, x, train=False))(variables, x)
    from fastvideotagging_tpu.models import heads as _heads

    ref = np.asarray(_heads.predict_scores(ref_logits, False))

    mesh = make_time_mesh(4)
    got = np.asarray(score_long_clip(factory, variables, x, mesh))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_long_clip_rejects_bad_shapes():
    from fastvideotagging_tpu.evaluation.long_clip import (
        make_time_mesh, score_long_clip,
    )
    from fastvideotagging_tpu.models import get_model

    def factory(**kw):
        return get_model("r2plus1d_18", num_classes=5, **kw)

    mesh = make_time_mesh(4)
    x = jnp.zeros((1, 20, 32, 32, 3))  # 20 % 4 == 0 but (20/4) % 8 != 0
    with pytest.raises(ValueError, match="divisible"):
        score_long_clip(factory, {}, x, mesh)
