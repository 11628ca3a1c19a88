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


@pytest.mark.parametrize("n_shards", [2, 4])
def test_time_sharded_train_step_matches_unsharded(n_shards):
    """TRAIN-mode temporal sharding (train/time_sharded.py): one full step
    (uint8 preprocess -> halo-conv fwd -> bwd -> grad psum over `time` ->
    SGD) must match the unsharded train/loop.py step — loss, top1, updated
    params, and BN batch_stats (psync'd over time == global (B,T,H,W)
    statistics) all to float tolerance."""
    import functools

    from fastvideotagging_tpu.config import (
        ClipSamplerConfig, DataConfig, ExperimentConfig, ModelConfig,
        TrainConfig,
    )
    from fastvideotagging_tpu.models.r2plus1d import R2Plus1D
    from fastvideotagging_tpu.train import lr as lr_lib
    from fastvideotagging_tpu.train.loop import make_train_step
    from fastvideotagging_tpu.train.state import create_train_state
    from fastvideotagging_tpu.train.time_sharded import (
        make_time_sharded_train_step,
    )

    t = 8 * n_shards  # T/n divisible by the 4-stage total temporal stride
    cfg = ExperimentConfig(
        model=ModelConfig(name="r2plus1d_18", num_classes=5,
                          compute_dtype="float32", dropout=0.0),
        data=DataConfig(source_hw=(20, 20), resize_hw=(20, 20),
                        crop_hw=(16, 16),
                        sampler=ClipSamplerConfig(clip_len=t)),
        train=TrainConfig(batch_size=2, base_lr=0.05),
    )
    factory = functools.partial(R2Plus1D, stage_blocks=(1, 1, 1, 1),
                                num_classes=5, dtype=jnp.float32, dropout=0.0)

    rng = np.random.default_rng(0)
    batch = {
        "frames": jnp.asarray(rng.integers(0, 255, (2, t, 20, 20, 3)),
                              jnp.uint8),
        "labels": jnp.asarray([1, 3], jnp.int32),
        "crop_tops": jnp.asarray([0, 3], jnp.int32),
        "crop_lefts": jnp.asarray([2, 1], jnp.int32),
        "flips": jnp.asarray([True, False]),
        "weights": jnp.ones((2,), jnp.float32),
    }

    model_ref = factory()
    tx = lr_lib.make_optimizer(cfg.train, steps_per_epoch=10)
    sample = jnp.zeros((1, t, 16, 16, 3), jnp.float32)
    state0 = create_train_state(model_ref, tx, jax.random.PRNGKey(0), sample)

    ref_step = make_train_step(model_ref, cfg, donate=False)
    ref_state, ref_metrics = ref_step(state0, batch, jax.random.PRNGKey(9))

    mesh = Mesh(np.array(jax.devices()[:n_shards]), ("time",))
    sp_step, _ = make_time_sharded_train_step(factory, cfg, mesh)
    sp_state, sp_metrics = sp_step(state0, batch, jax.random.PRNGKey(9))

    # rel=1e-4: the residual is float accumulation ORDER (per-shard partial
    # BN-stat/pool sums psum'd vs one-pass reductions) — observed ~1e-5 rel
    # on this 16-layer f32 graph; anything semantic (e.g. a non-psync'd BN)
    # shows up at 1e-2 rel.
    assert float(sp_metrics["loss"]) == pytest.approx(
        float(ref_metrics["loss"]), rel=1e-4)
    assert float(sp_metrics["top1"]) == float(ref_metrics["top1"])
    # updated params: transitively pins the psum'd gradients
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(ref_state.params)[0],
            jax.tree_util.tree_flatten_with_path(sp_state.params)[0]):
        assert pa == pb
        # rtol/atol sized to float accumulation-order noise (observed up
        # to ~4e-5 abs on BN biases: lr * grad noise through the deep
        # BN-stat backward's cancellation chains, sign-random). The bug
        # classes this test exists for are SCALE errors — a missing BN
        # psync or a psum/pmean mix-up measured 0.12..0.5 RELATIVE before
        # their fixes — two orders above these bounds.
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-4,
            err_msg=f"param mismatch at {jax.tree_util.keystr(pa)}")
    # grads directly, via the first-step SGD-momentum buffer (mu == grad
    # + weight-decay term at step 1 — a much stronger check than params,
    # where lr scales differences below tolerance)
    mu_ref = [l for l in jax.tree.leaves(ref_state.opt_state)
              if hasattr(l, "shape")]
    mu_sp = [l for l in jax.tree.leaves(sp_state.opt_state)
             if hasattr(l, "shape")]
    # momentum = the RAW grad at step 1 (no lr scaling), so its noise
    # floor is lr^-1 x the params' (observed 4e-3 abs on O(0.1-1) grads);
    # a reduction-scale bug moves every large grad by its own magnitude.
    for a, b in zip(mu_ref, mu_sp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=1e-2)
    # BN running stats: psync'd batch statistics == global statistics
    for a, b in zip(jax.tree.leaves(ref_state.batch_stats),
                    jax.tree.leaves(sp_state.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=1e-5)


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
