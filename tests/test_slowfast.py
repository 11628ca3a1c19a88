"""SlowFast dual-pathway model + channel (tensor) parallelism ([B:11])."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastvideotagging_tpu.config import (
    ClipSamplerConfig,
    DataConfig,
    ExperimentConfig,
    ModelConfig,
    TrainConfig,
)
from fastvideotagging_tpu.models import get_model
from fastvideotagging_tpu.parallel import make_mesh, shard_batch
from fastvideotagging_tpu.parallel.mesh import (
    MODEL_AXIS,
    param_partition_specs,
    shard_train_state,
)
from fastvideotagging_tpu.train import lr as lr_lib
from fastvideotagging_tpu.train.loop import make_train_step
from fastvideotagging_tpu.train.state import create_train_state
from tests.test_train import synth_batch


def sf_model(shard_axis=None):
    return get_model("slowfast_r2plus1d", num_classes=3, alpha=2, beta=8,
                     base_width=16, stage_blocks=(1, 1), dropout=0.0,
                     dtype=jnp.float32, shard_axis=shard_axis)


class TestSlowFastModel:
    def test_forward_shapes(self):
        model = sf_model()
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 32, 32, 3))
        variables = jax.jit(model.init, static_argnames="train")(
            jax.random.PRNGKey(0), x, train=False)
        logits = jax.jit(lambda v, x: model.apply(v, x, train=False))(
            variables, x)
        assert logits.shape == (2, 3)
        assert np.isfinite(np.asarray(logits)).all()

    def test_full_size_shapes(self):
        model = get_model("slowfast_r2plus1d", num_classes=400)
        x = jnp.zeros((1, 32, 224, 224, 3), jnp.float32)
        out = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0), x, train=False))
        logits = jax.eval_shape(
            lambda v: model.apply(v, x, train=False,
                                  mutable=["batch_stats"]), out)[0]
        assert logits.shape == (1, 400)

    def test_clip_len_must_divide_alpha(self):
        model = get_model("slowfast_r2plus1d", num_classes=4, alpha=4)
        x = jnp.zeros((1, 6, 32, 32, 3), jnp.float32)
        with pytest.raises(ValueError):
            jax.eval_shape(
                lambda: model.init(jax.random.PRNGKey(0), x, train=False))


class TestSlowFastTPUVariant:
    """slowfast_r2plus1d_tpu: time-to-channel packed fast pathway."""

    def sf_tpu(self, **kw):
        return get_model("slowfast_r2plus1d_tpu", num_classes=3, alpha=2,
                         beta=8, base_width=16, stage_blocks=(1, 1),
                         dropout=0.0, dtype=jnp.float32, **kw)

    def test_forward_shapes(self):
        model = self.sf_tpu()
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 32, 32, 3))
        variables = jax.jit(model.init, static_argnames="train")(
            jax.random.PRNGKey(0), x, train=False)
        logits = jax.jit(lambda v, x: model.apply(v, x, train=False))(
            variables, x)
        assert logits.shape == (2, 3)
        assert np.isfinite(np.asarray(logits)).all()

    def test_fast_pathway_channels_are_packed(self):
        """Every fast conv (incl. the stem) must see alpha*C channels —
        the lane-occupancy fix is the variant's entire reason to exist."""
        model = self.sf_tpu()
        x = jnp.zeros((1, 4, 32, 32, 3), jnp.float32)
        variables = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0), x, train=False))
        p = variables["params"]
        alpha, beta, base = 2, 8, 16
        cf = max(base // beta, 8)
        # packed stem: 3x7x7 over alpha*3 input channels -> alpha*cf out
        assert p["fast_stem"]["kernel"].shape == (3, 7, 7, alpha * 3,
                                                  alpha * cf)
        # packed block widths; faithful model would have cf here
        assert p["fast_s0_b0"]["spatial1"]["kernel"].shape[-1] == alpha * cf
        # laterals stride-free 3x1x1 (time axes already aligned), 2*cf out
        assert p["lateral0"]["kernel"].shape == (3, 1, 1, alpha * cf, 2 * cf)
        # the slow trunk is UNCHANGED vs the faithful model (same concat
        # widths): slow stage-0 block input = base + 2*cf
        assert p["slow_s0_b0"]["spatial1"]["kernel"].shape[-2] == base + 2 * cf

    def test_clip_len_must_divide_alpha(self):
        model = get_model("slowfast_r2plus1d_tpu", num_classes=4, alpha=4)
        x = jnp.zeros((1, 6, 32, 32, 3), jnp.float32)
        with pytest.raises(ValueError):
            jax.eval_shape(
                lambda: model.init(jax.random.PRNGKey(0), x, train=False))

    def test_train_step_moves_params(self):
        cfg = ExperimentConfig(
            model=ModelConfig(name="slowfast_r2plus1d_tpu", num_classes=3,
                              compute_dtype="float32", dropout=0.0),
            data=DataConfig(source_hw=(48, 64), resize_hw=(40, 56),
                            crop_hw=(32, 32),
                            sampler=ClipSamplerConfig(clip_len=4, stride=2)),
            train=TrainConfig(batch_size=4, base_lr=0.05, weight_decay=0.0),
        )
        model = get_model("slowfast_r2plus1d_tpu", num_classes=3, alpha=2,
                          beta=8, base_width=16, stage_blocks=(1, 1),
                          dropout=0.0, dtype=jnp.float32)
        sample = jnp.zeros((1, 4, 32, 32, 3), jnp.float32)
        tx = lr_lib.make_optimizer(cfg.train, steps_per_epoch=10)
        state = create_train_state(model, tx, jax.random.PRNGKey(0), sample)
        step = make_train_step(model, cfg, donate=False)
        new_state, metrics = step(state, synth_batch(cfg),
                                  jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["loss"]))
        moved = [not np.allclose(np.asarray(a), np.asarray(b))
                 for a, b in zip(jax.tree.leaves(state.params),
                                 jax.tree.leaves(new_state.params))]
        assert any(moved)


@pytest.mark.skipif(len(jax.devices()) < 8,
                    reason="needs the 8-device CPU mesh")
class TestChannelParallel:
    def _cfg(self):
        return ExperimentConfig(
            model=ModelConfig(name="slowfast_r2plus1d", num_classes=3,
                              compute_dtype="float32"),
            data=DataConfig(source_hw=(48, 64), resize_hw=(40, 56),
                            crop_hw=(32, 32),
                            sampler=ClipSamplerConfig(clip_len=4, stride=2)),
            train=TrainConfig(batch_size=8, base_lr=0.05, weight_decay=0.0),
        )

    def test_channel_sharded_train_step(self):
        cfg = self._cfg()
        mesh = make_mesh(4, 2)
        model = sf_model(shard_axis=MODEL_AXIS)
        sample = jnp.zeros((1, 4, 32, 32, 3), jnp.float32)

        # Boxed (abstract) init for the partition specs, real init for values.
        boxed = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0), sample, train=False))
        specs = param_partition_specs(boxed)["params"]

        tx = lr_lib.make_optimizer(cfg.train, steps_per_epoch=10)
        state = create_train_state(model, tx, jax.random.PRNGKey(0), sample)
        state = shard_train_state(state, mesh, specs)

        # Conv kernels must actually be sharded over the model axis.
        k = state.params["slow_stem"]["kernel"]
        assert MODEL_AXIS in str(k.sharding.spec), k.sharding

        step = make_train_step(model, cfg, donate=False)
        batch = shard_batch(mesh, synth_batch(cfg))
        new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["loss"]))

        # Channel-sharded result must match the unsharded single-device run.
        dev = jax.devices()[0]
        state_1 = jax.device_put(jax.device_get(state), dev)
        batch_1 = jax.tree.map(lambda x: jax.device_put(np.asarray(x), dev),
                               jax.device_get(batch))
        _, metrics_1 = step(state_1, batch_1, jax.random.PRNGKey(1))
        assert float(metrics["loss"]) == pytest.approx(
            float(metrics_1["loss"]), rel=1e-4)

    def test_channel_sharded_packed_variant(self):
        """The `_tpu` packed-fast variant must shard over the model axis
        identically — it is the TP flagship's production form."""
        cfg = self._cfg()
        cfg = ExperimentConfig(
            model=ModelConfig(name="slowfast_r2plus1d_tpu", num_classes=3,
                              compute_dtype="float32"),
            data=cfg.data, train=cfg.train)
        mesh = make_mesh(4, 2)
        model = get_model("slowfast_r2plus1d_tpu", num_classes=3, alpha=2,
                          beta=8, base_width=16, stage_blocks=(1, 1),
                          dropout=0.0, dtype=jnp.float32,
                          shard_axis=MODEL_AXIS)
        sample = jnp.zeros((1, 4, 32, 32, 3), jnp.float32)
        boxed = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0), sample, train=False))
        specs = param_partition_specs(boxed)["params"]
        tx = lr_lib.make_optimizer(cfg.train, steps_per_epoch=10)
        state = create_train_state(model, tx, jax.random.PRNGKey(0), sample)
        state = shard_train_state(state, mesh, specs)
        assert MODEL_AXIS in str(
            state.params["fast_stem"]["kernel"].sharding.spec)

        step = make_train_step(model, cfg, donate=False)
        batch = shard_batch(mesh, synth_batch(cfg))
        _, metrics = step(state, batch, jax.random.PRNGKey(1))

        dev = jax.devices()[0]
        state_1 = jax.device_put(jax.device_get(state), dev)
        batch_1 = jax.tree.map(lambda x: jax.device_put(np.asarray(x), dev),
                               jax.device_get(batch))
        _, metrics_1 = step(state_1, batch_1, jax.random.PRNGKey(1))
        assert float(metrics["loss"]) == pytest.approx(
            float(metrics_1["loss"]), rel=1e-4)
