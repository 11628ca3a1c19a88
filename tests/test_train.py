"""Train-loop tier: jitted step, overfit-one-batch, schedules, checkpointing."""

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
from fastvideotagging_tpu.train import lr as lr_lib
from fastvideotagging_tpu.train.checkpoint import CheckpointManager, export_weights, load_weights
from fastvideotagging_tpu.train.loop import make_sample_batch, make_train_step
from fastvideotagging_tpu.train.state import create_train_state


def tiny_cfg(multilabel=False, num_classes=3, **train_kw):
    return ExperimentConfig(
        model=ModelConfig(name="tiny3d", num_classes=num_classes,
                          multilabel=multilabel, compute_dtype="float32"),
        data=DataConfig(source_hw=(48, 64), resize_hw=(40, 56), crop_hw=(32, 32),
                        sampler=ClipSamplerConfig(clip_len=4, stride=2)),
        train=TrainConfig(batch_size=8, base_lr=0.05, weight_decay=0.0,
                          **train_kw),
    )


def make_state(cfg, rng_seed=0):
    model = get_model(cfg.model.name, num_classes=cfg.model.num_classes,
                      dtype=jnp.dtype(cfg.model.compute_dtype))
    tx = lr_lib.make_optimizer(cfg.train, steps_per_epoch=10)
    ch, cw = cfg.data.crop_hw
    sample = jnp.zeros((1, cfg.data.sampler.clip_len, ch, cw, 3), jnp.float32)
    state = create_train_state(model, tx, jax.random.PRNGKey(rng_seed), sample)
    return model, state


def synth_batch(cfg, seed=0):
    """A contentful batch whose labels are recoverable from the frames."""
    from fastvideotagging_tpu.data.synthetic import make_frames

    rng = np.random.Generator(np.random.Philox(key=np.uint64(seed)))
    b = cfg.train.batch_size
    t = cfg.data.sampler.clip_len
    h, w = cfg.data.source_hw
    frames = np.stack([
        make_frames(i % cfg.model.num_classes, t, h, w, seed=seed)
        for i in range(b)
    ])
    labels = np.asarray([i % cfg.model.num_classes for i in range(b)], np.int32)
    batch = {
        "frames": frames,
        "labels": labels,
        "crop_tops": rng.integers(0, 8, size=(b,)).astype(np.int32),
        "crop_lefts": rng.integers(0, 24, size=(b,)).astype(np.int32),
        "flips": np.zeros((b,), bool),
        "weights": np.ones((b,), np.float32),
    }
    if cfg.model.multilabel:
        mh = np.zeros((b, cfg.model.num_classes), np.float32)
        mh[np.arange(b), labels] = 1.0
        batch["multihot"] = mh
    return batch


class TestTrainStep:
    def test_single_step_runs_and_is_finite(self):
        cfg = tiny_cfg()
        model, state = make_state(cfg)
        step = make_train_step(model, cfg, donate=False)
        batch = synth_batch(cfg)
        new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["loss"]))
        assert 0.0 <= float(metrics["top1"]) <= 1.0
        assert int(new_state.step) == 1
        # params actually changed
        diffs = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                             state.params, new_state.params)
        assert max(jax.tree.leaves(diffs)) > 0

    def test_multilabel_step(self):
        cfg = tiny_cfg(multilabel=True)
        model, state = make_state(cfg)
        step = make_train_step(model, cfg, donate=False)
        batch = synth_batch(cfg)
        _, metrics = step(state, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["loss"]))
        assert "top1" not in metrics

    def test_overfit_one_batch(self):
        """SURVEY.md §5.4: loss collapses on a single repeated batch."""
        cfg = tiny_cfg()
        model, state = make_state(cfg)
        step = make_train_step(model, cfg)  # donated state: production path
        batch = synth_batch(cfg)
        first = None
        for i in range(40):
            state, metrics = step(state, batch, jax.random.PRNGKey(0))
            if first is None:
                first = float(metrics["loss"])
        last = float(metrics["loss"])
        assert last < first * 0.2, (first, last)
        assert float(metrics["top1"]) == 1.0

    def test_grad_accumulation_defers_update(self):
        """With grad_accum_steps=2: params frozen after microstep 1, updated
        after microstep 2. (Exact big-batch equivalence does not hold with
        BatchNorm — train-mode BN normalizes over the actual microbatch.)"""
        cfg = tiny_cfg(grad_accum_steps=2)
        model, state = make_state(cfg)
        step = make_train_step(model, cfg, donate=False)
        p0 = jax.device_get(state.params)

        state, _ = step(state, synth_batch(cfg, seed=1), jax.random.PRNGKey(0))
        for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(state.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        state, _ = step(state, synth_batch(cfg, seed=2), jax.random.PRNGKey(0))
        diffs = [float(np.abs(np.asarray(a) - np.asarray(b)).max())
                 for a, b in zip(jax.tree.leaves(p0),
                                 jax.tree.leaves(state.params))]
        assert max(diffs) > 0


class TestSchedules:
    def test_multifactor_golden(self):
        cfg = TrainConfig(base_lr=0.1, lr_steps=(2, 4), lr_decay=0.1)
        sched = lr_lib.multifactor_schedule(cfg, steps_per_epoch=10)
        assert float(sched(0)) == pytest.approx(0.1)
        assert float(sched(19)) == pytest.approx(0.1)
        assert float(sched(20)) == pytest.approx(0.01)
        assert float(sched(40)) == pytest.approx(0.001)

    def test_warmup(self):
        cfg = TrainConfig(base_lr=0.1, warmup_epochs=1, lr_steps=(2,))
        sched = lr_lib.multifactor_schedule(cfg, steps_per_epoch=10)
        assert float(sched(0)) == pytest.approx(0.0)
        assert float(sched(5)) == pytest.approx(0.05)
        assert float(sched(10)) == pytest.approx(0.1)
        # Decay boundaries are ABSOLUTE epochs: with warmup the epoch-2 drop
        # must still fire at step 20, not warmup_steps later.
        assert float(sched(19)) == pytest.approx(0.1)
        assert float(sched(20)) == pytest.approx(0.01)

    def test_warmup_overlapping_decay_epoch_rejected(self):
        # A decay boundary inside warmup would clamp to <= 0 and apply the
        # factor from the first post-warmup step — must raise instead.
        cfg = TrainConfig(base_lr=0.1, warmup_epochs=12, lr_steps=(10, 20))
        with pytest.raises(ValueError, match="warmup_epochs"):
            lr_lib.multifactor_schedule(cfg, steps_per_epoch=10)


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        cfg = tiny_cfg()
        model, state = make_state(cfg)
        step = make_train_step(model, cfg, donate=False)
        state, _ = step(state, synth_batch(cfg), jax.random.PRNGKey(1))

        mgr = CheckpointManager(str(tmp_path / "ckpt"))
        mgr.save(int(state.step), jax.device_get(state), {"epoch": 3})
        mgr.wait()
        assert mgr.latest_step() == 1

        _, fresh = make_state(cfg, rng_seed=99)
        restored, extra = mgr.restore(fresh)
        assert int(extra["epoch"]) == 3
        for a, b in zip(jax.tree.leaves(restored.params),
                        jax.tree.leaves(state.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(restored.opt_state),
                        jax.tree.leaves(state.opt_state)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        mgr.close()

    def test_same_step_resave_takes_newest_epoch(self, tmp_path):
        """A mid-epoch save (epoch-1) followed by the epoch-end save at the
        SAME global step must yield the epoch-end metadata — orbax's
        should_save would otherwise silently drop the second save and a
        resume would replay the whole completed epoch."""
        cfg = tiny_cfg()
        model, state = make_state(cfg)
        step = make_train_step(model, cfg, donate=False)
        state, _ = step(state, synth_batch(cfg), jax.random.PRNGKey(1))

        mgr = CheckpointManager(str(tmp_path / "ckpt"))
        mgr.save(int(state.step), jax.device_get(state), {"epoch": 4})
        mgr.save(int(state.step), jax.device_get(state), {"epoch": 5})
        mgr.wait()
        _, fresh = make_state(cfg, rng_seed=99)
        _, extra = mgr.restore(fresh)
        assert int(extra["epoch"]) == 5
        mgr.close()

    def test_weights_export(self, tmp_path):
        cfg = tiny_cfg()
        _, state = make_state(cfg)
        path = str(tmp_path / "weights")
        export_weights(path, jax.device_get(state.params),
                       jax.device_get(state.batch_stats))
        loaded = load_weights(path)
        for a, b in zip(jax.tree.leaves(loaded["params"]),
                        jax.tree.leaves(state.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_restore_weights_ignores_optimizer_shape(self, tmp_path):
        """Weights-only restore must work WITHOUT reconstructing the
        training run's optimizer tree — a checkpoint trained with
        --clip-grad-norm (extra opt-state node) must restore into an eval
        process that knows nothing about clipping."""
        cfg = tiny_cfg(clip_grad_norm=1.0)
        model, state = make_state(cfg)
        step = make_train_step(model, cfg, donate=False)
        state, _ = step(state, synth_batch(cfg), jax.random.PRNGKey(1))

        mgr = CheckpointManager(str(tmp_path / "ckpt"))
        mgr.save(int(state.step), jax.device_get(state), {"epoch": 1})
        mgr.wait()
        variables, restored_step = mgr.restore_weights()
        assert restored_step == int(state.step)
        assert set(variables) == {"params", "batch_stats"}
        for a, b in zip(jax.tree.leaves(variables["params"]),
                        jax.tree.leaves(state.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        mgr.close()


class TestGradClip:
    def test_clip_bounds_first_update(self):
        """With zero momentum history the first SGD update is exactly
        -lr * clipped_grad, so its global norm is bounded by lr * clip."""
        cfg = TrainConfig(base_lr=0.1, clip_grad_norm=1.0, weight_decay=0.0,
                          warmup_epochs=0)
        tx = lr_lib.make_optimizer(cfg, steps_per_epoch=10)
        params = {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}
        opt_state = tx.init(params)
        grads = jax.tree.map(lambda p: 1e6 * jnp.ones_like(p), params)
        updates, _ = tx.update(grads, opt_state, params)
        import optax
        norm = float(optax.global_norm(updates))
        assert norm <= 0.1 * 1.0 + 1e-6
        assert norm > 0.09  # clipped to the boundary, not zeroed

    def test_clip_disabled_by_default(self):
        cfg = TrainConfig(base_lr=0.1, weight_decay=0.0, warmup_epochs=0)
        tx = lr_lib.make_optimizer(cfg, steps_per_epoch=10)
        params = {"w": jnp.ones((2,))}
        updates, _ = tx.update({"w": jnp.full((2,), 100.0)},
                               tx.init(params), params)
        np.testing.assert_allclose(np.asarray(updates["w"]),
                                   -0.1 * np.full((2,), 100.0), rtol=1e-6)

    def test_s3d_diverges_without_clip_trains_with_it(self):
        """The measured s3d pathology (PERF.md / VERDICT r3): global grad
        norm ~2.6e5 at init on tiny batches. One SGD step at lr=0.01
        unclipped destroys the params; the clipped step keeps the next
        forward finite and the params near init."""
        import optax
        from fastvideotagging_tpu.models.zoo import get_model as zoo_get

        model = zoo_get("s3d", num_classes=2)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 32, 32, 3))
        y = jnp.array([0, 1])
        variables = model.init(jax.random.PRNGKey(1),
                               jnp.zeros((1, 8, 32, 32, 3)))
        params, stats = variables["params"], variables["batch_stats"]

        def loss_fn(p):
            logits, _ = model.apply(
                {"params": p, "batch_stats": stats}, x, train=True,
                mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(2)})
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y).mean()

        grads = jax.jit(jax.grad(loss_fn))(params)
        gnorm = float(optax.global_norm(grads))
        assert gnorm > 1e3  # the pathology is real at this geometry

        cfg = TrainConfig(base_lr=0.01, clip_grad_norm=1.0,
                          weight_decay=0.0, warmup_epochs=0)
        tx = lr_lib.make_optimizer(cfg, steps_per_epoch=1)
        updates, _ = tx.update(grads, tx.init(params), params)
        new_params = optax.apply_updates(params, updates)
        logits = jax.jit(lambda p: model.apply(
            {"params": p, "batch_stats": stats},
            x, train=False))(new_params)
        assert bool(jnp.all(jnp.isfinite(logits)))
        assert float(optax.global_norm(updates)) <= 0.01 + 1e-6
