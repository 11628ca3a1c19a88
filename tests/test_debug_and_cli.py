"""Debug utilities (§6.2) and CLI config construction (C18)."""

import jax.numpy as jnp
import numpy as np
import pytest

from fastvideotagging_tpu.utils import debug


class TestDebug:
    def test_nonfinite_report_clean(self):
        tree = {"a": jnp.ones((3,)), "b": {"c": jnp.zeros((2, 2))}}
        assert debug.nonfinite_report(tree) == []
        debug.assert_all_finite(tree)

    def test_nonfinite_report_finds_nans(self):
        tree = {"a": jnp.array([1.0, jnp.nan]), "b": jnp.array([jnp.inf])}
        report = debug.nonfinite_report(tree)
        assert len(report) == 2
        with pytest.raises(FloatingPointError):
            debug.assert_all_finite(tree, "params")

    def test_finite_guard(self):
        assert bool(debug.finite_guard({"a": jnp.ones(3)}))
        assert not bool(debug.finite_guard({"a": jnp.array([jnp.nan])}))
        # int leaves are ignored
        assert bool(debug.finite_guard({"a": jnp.arange(3)}))

    def test_debug_train_step_adds_finite_metric(self):
        from tests.test_train import make_state, synth_batch, tiny_cfg
        from fastvideotagging_tpu.train.loop import make_train_step
        import jax

        cfg = tiny_cfg()
        model, state = make_state(cfg)
        step = debug.debug_train_step(make_train_step(model, cfg, donate=False))
        _, metrics = step(state, synth_batch(cfg), jax.random.PRNGKey(0))
        assert bool(metrics["finite"])


class TestCliConfig:
    def _build(self, argv):
        import argparse

        from fastvideotagging_tpu.cli.common import (
            add_common_flags,
            add_train_flags,
            build_config,
        )

        p = argparse.ArgumentParser()
        add_common_flags(p)
        add_train_flags(p)
        return build_config(p.parse_args(argv))

    def test_defaults(self):
        cfg = self._build([])
        assert cfg.model.name == "r2plus1d_18"
        assert cfg.train.batch_size == 32

    def test_preset_plus_overrides(self):
        cfg = self._build([
            "--preset", "r2plus1d18_ucf101", "--batch-size", "8",
            "--model", "c3d", "--clip-len", "8", "--lr", "0.5",
            "--crop", "96", "96", "--model-parallel", "2",
        ])
        assert cfg.model.name == "c3d"
        assert cfg.train.batch_size == 8
        assert cfg.train.base_lr == 0.5
        assert cfg.data.sampler.clip_len == 8
        assert cfg.data.crop_hw == (96, 96)
        assert cfg.parallel.model_parallel == 2
        # untouched preset fields survive
        assert cfg.model.num_classes == 101

    def test_multilabel_preset(self):
        cfg = self._build(["--preset", "multilabel_tagging_1k"])
        assert cfg.model.multilabel and cfg.model.num_classes == 1000
        assert cfg.data.sampler.eval_mode == "dense"
