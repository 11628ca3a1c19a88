"""Eval aggregation and the tag() entrypoint (SURVEY.md C16/C17)."""

import jax
import jax.numpy as jnp
import numpy as np

from fastvideotagging_tpu.config import (
    ClipSamplerConfig,
    DataConfig,
    ExperimentConfig,
    ModelConfig,
)
from fastvideotagging_tpu.data.pipeline import ClipDataset
from fastvideotagging_tpu.data.ucf101 import load_video_list
from fastvideotagging_tpu.evaluation.evaluate import evaluate, evaluate_video_scores
from fastvideotagging_tpu.evaluation.tagger import Tagger
from fastvideotagging_tpu.models import get_model


def eval_cfg(multilabel=False, eval_mode="center", num_classes=3):
    return ExperimentConfig(
        model=ModelConfig(name="tiny3d", num_classes=num_classes,
                          multilabel=multilabel, compute_dtype="float32"),
        data=DataConfig(source_hw=(48, 64), resize_hw=(40, 56), crop_hw=(32, 32),
                        sampler=ClipSamplerConfig(clip_len=4, stride=2,
                                                  eval_mode=eval_mode,
                                                  num_eval_clips=3)),
    )


def init_variables(cfg, seed=0):
    model = get_model(cfg.model.name, num_classes=cfg.model.num_classes,
                      dtype=jnp.float32)
    x = jnp.zeros((1, cfg.data.sampler.clip_len) + tuple(cfg.data.crop_hw) + (3,),
                  jnp.float32)
    variables = jax.jit(model.init, static_argnames="train")(
        jax.random.PRNGKey(seed), x, train=False)
    return model, variables


class TestEvaluate:
    def test_single_label_metrics(self, synthetic_dataset):
        root, list_path = synthetic_dataset
        records = load_video_list(list_path, root=root)
        cfg = eval_cfg()
        model, variables = init_variables(cfg)
        ds = ClipDataset(records, cfg.data, mode="eval")
        out = evaluate(model, variables, ds, cfg, clip_batch=4)
        assert out["num_videos"] == 6
        assert 0.0 <= out["top1"] <= 1.0
        assert out["top5"] >= out["top1"]

    def test_scores_deterministic_bitwise(self, synthetic_dataset):
        root, list_path = synthetic_dataset
        records = load_video_list(list_path, root=root)[:2]
        cfg = eval_cfg(eval_mode="uniform")
        model, variables = init_variables(cfg)
        ds = ClipDataset(records, cfg.data, mode="eval")
        a, _ = evaluate_video_scores(model, variables, ds, cfg, clip_batch=2)
        b, _ = evaluate_video_scores(model, variables, ds, cfg, clip_batch=2)
        np.testing.assert_array_equal(a, b)

    def test_multilabel_metrics(self, synthetic_dataset):
        import dataclasses

        root, list_path = synthetic_dataset
        # multilabel eval needs TAGGED records (tag-less ones are rejected
        # by the all-zero-multihot guard): derive tags from the class ids.
        records = [dataclasses.replace(r, tags=(r.label,))
                   for r in load_video_list(list_path, root=root)[:3]]
        cfg = eval_cfg(multilabel=True)
        model, variables = init_variables(cfg)
        ds = ClipDataset(records, cfg.data, mode="eval", num_tags=3)
        out = evaluate(model, variables, ds, cfg, clip_batch=2)
        assert "mAP" in out and "macro_f1" in out


class TestTagger:
    def test_tag_returns_sorted_results(self, synthetic_dataset):
        root, list_path = synthetic_dataset
        records = load_video_list(list_path, root=root)
        cfg = eval_cfg(multilabel=True, eval_mode="dense")
        _, variables = init_variables(cfg)
        tagger = Tagger(cfg, variables, tag_names=["cat", "dog", "bird"],
                        clip_batch=2)
        results = tagger.tag(records[0].path, threshold=0.0)
        assert len(results) == 3
        scores = [r.score for r in results]
        assert scores == sorted(scores, reverse=True)
        assert all(0.0 <= s <= 1.0 for s in scores)
        assert {r.tag for r in results} == {"cat", "dog", "bird"}

    def test_threshold_and_topk(self, synthetic_dataset):
        root, list_path = synthetic_dataset
        records = load_video_list(list_path, root=root)
        cfg = eval_cfg(multilabel=True, eval_mode="dense")
        _, variables = init_variables(cfg)
        tagger = Tagger(cfg, variables, clip_batch=2)
        full = tagger.tag(records[0].path, threshold=0.0)
        top1 = tagger.tag(records[0].path, threshold=0.0, top_k=1)
        assert len(top1) == 1 and top1[0].tag == full[0].tag
        high = tagger.tag(records[0].path, threshold=1.1)
        assert high == []

    def test_deterministic(self, synthetic_dataset):
        root, list_path = synthetic_dataset
        records = load_video_list(list_path, root=root)
        cfg = eval_cfg(multilabel=True, eval_mode="dense")
        _, variables = init_variables(cfg)
        tagger = Tagger(cfg, variables, clip_batch=2)
        a = tagger.video_scores(records[1].path)
        b = tagger.video_scores(records[1].path)
        np.testing.assert_array_equal(a, b)

    def test_int8_serving_path(self, synthetic_dataset):
        """Tagger(int8=True): self-calibrating quantized engine end to end
        on a real decoded video; scores finite, valid, deterministic."""
        import pytest

        root, list_path = synthetic_dataset
        records = load_video_list(list_path, root=root)
        cfg = ExperimentConfig(
            model=ModelConfig(name="r2plus1d_18", num_classes=3,
                              multilabel=True, compute_dtype="bfloat16"),
            data=DataConfig(source_hw=(48, 64), resize_hw=(40, 56),
                            crop_hw=(32, 32),
                            sampler=ClipSamplerConfig(clip_len=4, stride=2,
                                                      eval_mode="uniform",
                                                      num_eval_clips=2)),
        )
        model = get_model("r2plus1d_18", num_classes=3)
        x = jnp.zeros((1, 4, 32, 32, 3), jnp.float32)
        variables = jax.jit(model.init, static_argnames="train")(
            jax.random.PRNGKey(0), x, train=False)
        tagger = Tagger(cfg, variables, clip_batch=2, int8=True)
        a = tagger.video_scores(records[0].path)
        assert a.shape == (3,) and np.isfinite(a).all()
        assert (a >= 0).all() and (a <= 1).all()
        b = tagger.video_scores(records[0].path)
        np.testing.assert_array_equal(a, b)
        # unsupported family fails loudly at construction
        tiny_cfg = eval_cfg(multilabel=True)
        _, tiny_vars = init_variables(tiny_cfg)
        with pytest.raises(ValueError, match="int8 tagging covers"):
            Tagger(tiny_cfg, tiny_vars, int8=True)

    def test_int8_serving_path_slowfast(self, synthetic_dataset):
        """The dual-pathway family serves through the same self-calibrating
        int8 tagger (multi-stream spec IR); clip_len must satisfy the
        model's alpha divisibility (4 % alpha=4 == 0)."""
        root, list_path = synthetic_dataset
        records = load_video_list(list_path, root=root)
        cfg = ExperimentConfig(
            model=ModelConfig(name="slowfast_r2plus1d", num_classes=3,
                              multilabel=True, compute_dtype="bfloat16"),
            data=DataConfig(source_hw=(48, 64), resize_hw=(40, 56),
                            crop_hw=(32, 32),
                            sampler=ClipSamplerConfig(clip_len=4, stride=2,
                                                      eval_mode="uniform",
                                                      num_eval_clips=2)),
        )
        model = get_model("slowfast_r2plus1d", num_classes=3)
        x = jnp.zeros((1, 4, 32, 32, 3), jnp.float32)
        variables = jax.jit(model.init, static_argnames="train")(
            jax.random.PRNGKey(0), x, train=False)
        tagger = Tagger(cfg, variables, clip_batch=2, int8=True)
        a = tagger.video_scores(records[0].path)
        assert a.shape == (3,) and np.isfinite(a).all()
        assert (a >= 0).all() and (a <= 1).all()
        b = tagger.video_scores(records[0].path)
        np.testing.assert_array_equal(a, b)


class TestNonFiniteScores:
    """A diverged model must fail LOUDLY, not as silently-empty tags /
    chance-level metrics (the s3d round-3 incident: NaN logits read as
    top1=0.5 and zero tags with no hint)."""

    def test_rank_tags_warns_and_returns_empty(self, capfd):
        # fvt loggers don't propagate to root (own console handler), so
        # assert on the captured stderr rather than caplog.
        from fastvideotagging_tpu.evaluation.tagger import rank_tags

        scores = np.full((4,), np.nan, np.float32)
        out = rank_tags(scores, ["a", "b", "c", "d"], threshold=0.5)
        assert out == []
        assert "non-finite" in capfd.readouterr().err

    def test_rank_tags_finite_is_silent(self, capfd):
        from fastvideotagging_tpu.evaluation.tagger import rank_tags

        out = rank_tags(np.array([0.9, 0.1], np.float32), ["a", "b"])
        assert [t.tag for t in out] == ["a"]
        assert "non-finite" not in capfd.readouterr().err
