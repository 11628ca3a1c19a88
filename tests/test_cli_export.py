"""Export CLI (cli/export.py): weights dir -> deployable serving artifacts
(jax.export + raw StableHLO + meta.json), bf16 and int8 paths."""

import json
import os

import numpy as np

from fastvideotagging_tpu.cli import export as cli_export
from fastvideotagging_tpu.config import (
    ClipSamplerConfig, DataConfig, ExperimentConfig, ModelConfig,
)
from fastvideotagging_tpu.data.ucf101 import load_video_list
from fastvideotagging_tpu.models import get_model
from fastvideotagging_tpu.train.checkpoint import export_weights


def _make_weights(path: str, model_name: str, num_classes: int):
    import jax
    import jax.numpy as jnp

    model = get_model(model_name, num_classes=num_classes, dropout=0.0)
    variables = jax.jit(model.init, static_argnames="train")(
        jax.random.PRNGKey(0), jnp.zeros((1, 4, 32, 32, 3), jnp.float32),
        train=False)
    variables = jax.device_get(variables)
    export_weights(path, variables["params"], variables["batch_stats"])
    return variables


GEOM = ["--clip-len", "4", "--stride", "2", "--eval-mode", "dense",
        "--resize", "40", "56", "--crop", "32", "32"]


def test_export_cli_bf16_roundtrip(tmp_path, rng):
    import jax
    import jax.numpy as jnp

    from fastvideotagging_tpu.evaluation.serving import (
        load_serving, make_serving_fn)

    weights = str(tmp_path / "weights")
    variables = _make_weights(weights, "tiny3d", 3)
    out = str(tmp_path / "art")
    names = tmp_path / "tags.txt"
    names.write_text("cat\ndog\nbird\n")

    cli_export.main([
        "--model", "tiny3d", "--num-classes", "3", "--multilabel",
        "--dropout", "0.0", *GEOM,
        "--weights", weights, "--out", out, "--clip-batch", "2",
        "--tag-names", str(names),
    ])

    meta = json.load(open(os.path.join(out, "meta.json")))
    assert meta["model"] == "tiny3d" and meta["int8"] is False
    assert meta["input"]["shape"] == [2, 4, 40, 56, 3]
    assert meta["sampler"] == {"clip_len": 4, "stride": 2,
                               "eval_mode": "dense", "num_eval_clips": 10}
    assert meta["output"]["shape"] == [2, 3]
    assert meta["tag_names"] == ["cat", "dog", "bird"]
    assert set(meta["artifacts"]) == {"jax", "stablehlo"}
    stablehlo = os.path.join(out, "serving.stablehlo")
    assert os.path.getsize(stablehlo) > 1000

    # the jax artifact reloads and matches the in-process serving fn
    cfg = ExperimentConfig(
        model=ModelConfig(name="tiny3d", num_classes=3, multilabel=True,
                          dropout=0.0),
        data=DataConfig(resize_hw=(40, 56), crop_hw=(32, 32),
                        sampler=ClipSamplerConfig(clip_len=4, stride=2,
                                                  eval_mode="dense")),
    )
    clips = rng.integers(0, 256, size=(2, 4, 40, 56, 3)).astype(np.uint8)
    ref = np.asarray(jax.jit(make_serving_fn(cfg, variables))(
        jnp.asarray(clips)))
    got = np.asarray(load_serving(
        os.path.join(out, "serving.jax")).call(jnp.asarray(clips)))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_export_cli_platforms_reaches_both_artifacts(tmp_path):
    """--platforms must lower BOTH artifacts for the named backend — the
    jax.export artifact used to ignore it (only StableHLO honored it), so
    a --format both export from a CPU process produced one TPU and one
    CPU program."""
    from jax import export as jax_export

    weights = str(tmp_path / "weights")
    _make_weights(weights, "tiny3d", 3)
    out = str(tmp_path / "art_tpu")

    cli_export.main([
        "--model", "tiny3d", "--num-classes", "3", "--multilabel",
        "--dropout", "0.0", *GEOM,
        "--weights", weights, "--out", out, "--clip-batch", "2",
        "--platforms", "tpu",
    ])

    meta = json.load(open(os.path.join(out, "meta.json")))
    assert meta["platforms"] == ["tpu"]
    assert set(meta["artifacts"]) == {"jax", "stablehlo"}
    with open(os.path.join(out, "serving.jax"), "rb") as f:
        exported = jax_export.deserialize(f.read())
    assert tuple(p.lower() for p in exported.platforms) == ("tpu",)


def test_collect_calib_clips_pads_to_batch(synthetic_dataset):
    root, list_path = synthetic_dataset
    video = load_video_list(list_path, root=root)[0].path
    cfg = ExperimentConfig(
        data=DataConfig(resize_hw=(40, 56), crop_hw=(32, 32),
                        sampler=ClipSamplerConfig(clip_len=4, stride=2,
                                                  eval_mode="dense")))
    clips = cli_export.collect_calib_clips(cfg, video, clip_batch=2,
                                           max_clips=4)
    assert clips.shape == (2, 4, 40, 56, 3) and clips.dtype == np.uint8
    # a video yielding fewer dense clips than the batch is tiled, not zero-
    # padded — zeros would poison the int8 calibration range
    one = cli_export.collect_calib_clips(cfg, video, clip_batch=8,
                                         max_clips=1)
    assert one.shape == (8, 4, 40, 56, 3)
    np.testing.assert_array_equal(one[0], one[7])
    assert one.any()


def test_export_cli_int8(tmp_path, synthetic_dataset):
    import jax
    import jax.numpy as jnp

    from fastvideotagging_tpu.evaluation.serving import load_serving

    root, list_path = synthetic_dataset
    video = load_video_list(list_path, root=root)[0].path
    weights = str(tmp_path / "weights")
    _make_weights(weights, "r2plus1d_18", 5)
    out = str(tmp_path / "art8")

    cli_export.main([
        "--model", "r2plus1d_18", "--num-classes", "5", "--multilabel",
        "--dropout", "0.0", "--compute-dtype", "bfloat16", *GEOM,
        "--weights", weights, "--out", out, "--clip-batch", "2",
        "--format", "jax", "--int8", "--calib-video", video,
        "--calib-clips", "2",
    ])

    meta = json.load(open(os.path.join(out, "meta.json")))
    assert meta["int8"] is True and list(meta["artifacts"]) == ["jax"]
    exported = load_serving(os.path.join(out, "serving.jax"))
    clips = np.zeros((2, 4, 40, 56, 3), np.uint8)
    scores = np.asarray(exported.call(jnp.asarray(clips)))
    assert scores.shape == (2, 5)
    assert (scores >= 0).all() and (scores <= 1).all()
    del jax


def test_export_cli_int8_requires_calib(tmp_path):
    import pytest

    weights = str(tmp_path / "weights")
    _make_weights(weights, "tiny3d", 3)
    with pytest.raises(SystemExit, match="calib-video"):
        cli_export.main([
            "--model", "tiny3d", "--num-classes", "3", *GEOM,
            "--weights", weights, "--out", str(tmp_path / "x"), "--int8",
        ])
