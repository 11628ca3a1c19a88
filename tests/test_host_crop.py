"""host_crop: crop on the host before H2D, bit-identical to device crop.

The device preprocess (ops/preprocess_kernel.py) folds crop into a row-slice
of the bilinear resize coefficient matrices. When the shipped frames are
already at resize_hw, that resize matrix is the exact identity (half-pixel
mapping at scale 1 gives weight 1.0 on one row), so slicing the uint8 frames
on the host at the same Philox-drawn offsets and shipping the (crop_hw)
window must produce the SAME preprocessed tensor — while moving ~1.75x fewer
bytes over H2D/PCIe (128x171 -> 112x112). These tests pin that equivalence
and the guard rails around it.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import pytest

from fastvideotagging_tpu.config import (
    ClipSamplerConfig,
    DataConfig,
    ExperimentConfig,
    ModelConfig,
    TrainConfig,
)
from fastvideotagging_tpu.data import pipeline
from fastvideotagging_tpu.data.packed import PackedDataset, write_pack_from_arrays
from fastvideotagging_tpu.data.synthetic import make_frames
from fastvideotagging_tpu.ops.preprocess_kernel import preprocess_batch

HW = (40, 56)
CROP = (32, 32)
MEAN = np.array([0.43, 0.39, 0.37], np.float32)
STD = np.array([0.22, 0.22, 0.21], np.float32)


def _base_cfg(**kw) -> DataConfig:
    return DataConfig(resize_hw=HW, crop_hw=CROP,
                      sampler=ClipSamplerConfig(clip_len=4), **kw)


@pytest.fixture(scope="module")
def pack(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("hostcrop") / "t.fvtpack")
    write_pack_from_arrays(
        ((f"v{i}.mp4", i % 4, [], make_frames(i % 4, 10, *HW, seed=i))
         for i in range(16)),
        path, HW)
    return path


def _first_batch(pack_path, dcfg, batch=8, epoch=0, seed=7):
    ds = PackedDataset(pack_path, dcfg, mode="train", seed=seed)
    return next(pipeline.train_batches(ds, batch, epoch, num_workers=2))


def _preprocessed(batch, dcfg):
    rhw = dcfg.crop_hw if dcfg.host_crop else dcfg.resize_hw
    return np.asarray(preprocess_batch(
        batch["frames"], batch["crop_tops"], batch["crop_lefts"],
        batch["flips"], MEAN, STD,
        resize_hw=rhw, crop_hw=dcfg.crop_hw, out_dtype_name="float32"))


class TestHostCropParity:
    def test_shipped_shape_and_zero_offsets(self, pack):
        b = _first_batch(pack, _base_cfg(host_crop=True))
        assert b["frames"].shape[2:4] == CROP
        assert (b["crop_tops"] == 0).all() and (b["crop_lefts"] == 0).all()

    def test_preprocessed_clips_bit_identical(self, pack):
        """Same (seed, epoch, index) draws -> exactly equal model input."""
        dev = _base_cfg()
        host = _base_cfg(host_crop=True)
        for epoch in (0, 1):
            b_dev = _first_batch(pack, dev, epoch=epoch)
            b_host = _first_batch(pack, host, epoch=epoch)
            np.testing.assert_array_equal(
                _preprocessed(b_dev, dev), _preprocessed(b_host, host))
            # the flip draw is shared too (same rng order)
            np.testing.assert_array_equal(b_dev["flips"], b_host["flips"])

    def test_fewer_shipped_bytes(self, pack):
        b_dev = _first_batch(pack, _base_cfg())
        b_host = _first_batch(pack, _base_cfg(host_crop=True))
        ratio = b_dev["frames"].nbytes / b_host["frames"].nbytes
        assert ratio == pytest.approx(
            (HW[0] * HW[1]) / (CROP[0] * CROP[1]), rel=1e-6)

    def test_rejects_source_hw_device_resize(self):
        """Cropping raw source frames would NOT equal a crop after resize.
        (On the packed path the pack-geometry gate fires even earlier; the
        streaming dataset hits this guard directly.)"""
        dcfg = _base_cfg(host_crop=True, source_hw=(48, 64))
        with pytest.raises(ValueError, match="host_crop"):
            pipeline.ClipDataset([], dcfg, mode="train")

    def test_eval_scores_bit_identical(self, pack):
        """evaluate() with host_crop center-crops host-side — same scores."""
        import jax
        import jax.numpy as jnp

        from fastvideotagging_tpu.evaluation.evaluate import (
            evaluate_video_scores,
        )
        from fastvideotagging_tpu.models.zoo import get_model

        model = get_model("tiny3d", num_classes=4, dtype=jnp.float32)
        x = jnp.zeros((1, 4) + CROP + (3,), jnp.float32)
        variables = jax.jit(model.init, static_argnames="train")(
            jax.random.PRNGKey(0), x, train=False)
        scores = {}
        for host_crop in (False, True):
            dcfg = _base_cfg(host_crop=host_crop)
            cfg = ExperimentConfig(
                model=ModelConfig(name="tiny3d", num_classes=4,
                                  compute_dtype="float32"),
                data=dcfg)
            ds = PackedDataset(pack, dcfg, mode="eval", seed=0)
            ds.records = ds.records[:4]
            scores[host_crop], _ = evaluate_video_scores(
                model, variables, ds, cfg, clip_batch=2)
        np.testing.assert_array_equal(scores[False], scores[True])

    def test_train_step_end_to_end(self, pack):
        """make_train_step consumes the host-cropped batch (shape contract:
        make_sample_batch and the live pipeline agree)."""
        import jax
        import jax.numpy as jnp

        from fastvideotagging_tpu.models.zoo import get_model
        from fastvideotagging_tpu.train import lr as lr_lib
        from fastvideotagging_tpu.train.loop import (
            make_sample_batch,
            make_train_step,
        )
        from fastvideotagging_tpu.train.state import create_train_state

        cfg = ExperimentConfig(
            model=ModelConfig(name="tiny3d", num_classes=4,
                              compute_dtype="float32"),
            data=_base_cfg(host_crop=True),
            train=TrainConfig(batch_size=4, checkpoint_dir=""),
        )
        sample = make_sample_batch(cfg)
        assert sample["frames"].shape[2:4] == CROP
        model = get_model("tiny3d", num_classes=4, dtype=jnp.float32)
        tx = lr_lib.make_optimizer(cfg.train, steps_per_epoch=4)
        init_clip = jnp.zeros((1, 4) + CROP + (3,), jnp.float32)
        state = create_train_state(model, tx, jax.random.PRNGKey(0), init_clip)
        step = make_train_step(model, cfg, donate=False)
        b = _first_batch(pack, cfg.data, batch=4)
        state, metrics = step(state, b, jax.random.PRNGKey(0))
        assert np.isfinite(float(metrics["loss"]))
