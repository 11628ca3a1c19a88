"""Loader pipeline tests: determinism, batching, fault policy, prefetch."""

import numpy as np
import pytest

from fastvideotagging_tpu.config import ClipSamplerConfig, DataConfig
from fastvideotagging_tpu.data.pipeline import (
    ClipDataset,
    device_prefetch,
    train_batches,
)
from fastvideotagging_tpu.data.ucf101 import VideoRecord, load_video_list

CFG = DataConfig(
    source_hw=(48, 64),
    resize_hw=(40, 56),
    crop_hw=(32, 32),
    sampler=ClipSamplerConfig(clip_len=4, stride=2),
    num_workers=2,
)


@pytest.fixture()
def dataset(synthetic_dataset):
    root, list_path = synthetic_dataset
    records = load_video_list(list_path, root=root)
    return ClipDataset(records, CFG, mode="train", seed=7)


class TestClipDataset:
    def test_train_sample_shapes(self, dataset):
        s = dataset.get_train(0, epoch=0)
        assert s.frames.shape == (4, 48, 64, 3)
        assert s.frames.dtype == np.uint8
        assert 0 <= s.crop_top <= 8 and 0 <= s.crop_left <= 24
        assert s.label in (0, 1, 2)

    def test_train_deterministic_per_key(self, dataset):
        a = dataset.get_train(3, epoch=1)
        b = dataset.get_train(3, epoch=1)
        c = dataset.get_train(3, epoch=2)
        np.testing.assert_array_equal(a.frames, b.frames)
        assert (a.crop_top, a.crop_left, a.flip) == (b.crop_top, b.crop_left, b.flip)
        assert (a.frames != c.frames).any() or (a.crop_top, a.crop_left) != (
            c.crop_top, c.crop_left)

    def test_eval_clips(self, synthetic_dataset):
        root, list_path = synthetic_dataset
        records = load_video_list(list_path, root=root)
        ds = ClipDataset(records, CFG, mode="eval")
        clips, rec = ds.get_eval_clips(0)
        assert clips.ndim == 5 and clips.shape[1:] == (4, 48, 64, 3)
        clips2, _ = ds.get_eval_clips(0)
        np.testing.assert_array_equal(clips, clips2)

    def test_skip_undecodable_with_replacement(self, synthetic_dataset, tmp_path):
        root, list_path = synthetic_dataset
        records = load_video_list(list_path, root=root)
        bad = tmp_path / "bad.mp4"
        bad.write_bytes(b"not a video")
        records = [VideoRecord(str(bad), 0)] + records
        ds = ClipDataset(records, CFG, mode="train", seed=7)
        s = ds.get_train(0, epoch=0)  # index 0 is the bad video
        assert s.frames.shape == (4, 48, 64, 3)  # replaced by next record


class TestTrainBatches:
    def test_shapes_and_coverage(self, dataset):
        batches = list(train_batches(dataset, batch_size=2, epoch=0,
                                     num_workers=2))
        assert len(batches) == 3  # 6 videos / 2
        for b in batches:
            assert b["frames"].shape == (2, 4, 48, 64, 3)
            assert b["labels"].shape == (2,)
            assert b["weights"].sum() == 2.0

    def test_epoch_determinism(self, dataset):
        a = list(train_batches(dataset, 2, epoch=0, num_workers=2))
        b = list(train_batches(dataset, 2, epoch=0, num_workers=4))
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x["frames"], y["frames"])
            np.testing.assert_array_equal(x["labels"], y["labels"])
        c = list(train_batches(dataset, 2, epoch=1, num_workers=2))
        assert any((x["labels"] != y["labels"]).any() or
                   (x["frames"] != y["frames"]).any() for x, y in zip(a, c))

    def test_drop_last(self, dataset):
        batches = list(train_batches(dataset, batch_size=4, epoch=0,
                                     num_workers=2, drop_last=True))
        assert len(batches) == 1
        batches = list(train_batches(dataset, batch_size=4, epoch=0,
                                     num_workers=2, drop_last=False))
        assert len(batches) == 2
        assert batches[1]["frames"].shape[0] == 2

    def test_frame_cache_matches_streaming_decode(self, synthetic_dataset):
        """cache_mb>0 must be a pure performance knob: identical samples."""
        import dataclasses

        root, list_path = synthetic_dataset
        records = load_video_list(list_path, root=root)
        cached_cfg = dataclasses.replace(CFG, cache_mb=256)
        ds_stream = ClipDataset(records, CFG, mode="train", seed=7)
        ds_cached = ClipDataset(records, cached_cfg, mode="train", seed=7)
        for i in range(4):
            a = ds_stream.get_train(i, epoch=1)
            b = ds_cached.get_train(i, epoch=1)  # fills cache
            c = ds_cached.get_train(i, epoch=1)  # served from cache
            np.testing.assert_array_equal(a.frames, b.frames)
            np.testing.assert_array_equal(a.frames, c.frames)
            assert (a.crop_top, a.crop_left, a.flip) == (
                b.crop_top, b.crop_left, b.flip)
        assert ds_cached._cache_bytes > 0
        ev_s = ClipDataset(records, CFG, mode="eval")
        ev_c = ClipDataset(records, cached_cfg, mode="eval")
        ca, _ = ev_s.get_eval_clips(0)
        cb, _ = ev_c.get_eval_clips(0)
        np.testing.assert_array_equal(ca, cb)

    def test_drop_last_smaller_than_batch_yields_nothing(self, dataset):
        # 6 videos < batch 7: with drop_last no full batch exists; the
        # iterator must terminate immediately (and not decode the whole set).
        batches = list(train_batches(dataset, batch_size=7, epoch=0,
                                     num_workers=2, drop_last=True))
        assert batches == []

    def test_rows_subset_matches_full_batch(self, dataset):
        """Multi-host loading: rows=[1,3] yields exactly rows 1 and 3 of the
        global batches (sample content is a pure function of (seed, epoch,
        index), so per-host subset decode reproduces the single-host rows)."""
        full = list(train_batches(dataset, 2, epoch=2, num_workers=2))
        sub = list(train_batches(dataset, 2, epoch=2, num_workers=2, rows=[1]))
        assert len(sub) == len(full) == 3
        for f, s in zip(full, sub):
            assert s["frames"].shape[0] == 1
            for k in f:
                np.testing.assert_array_equal(f[k][[1]], s[k])

    def test_rows_validation(self, dataset):
        with pytest.raises(ValueError, match="rows must be within"):
            list(train_batches(dataset, 2, epoch=0, rows=[2]))
        with pytest.raises(ValueError, match="drop_last"):
            list(train_batches(dataset, 2, epoch=0, drop_last=False, rows=[0]))


class TestDevicePrefetch:
    def test_order_and_count(self):
        src = [{"x": np.full((2,), i)} for i in range(7)]
        out = list(device_prefetch(iter(src), depth=3))
        assert len(out) == 7
        for i, b in enumerate(out):
            np.testing.assert_array_equal(np.asarray(b["x"]), np.full((2,), i))

    def test_short_stream(self):
        src = [{"x": np.zeros(1)}]
        assert len(list(device_prefetch(iter(src), depth=4))) == 1

    def test_empty_stream(self):
        assert list(device_prefetch(iter([]), depth=2)) == []
