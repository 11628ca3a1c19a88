"""Golden tests for the clip-sampler spec (SURVEY.md §5.2).

The literal index arrays here are the frozen spec — if one of these changes,
eval fidelity ("bit-for-bit at eval", BASELINE.json) has changed.
"""

import numpy as np
import pytest

from fastvideotagging_tpu.data import sampler


def test_clip_span():
    assert sampler.clip_span(16, 1) == 16
    assert sampler.clip_span(16, 2) == 31
    assert sampler.clip_span(1, 5) == 1
    with pytest.raises(ValueError):
        sampler.clip_span(0, 1)


class TestEvalGolden:
    def test_center_golden(self):
        idx = sampler.sample_eval_indices(100, 16, 1, mode="center")
        np.testing.assert_array_equal(idx, np.arange(42, 58)[None, :])

    def test_center_stride_golden(self):
        idx = sampler.sample_eval_indices(100, 16, 2, mode="center")
        np.testing.assert_array_equal(idx, (34 + 2 * np.arange(16))[None, :])

    def test_center_exact_fit(self):
        idx = sampler.sample_eval_indices(16, 16, 1, mode="center")
        np.testing.assert_array_equal(idx, np.arange(16)[None, :])

    def test_short_video_wraps(self):
        idx = sampler.sample_eval_indices(10, 16, 1, mode="center")
        np.testing.assert_array_equal(idx[0], np.arange(16) % 10)

    def test_uniform_golden(self):
        idx = sampler.sample_eval_indices(100, 8, 1, mode="uniform", num_clips=3)
        starts = idx[:, 0]
        # linspace(0, 92, 3) = [0, 46, 92]
        np.testing.assert_array_equal(starts, [0, 46, 92])
        assert idx.shape == (3, 8)

    def test_uniform_rounding_golden(self):
        idx = sampler.sample_eval_indices(50, 16, 1, mode="uniform", num_clips=4)
        # linspace(0, 34, 4) = [0, 11.33, 22.67, 34] -> rint -> [0, 11, 23, 34]
        np.testing.assert_array_equal(idx[:, 0], [0, 11, 23, 34])

    def test_dense_golden(self):
        idx = sampler.sample_eval_indices(64, 16, 1, mode="dense")
        np.testing.assert_array_equal(idx[:, 0], [0, 16, 32, 48])

    def test_dense_tail_window(self):
        idx = sampler.sample_eval_indices(70, 16, 1, mode="dense")
        # hop 16, last_start 54: [0, 16, 32, 48] + tail flush at 54
        np.testing.assert_array_equal(idx[:, 0], [0, 16, 32, 48, 54])

    def test_dense_single_window(self):
        idx = sampler.sample_eval_indices(17, 16, 1, mode="dense")
        np.testing.assert_array_equal(idx[:, 0], [0, 1])

    def test_eval_is_deterministic(self):
        a = sampler.sample_eval_indices(977, 32, 2, mode="uniform", num_clips=10)
        b = sampler.sample_eval_indices(977, 32, 2, mode="uniform", num_clips=10)
        np.testing.assert_array_equal(a, b)

    def test_unknown_mode(self):
        with pytest.raises(ValueError):
            sampler.sample_eval_indices(100, 16, 1, mode="bogus")


class TestTrain:
    def test_in_range_and_spaced(self):
        rng = sampler.train_rng(0, 0, 0)
        for n in [16, 17, 100, 1000]:
            idx = sampler.sample_train_indices(n, 16, 2, rng)
            assert idx.shape == (16,)
            assert idx.min() >= 0 and idx.max() < n or n < 31
            np.testing.assert_array_equal(np.diff(idx) % n, np.full(15, 2) % n)

    def test_deterministic_per_key(self):
        a = sampler.sample_train_indices(500, 16, 1, sampler.train_rng(7, 3, 11))
        b = sampler.sample_train_indices(500, 16, 1, sampler.train_rng(7, 3, 11))
        c = sampler.sample_train_indices(500, 16, 1, sampler.train_rng(7, 3, 12))
        np.testing.assert_array_equal(a, b)
        assert not np.array_equal(a, c)

    def test_covers_start_range(self):
        rng = sampler.train_rng(0, 0, 0)
        starts = {
            int(sampler.sample_train_indices(20, 4, 1, rng)[0]) for _ in range(500)
        }
        assert starts == set(range(17))

    def test_short_video_wraps(self):
        rng = sampler.train_rng(0, 0, 0)
        idx = sampler.sample_train_indices(5, 16, 1, rng)
        np.testing.assert_array_equal(idx, np.arange(16) % 5)


class TestCrops:
    def test_center_crop_golden(self):
        assert sampler.center_crop_offsets(128, 171, 112, 112) == (8, 29)
        assert sampler.center_crop_offsets(112, 112, 112, 112) == (0, 0)

    def test_center_crop_too_big(self):
        with pytest.raises(ValueError):
            sampler.center_crop_offsets(100, 100, 112, 112)

    def test_random_crop_range(self):
        rng = sampler.train_rng(0, 0, 0)
        tops, lefts = set(), set()
        for _ in range(300):
            t, l = sampler.random_crop_offsets(128, 171, 112, 112, rng)
            tops.add(t)
            lefts.add(l)
            assert 0 <= t <= 16 and 0 <= l <= 59
        assert len(tops) > 10 and len(lefts) > 30
