"""Tests for decode, preprocessing spec, list parsing, synthetic data."""

import os

import numpy as np
import pytest

from fastvideotagging_tpu.data import decode, preprocess, sampler, synthetic, ucf101


class TestPreprocessSpec:
    def test_resize_coeffs_rows_sum_to_one(self):
        for src, dst in [(48, 128), (171, 171), (342, 224), (64, 8)]:
            mat = preprocess.resize_coeffs(src, dst)
            assert mat.shape == (dst, src)
            np.testing.assert_allclose(mat.sum(axis=1), 1.0, atol=1e-6)
            assert (np.count_nonzero(mat, axis=1) <= 2).all()

    def test_resize_identity(self):
        mat = preprocess.resize_coeffs(100, 100)
        np.testing.assert_array_equal(mat, np.eye(100, dtype=np.float32))

    def test_resize_vs_cv2(self):
        """Our float bilinear spec matches cv2.INTER_LINEAR within fixed-point noise."""
        cv2 = pytest.importorskip("cv2")
        rng = np.random.Generator(np.random.Philox(key=np.uint64(0)))
        img = rng.integers(0, 256, size=(48, 64, 3), dtype=np.int64).astype(np.uint8)
        ours = preprocess.resize_bilinear_host(img[None], 128, 171)[0]
        theirs = cv2.resize(img, (171, 128), interpolation=cv2.INTER_LINEAR)
        # cv2 uses 5-bit fixed point interpolation coefficients -> small diffs.
        assert np.abs(ours - theirs.astype(np.float32)).max() <= 2.0

    def test_full_preprocess_shapes_and_normalization(self):
        frames = np.full((4, 48, 64, 3), 128, dtype=np.uint8)
        mean = (0.5, 0.5, 0.5)
        std = (0.25, 0.25, 0.25)
        out = preprocess.preprocess_clip_host(
            frames, (128, 171), (8, 29), (112, 112), mean, std
        )
        assert out.shape == (4, 112, 112, 3)
        assert out.dtype == np.float32
        np.testing.assert_allclose(out, (128 - 127.5) / 63.75, atol=1e-5)

    def test_flip_geometry(self):
        frames = np.zeros((1, 8, 8, 3), dtype=np.uint8)
        frames[0, :, 0, :] = 255  # left column lit
        out = preprocess.preprocess_clip_host(
            frames, (8, 8), (0, 0), (8, 8), (0, 0, 0), (1, 1, 1), flip=True
        )
        assert out[0, 0, -1, 0] > out[0, 0, 0, 0]


class TestSynthetic:
    def test_frames_deterministic_and_class_dependent(self):
        a = synthetic.make_frames(0, 8, 32, 32)
        b = synthetic.make_frames(0, 8, 32, 32)
        c = synthetic.make_frames(1, 8, 32, 32)
        np.testing.assert_array_equal(a, b)
        assert not np.array_equal(a, c)
        assert a.dtype == np.uint8 and a.shape == (8, 32, 32, 3)


class TestDecode:
    def test_roundtrip(self, synthetic_dataset):
        root, list_path = synthetic_dataset
        recs = ucf101.load_video_list(list_path, root=root)
        n, fps, h, w = decode.probe_video(recs[0].path)
        assert (h, w) == (48, 64)
        assert n >= 20  # wrote 24 frames; container may fudge by a little
        idx = sampler.sample_eval_indices(n, 8, 2, mode="center")[0]
        frames = decode.read_frames_at(recs[0].path, idx)
        assert frames.shape == (8, 48, 64, 3)
        assert frames.dtype == np.uint8
        # lossy codec, but content should resemble the source frames
        src = synthetic.make_frames(recs[0].label, 24, 48, 64)
        err = np.abs(
            frames.astype(np.float32) - src[idx].astype(np.float32)
        ).mean()
        assert err < 30.0

    def test_unsorted_indices_preserved(self, synthetic_dataset):
        root, list_path = synthetic_dataset
        recs = ucf101.load_video_list(list_path, root=root)
        a = decode.read_frames_at(recs[0].path, np.array([5, 1, 9, 1]))
        b = decode.read_frames_at(recs[0].path, np.array([1, 5, 9]))
        np.testing.assert_array_equal(a[0], b[1])
        np.testing.assert_array_equal(a[1], b[0])
        np.testing.assert_array_equal(a[3], b[0])

    def test_out_of_range_filled_with_last(self, synthetic_dataset):
        root, list_path = synthetic_dataset
        recs = ucf101.load_video_list(list_path, root=root)
        frames = decode.read_frames_at(recs[0].path, np.array([0, 10_000]))
        assert frames.shape[0] == 2

    def test_missing_file_raises(self, tmp_path):
        with pytest.raises(decode.DecodeError):
            decode.read_frames_at(str(tmp_path / "nope.mp4"), np.array([0]))

    def test_corrupt_file_raises(self, tmp_path):
        """Fault-injection: truncated/garbage video (SURVEY.md §6.3)."""
        bad = tmp_path / "corrupt.mp4"
        bad.write_bytes(b"\x00\x01\x02 garbage not a video" * 100)
        with pytest.raises(decode.DecodeError):
            decode.read_frames_at(str(bad), np.array([0, 1]))


class TestLists:
    def test_single_label_list(self, synthetic_dataset):
        root, list_path = synthetic_dataset
        recs = ucf101.load_video_list(list_path, root=root)
        assert len(recs) == 6
        assert {r.label for r in recs} == {0, 1, 2}
        assert all(os.path.isabs(r.path) or r.path.startswith(root) for r in recs)

    def test_ucf_style(self, tmp_path):
        class_ind = tmp_path / "classInd.txt"
        class_ind.write_text("1 ApplyEyeMakeup\n2 Archery\n")
        lst = tmp_path / "trainlist01.txt"
        lst.write_text("ApplyEyeMakeup/v_1.avi 1\nArchery/v_2.avi 2\n")
        cidx = ucf101.load_class_index(str(class_ind))
        recs = ucf101.load_video_list(str(lst), root="/data", class_index=cidx)
        assert [r.label for r in recs] == [0, 1]

    def test_ucf_testlist_without_ids(self, tmp_path):
        class_ind = tmp_path / "classInd.txt"
        class_ind.write_text("1 ApplyEyeMakeup\n2 Archery\n")
        lst = tmp_path / "testlist01.txt"
        lst.write_text("Archery/v_9.avi\n")
        cidx = ucf101.load_class_index(str(class_ind))
        recs = ucf101.load_video_list(str(lst), root="/data", class_index=cidx)
        assert recs[0].label == 1

    def test_tag_list(self, tmp_path):
        lst = tmp_path / "tags.txt"
        lst.write_text("a.mp4 cat,outdoor\nb.mp4 dog\nc.mp4 cat\n")
        recs, tag_index = ucf101.load_tag_list(str(lst))
        assert tag_index == {"cat": 0, "outdoor": 1, "dog": 2}
        assert recs[0].tags == (0, 1)
        np.testing.assert_array_equal(recs[2].multihot(3), [1, 0, 0])

    def test_multilabel_dataset_rejects_tagless_records(self):
        # num_tags over class-list records (tags=()) would silently train
        # against all-zero multihot targets — the dataset must refuse.
        from fastvideotagging_tpu.config import DataConfig
        from fastvideotagging_tpu.data.pipeline import ClipDataset

        recs = [ucf101.VideoRecord("a.mp4", 0), ucf101.VideoRecord("b.mp4", 1)]
        with pytest.raises(ValueError, match="tag sets"):
            ClipDataset(recs, DataConfig(), num_tags=5)
        # one tagged record is enough to accept the dataset
        ClipDataset(recs + [ucf101.VideoRecord("c.mp4", 0, tags=(1,))],
                    DataConfig(), num_tags=5)
