"""SequentialReader: one-pass long-form decode (SURVEY.md §6.7)."""

import numpy as np

from fastvideotagging_tpu.data import decode
from fastvideotagging_tpu.data.ucf101 import load_video_list


def _first_video(synthetic_dataset):
    root, list_path = synthetic_dataset
    return load_video_list(list_path, root=root)[0].path


def test_matches_read_frames_at(synthetic_dataset):
    path = _first_video(synthetic_dataset)
    idx_chunks = [np.arange(0, 8), np.arange(6, 14), np.arange(12, 20)]
    with decode.SequentialReader(path) as reader:
        seq = [reader.read(c) for c in idx_chunks]
    for c, got in zip(idx_chunks, seq):
        ref = decode.read_frames_at(path, c)
        np.testing.assert_array_equal(got, ref)


def test_backward_overlap_served_from_cache(synthetic_dataset):
    path = _first_video(synthetic_dataset)
    with decode.SequentialReader(path, cache_size=32) as reader:
        a = reader.read(np.arange(0, 12))
        b = reader.read(np.arange(8, 16))  # overlaps the last chunk
    np.testing.assert_array_equal(a[8:], b[:4])


def test_deep_rewind_reopens(synthetic_dataset):
    path = _first_video(synthetic_dataset)
    with decode.SequentialReader(path, cache_size=4) as reader:
        reader.read(np.arange(16, 20))
        early = reader.read(np.array([0, 1]))  # far behind the cache window
    ref = decode.read_frames_at(path, np.array([0, 1]))
    np.testing.assert_array_equal(early, ref)


def test_past_end_clamps(synthetic_dataset):
    path = _first_video(synthetic_dataset)
    with decode.SequentialReader(path) as reader:
        out = reader.read(np.array([0, 10_000]))
    assert out.shape[0] == 2
