"""Native host data-plane (framepack.c) parity tests."""

import numpy as np
import pytest

from fastvideotagging_tpu import native
from fastvideotagging_tpu.data.preprocess import resize_bilinear_host


def test_native_builds_on_this_box():
    assert native.available(), "C toolchain present in image; build should work"


class TestPackFrames:
    def test_gather(self, rng):
        frames = rng.integers(0, 256, size=(10, 4, 6, 3), dtype=np.int64
                              ).astype(np.uint8)
        idx = np.array([3, 0, 9, 3])
        out = native.pack_frames(frames, idx)
        np.testing.assert_array_equal(out, frames[idx])

    def test_out_of_range_clamps(self, rng):
        frames = rng.integers(0, 256, size=(4, 2, 2, 3), dtype=np.int64
                              ).astype(np.uint8)
        out = native.pack_frames(frames, np.array([-5, 100]))
        np.testing.assert_array_equal(out[0], frames[0])
        np.testing.assert_array_equal(out[1], frames[3])


class TestNativeResize:
    @pytest.mark.parametrize("src,dst", [((48, 64), (128, 171)),
                                         ((240, 320), (128, 171)),
                                         ((32, 32), (8, 8))])
    def test_matches_float_spec(self, rng, src, dst):
        frames = rng.integers(0, 256, size=(3, *src, 3), dtype=np.int64
                              ).astype(np.uint8)
        got = native.resize_batch_u8(frames, *dst)
        ref = resize_bilinear_host(frames, *dst)
        assert got.shape == (3, *dst, 3)
        # u8 quantization of the float spec: off-by-one at most (rounding).
        assert np.abs(got.astype(np.float32) - ref).max() <= 1.0

    def test_identity(self, rng):
        frames = rng.integers(0, 256, size=(2, 16, 16, 3), dtype=np.int64
                              ).astype(np.uint8)
        np.testing.assert_array_equal(
            native.resize_batch_u8(frames, 16, 16), frames)
