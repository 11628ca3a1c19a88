"""Device fused preprocess vs the host numpy spec (SURVEY.md §5.2 tier)."""

import jax.numpy as jnp
import numpy as np

from fastvideotagging_tpu.data.preprocess import preprocess_clip_host
from fastvideotagging_tpu.ops.preprocess_kernel import (
    preprocess_batch,
    preprocess_eval_clip,
)

MEAN = (0.43216, 0.394666, 0.37645)
STD = (0.22803, 0.22145, 0.216989)


def _rand_frames(rng, b, t, h, w):
    return rng.integers(0, 256, size=(b, t, h, w, 3), dtype=np.int64).astype(np.uint8)


class TestFusedPreprocess:
    def test_matches_host_spec(self, rng):
        frames = _rand_frames(rng, 3, 2, 24, 32)
        tops = np.array([0, 3, 7], np.int32)
        lefts = np.array([5, 0, 11], np.int32)
        flips = np.array([False, True, False])
        out = preprocess_batch(
            jnp.asarray(frames), jnp.asarray(tops), jnp.asarray(lefts),
            jnp.asarray(flips), jnp.asarray(MEAN, jnp.float32),
            jnp.asarray(STD, jnp.float32),
            resize_hw=(16, 20), crop_hw=(8, 8), out_dtype_name="float32",
        )
        assert out.shape == (3, 2, 8, 8, 3)
        for i in range(3):
            ref = preprocess_clip_host(
                frames[i], (16, 20), (int(tops[i]), int(lefts[i])), (8, 8),
                MEAN, STD, flip=bool(flips[i]),
            )
            np.testing.assert_allclose(np.asarray(out[i]), ref, atol=1e-4)

    def test_identity_resize_path(self, rng):
        """source == resize size -> pure crop+normalize (loader fast path)."""
        frames = _rand_frames(rng, 1, 2, 16, 20)
        out = preprocess_batch(
            jnp.asarray(frames), jnp.zeros((1,), jnp.int32),
            jnp.zeros((1,), jnp.int32), jnp.zeros((1,), bool),
            jnp.asarray(MEAN, jnp.float32), jnp.asarray(STD, jnp.float32),
            resize_hw=(16, 20), crop_hw=(16, 20), out_dtype_name="float32",
        )
        ref = preprocess_clip_host(frames[0], (16, 20), (0, 0), (16, 20),
                                   MEAN, STD)
        np.testing.assert_allclose(np.asarray(out[0]), ref, atol=1e-4)

    def test_deterministic_bitwise(self, rng):
        frames = jnp.asarray(_rand_frames(rng, 2, 2, 24, 32))
        args = (frames, jnp.array([1, 2], jnp.int32), jnp.array([3, 4], jnp.int32),
                jnp.array([True, False]), jnp.asarray(MEAN, jnp.float32),
                jnp.asarray(STD, jnp.float32))
        kw = dict(resize_hw=(16, 20), crop_hw=(8, 8), out_dtype_name="float32")
        a = np.asarray(preprocess_batch(*args, **kw))
        b = np.asarray(preprocess_batch(*args, **kw))
        np.testing.assert_array_equal(a, b)

    def test_eval_clip_center_crop(self, rng):
        frames = _rand_frames(rng, 2, 3, 24, 32)  # K=2 clips
        out = preprocess_eval_clip(frames, (16, 20), (8, 8), MEAN, STD)
        for i in range(2):
            ref = preprocess_clip_host(frames[i], (16, 20), (4, 6), (8, 8),
                                       MEAN, STD)
            np.testing.assert_allclose(np.asarray(out[i]), ref, atol=1e-4)

    def test_bf16_output_dtype(self, rng):
        frames = _rand_frames(rng, 1, 1, 16, 16)
        out = preprocess_batch(
            jnp.asarray(frames), jnp.zeros((1,), jnp.int32),
            jnp.zeros((1,), jnp.int32), jnp.zeros((1,), bool),
            jnp.asarray(MEAN, jnp.float32), jnp.asarray(STD, jnp.float32),
            resize_hw=(8, 8), crop_hw=(8, 8), out_dtype_name="bfloat16",
        )
        assert out.dtype == jnp.bfloat16
