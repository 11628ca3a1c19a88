"""Property-based tests (hypothesis) for the frozen golden specs.

These complement the literal-golden tests: any (num_frames, clip_len,
stride, mode) combination must satisfy the sampler invariants, and any
(src, dst) resize must satisfy the interpolation-matrix invariants.
"""

import numpy as np
from hypothesis import given, settings, strategies as st

from fastvideotagging_tpu.data import preprocess, sampler

nframes = st.integers(min_value=1, max_value=2000)
cliplen = st.integers(min_value=1, max_value=64)
strides = st.integers(min_value=1, max_value=8)


@settings(max_examples=200, deadline=None)
@given(n=nframes, t=cliplen, s=strides,
       mode=st.sampled_from(["center", "uniform", "dense"]),
       k=st.integers(min_value=1, max_value=16))
def test_eval_indices_invariants(n, t, s, mode, k):
    idx = sampler.sample_eval_indices(n, t, s, mode=mode, num_clips=k)
    assert idx.ndim == 2 and idx.shape[1] == t
    assert idx.dtype == np.int64
    assert (idx >= 0).all() and (idx < n).all()
    if n >= sampler.clip_span(t, s):
        # within each clip, indices are start + stride*arange (exactly)
        np.testing.assert_array_equal(
            idx - idx[:, :1],
            np.broadcast_to(np.arange(t) * s, idx.shape))
        # clip starts are non-decreasing
        assert (np.diff(idx[:, 0]) >= 0).all()
        if mode == "center":
            assert idx.shape[0] == 1
        if mode == "uniform":
            assert idx.shape[0] == k
    # repeat: bitwise identical (eval determinism)
    np.testing.assert_array_equal(
        idx, sampler.sample_eval_indices(n, t, s, mode=mode, num_clips=k))


@settings(max_examples=200, deadline=None)
@given(n=nframes, t=cliplen, s=strides,
       seed=st.integers(min_value=0, max_value=2**31),
       epoch=st.integers(min_value=0, max_value=1000),
       i=st.integers(min_value=0, max_value=10**6))
def test_train_indices_invariants(n, t, s, seed, epoch, i):
    idx = sampler.sample_train_indices(n, t, s, sampler.train_rng(seed, epoch, i))
    assert idx.shape == (t,)
    assert (idx >= 0).all() and (idx < n).all()
    idx2 = sampler.sample_train_indices(n, t, s, sampler.train_rng(seed, epoch, i))
    np.testing.assert_array_equal(idx, idx2)


@settings(max_examples=100, deadline=None)
@given(src=st.integers(min_value=1, max_value=512),
       dst=st.integers(min_value=1, max_value=512))
def test_resize_coeffs_invariants(src, dst):
    mat = preprocess.resize_coeffs(src, dst)
    assert mat.shape == (dst, src)
    # partition of unity; at most 2 taps; non-negative
    np.testing.assert_allclose(mat.sum(axis=1), 1.0, atol=1e-5)
    assert (mat >= 0).all()
    assert (np.count_nonzero(mat, axis=1) <= 2).all()
    # monotone: tap centers non-decreasing
    centers = mat @ np.arange(src)
    assert (np.diff(centers) >= -1e-5).all()


@settings(max_examples=100, deadline=None)
@given(h=st.integers(min_value=1, max_value=512),
       w=st.integers(min_value=1, max_value=512),
       data=st.data())
def test_crop_offsets_in_range(h, w, data):
    ch = data.draw(st.integers(min_value=1, max_value=h))
    cw = data.draw(st.integers(min_value=1, max_value=w))
    top, left = sampler.center_crop_offsets(h, w, ch, cw)
    assert 0 <= top <= h - ch and 0 <= left <= w - cw
    rng = sampler.train_rng(0, 0, 0)
    top, left = sampler.random_crop_offsets(h, w, ch, cw, rng)
    assert 0 <= top <= h - ch and 0 <= left <= w - cw


@settings(max_examples=100, deadline=None)
@given(n=st.integers(min_value=1, max_value=500),
       t=st.integers(min_value=1, max_value=16),
       s=st.integers(min_value=1, max_value=4),
       mode=st.sampled_from(["center", "uniform", "dense"]),
       cb=st.integers(min_value=1, max_value=9))
def test_eval_chunking_invariants(n, t, s, mode, cb):
    """iter_eval_chunks must present EVERY sampled clip exactly once, in
    clip order, padded to one compiled shape — for any sampler geometry
    and clip_batch. (The chunking is shared by every serving engine, incl.
    the pipelined native path, so this pins what all of them score.)"""
    from fastvideotagging_tpu.config import ClipSamplerConfig
    from fastvideotagging_tpu.evaluation.tagger import (
        eval_clip_index, iter_eval_chunks)

    scfg = ClipSamplerConfig(clip_len=t, stride=s, eval_mode=mode,
                             num_eval_clips=5)
    clip_idx = eval_clip_index(n, scfg)
    k = clip_idx.shape[0]
    h, w = 6, 7
    # frames whose content encodes the frame index -> chunk contents prove
    # which clips were read
    frames = (np.arange(n, dtype=np.int64) % 251).astype(np.uint8)
    frames = np.broadcast_to(
        frames[:, None, None, None], (n, h, w, 3)).copy()

    seen = []
    for clips_u8, nclips in iter_eval_chunks(
            lambda idx: frames[idx], clip_idx, (h, w), cb):
        assert clips_u8.shape == (cb, t, h, w, 3)  # ONE compiled shape
        assert 1 <= nclips <= cb
        assert clips_u8.dtype == np.uint8
        if nclips < cb:  # padding rows are zeros
            assert (clips_u8[nclips:] == 0).all()
        seen.append(clips_u8[:nclips])
    got = np.concatenate(seen, axis=0)
    assert got.shape[0] == k  # every clip exactly once
    want = frames[clip_idx.reshape(-1)].reshape(k, t, h, w, 3)
    np.testing.assert_array_equal(got, want)  # in clip order, verbatim
