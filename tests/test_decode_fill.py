"""Corrupt-frame fill-policy parity across every decode path.

The contract (decode.py module docstring): an undecodable frame is served
as the nearest PREVIOUSLY decoded frame; frames before the first decodable
one as the FIRST decodable frame; indices past end-of-stream as the last
decoded frame. All three readers (read_frames_at, SequentialReader,
iter_frame_chunks) and therefore the decode-once pack must agree — a
mid-stream retrieve() failure previously truncated the pack while the
streaming readers kept going (bit-for-bit pack/streaming parity bug).

cv2 cannot be made to fail on a specific frame of a real file, so a fake
capture simulates grab/retrieve semantics.
"""

import numpy as np
import pytest

from fastvideotagging_tpu.data import decode


class _FakeCap:
    """grab()/retrieve() semantics with selectable retrieve failures."""

    def __init__(self, n, bad):
        self.n, self.bad = n, set(bad)
        self.pos = 0          # next frame grab() consumes
        self._grabbed = None

    def isOpened(self):
        return True

    def grab(self):
        if self.pos >= self.n:
            return False
        self._grabbed = self.pos
        self.pos += 1
        return True

    def retrieve(self):
        p = self._grabbed
        if p is None or p in self.bad:
            return False, None
        return True, np.full((4, 4, 3), p, np.uint8)

    def read(self):
        if not self.grab():
            return False, None
        return self.retrieve()

    def get(self, prop):
        return {_FakeCV2.CAP_PROP_FRAME_COUNT: self.n,
                _FakeCV2.CAP_PROP_FPS: 10.0,
                _FakeCV2.CAP_PROP_FRAME_HEIGHT: 4,
                _FakeCV2.CAP_PROP_FRAME_WIDTH: 4}[prop]

    def release(self):
        pass


class _FakeCV2:
    COLOR_BGR2RGB = 0
    CAP_PROP_FRAME_COUNT = 101
    CAP_PROP_FPS = 102
    CAP_PROP_FRAME_HEIGHT = 103
    CAP_PROP_FRAME_WIDTH = 104

    def __init__(self, n, bad):
        self._n, self._bad = n, bad

    def VideoCapture(self, path):
        return _FakeCap(self._n, self._bad)

    def cvtColor(self, frame, code):
        return frame


N, BAD = 10, (0, 1, 5)
# per the policy: leading bad 0,1 -> first good (2); 5 -> previous good (4)
EXPECT = [2, 2, 2, 3, 4, 4, 6, 7, 8, 9]


@pytest.fixture()
def fake_cv2(monkeypatch):
    fake = _FakeCV2(N, BAD)
    monkeypatch.setattr(decode, "cv2", fake)
    return fake


def _values(frames):
    return [int(f[0, 0, 0]) for f in frames]


def test_read_frames_at_fill_policy(fake_cv2):
    out = decode.read_frames_at("v.mp4", np.arange(N))
    assert _values(out) == EXPECT
    # past-end indices -> last decoded frame
    out = decode.read_frames_at("v.mp4", np.asarray([3, 12, 15]))
    assert _values(out) == [3, 9, 9]


def test_sequential_reader_fill_policy(fake_cv2):
    with decode.SequentialReader("v.mp4") as r:
        out = r.read(np.arange(N))
    assert _values(out) == EXPECT


def test_iter_frame_chunks_fill_policy(fake_cv2):
    frames = np.concatenate(list(decode.iter_frame_chunks("v.mp4", 3)))
    assert _values(frames) == EXPECT


def test_pack_matches_streaming_with_corrupt_frames(fake_cv2, tmp_path):
    """The decode-once pack stores exactly what the streaming readers serve
    — bit-for-bit — even when mid-stream frames fail to decode."""
    from fastvideotagging_tpu.data.packed import Pack, write_pack
    from fastvideotagging_tpu.data.ucf101 import VideoRecord

    out = str(tmp_path / "p.fvtpack")
    write_pack([VideoRecord("v.mp4", 0)], out, resize_hw=(4, 4))
    pack = Pack(out)
    assert pack.entries[0]["frames"] == N
    streamed = decode.read_frames_at("v.mp4", np.arange(N))
    packed = pack.gather(0, np.arange(N))
    np.testing.assert_array_equal(packed, streamed)


def test_all_bad_frames_still_raise(monkeypatch):
    monkeypatch.setattr(decode, "cv2", _FakeCV2(6, range(6)))
    with pytest.raises(decode.DecodeError):
        decode.read_frames_at("v.mp4", np.arange(6))
    with pytest.raises(decode.DecodeError):
        list(decode.iter_frame_chunks("v.mp4", 3))
