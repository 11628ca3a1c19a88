"""Clip loading pipeline: decode workers -> uint8 batches -> device prefetch.

TPU-first split of responsibilities (SURVEY.md §4.4, N5):

* Host worker threads do **decode + frame-index sampling only**, shipping raw
  uint8 THWC stacks (cv2 releases the GIL inside FFmpeg decode, so threads
  scale without pickling costs — unlike the reference's multiprocessing
  loader, there is no serialize/deserialize of frame data at all).
* All arithmetic (resize/crop/flip/normalize) happens on-device, fused
  (ops/preprocess_kernel.py).
* ``device_prefetch`` keeps ``depth`` batches in flight (device_put overlaps
  H2D DMA with the current step's compute — the double-buffered HBM pipeline
  [B:5]).

Determinism: every random draw (clip start, crop offsets, flip) comes from
``sampler.train_rng(seed, epoch, sample_index)`` with a fixed draw order —
(clip start, crop top, crop left, flip) — so any batch is reproducible from
(seed, epoch, index) alone, independent of worker scheduling.

Fault policy (SURVEY.md §6.3): a video that fails to decode is skipped with a
log line and deterministically replaced by the next record, keeping batch
shapes static.
"""

from __future__ import annotations

import concurrent.futures as cf
import dataclasses
import threading
from typing import Iterator

import jax
import numpy as np

from fastvideotagging_tpu.config import DataConfig
from fastvideotagging_tpu.data import decode, sampler
from fastvideotagging_tpu.data.ucf101 import VideoRecord
from fastvideotagging_tpu.utils.logging import get_logger

log = get_logger("fvt.data")


@dataclasses.dataclass
class ClipSample:
    frames: np.ndarray  # (T, H, W, 3) uint8, at ship resolution
    label: int
    multihot: np.ndarray | None
    crop_top: int
    crop_left: int
    flip: bool


def _ensure_size(frames: np.ndarray, hw: tuple[int, int]) -> np.ndarray:
    """Host-resize only if the decoded size differs from the ship size.

    Uses the first-party native resize (spec-exact half-pixel bilinear,
    native/framepack.c) so host-resized and device-resized pipelines share
    one geometry spec; numpy fallback inside if no compiler.
    """
    h, w = hw
    if frames.shape[1] == h and frames.shape[2] == w:
        return frames
    from fastvideotagging_tpu import native

    return native.resize_batch_u8(frames, h, w)


class ClipDataset:
    """Indexable clip source over a list of VideoRecords.

    mode 'train': random clip + random crop/flip per (epoch, index).
    mode 'eval' : deterministic center/uniform/dense clips, center crop.
    """

    def __init__(
        self,
        records: list[VideoRecord],
        data_cfg: DataConfig,
        mode: str = "train",
        num_tags: int | None = None,
        seed: int = 0,
    ):
        if mode not in ("train", "eval"):
            raise ValueError(f"mode must be train|eval, got {mode!r}")
        if num_tags is not None and records and not any(
                r.tags for r in records):
            # Silent failure mode otherwise: every multihot target is
            # all-zero and multilabel training converges to predicting no
            # tags (same guard as PackedDataset for tag-less packs).
            raise ValueError(
                "multilabel (num_tags set) needs records with tag sets, "
                "but no record carries any — parse the lists with "
                "load_tag_list (cli.train --tag-lists), not as class lists")
        self.records = records
        self.cfg = data_cfg
        self.mode = mode
        self.num_tags = num_tags
        self.seed = seed
        self._nframes_cache: dict[str, int] = {}
        # Optional decode-once frame cache (DataConfig.cache_mb).
        self._frame_cache: dict[str, np.ndarray] = {}
        self._cache_budget = int(getattr(data_cfg, "cache_mb", 0)) * 2 ** 20
        self._cache_bytes = 0
        self._cache_full_logged = False
        self._cache_lock = threading.Lock()
        # Ship resolution: what the host sends to the device. If the config
        # pins a source size, decode ships raw frames and the device does the
        # resize (the spec-exact fast path); otherwise host pre-resizes to
        # resize_hw and the device resize is an identity matmul.
        self.ship_hw = getattr(data_cfg, "source_hw", None) or data_cfg.resize_hw
        if getattr(data_cfg, "host_crop", False) and tuple(
                self.ship_hw) != tuple(data_cfg.resize_hw):
            raise ValueError(
                "host_crop slices the shipped frames directly, which is only "
                "pixel-exact when they are already at resize_hw (the device "
                "resize is then an identity); it cannot combine with "
                f"source_hw={data_cfg.source_hw} device-side resize")

    def __len__(self) -> int:
        return len(self.records)

    def _num_frames(self, rec: VideoRecord) -> int:
        n = self._nframes_cache.get(rec.path)
        if n is None:
            n, _, _, _ = decode.probe_video(rec.path)
            n = max(int(n), 1)
            self._nframes_cache[rec.path] = n
        return n

    def _cached_video(self, rec: VideoRecord) -> np.ndarray | None:
        """Whole decoded video at ship resolution, or None when caching is
        off / over budget. Decode happens outside the lock (cv2 releases the
        GIL); a rare duplicate decode on a race is benign."""
        if self._cache_budget <= 0:
            return None
        with self._cache_lock:
            hit = self._frame_cache.get(rec.path)
        if hit is not None:
            return hit
        n = self._num_frames(rec)
        frames = decode.read_frames_at(rec.path, np.arange(n))
        frames = _ensure_size(frames, self.ship_hw)
        with self._cache_lock:
            if rec.path in self._frame_cache:
                # another worker inserted while we decoded — don't bill the
                # budget twice for one key
                pass
            elif self._cache_bytes + frames.nbytes <= self._cache_budget:
                self._frame_cache[rec.path] = frames
                self._cache_bytes += frames.nbytes
            elif not self._cache_full_logged:
                self._cache_full_logged = True
                log.warning(
                    "frame cache budget (%d MiB) full after %d videos; "
                    "remaining videos stream-decode every epoch",
                    self._cache_budget >> 20, len(self._frame_cache))
        return frames

    def _clip_frames(self, rec: VideoRecord, frame_idx: np.ndarray) -> np.ndarray:
        """Frames of ``rec`` at the given indices, at ship resolution.

        The single frame-access point shared by train and eval sampling —
        PackedDataset (data/packed.py) overrides exactly this (plus
        ``_num_frames``) to serve the decode-once mmap tier with identical
        sampling semantics. Indices past the end clamp to the last frame
        (``read_frames_at``'s fill policy)."""
        video = self._cached_video(rec)
        if video is not None:
            frames = video[np.minimum(frame_idx, len(video) - 1)]
        else:
            frames = decode.read_frames_at(rec.path, frame_idx)
        return _ensure_size(frames, self.ship_hw)

    def _sample_train(self, index: int, epoch: int, fetch: bool = True):
        """Shared draw path of the train sampling: (record index, frame
        indices, frames | None, top, left, flip), deterministic in
        (seed, epoch, index) with the frozen draw order (clip start, crop
        top, crop left, flip). ``fetch=False`` skips the pixel IO — the
        index-only spec consumed by the HBM-resident device-cache tier
        (data/device_cache.py); on mmap-backed PackedDatasets the fault
        policy is identical either way (pack reads cannot raise), which is
        why the device-cache tier is gated to packs."""
        s = self.cfg.sampler
        attempts = 0
        idx = index
        while True:
            rec_i = idx % len(self.records)
            rec = self.records[rec_i]
            rng = sampler.train_rng(self.seed, epoch, index)
            try:
                n = self._num_frames(rec)
                frame_idx = sampler.sample_train_indices(n, s.clip_len, s.stride, rng)
                frames = self._clip_frames(rec, frame_idx) if fetch else None
                break
            except decode.DecodeError as e:
                log.warning("skipping undecodable %s (%s)", rec.path, e)
                attempts += 1
                idx += 1
                if attempts >= min(len(self.records), 16):
                    raise
        rh, rw = self.cfg.resize_hw
        ch, cw = self.cfg.crop_hw
        top, left = sampler.random_crop_offsets(rh, rw, ch, cw, rng)
        flip = bool(self.cfg.random_flip and rng.integers(0, 2))
        return rec_i, frame_idx, frames, top, left, flip

    def get_train_spec(self, index: int, epoch: int):
        """Sampling decisions only, no pixel IO: (record index, frame
        indices (T,), crop top, crop left, flip) — exactly the draws
        ``get_train`` would make for the same (seed, epoch, index)."""
        rec_i, frame_idx, _frames, top, left, flip = self._sample_train(
            index, epoch, fetch=False)
        return rec_i, frame_idx, top, left, flip

    def get_train(self, index: int, epoch: int) -> ClipSample:
        """One training clip; deterministic in (seed, epoch, index)."""
        _rec_i, _frame_idx, frames, top, left, flip = self._sample_train(
            index, epoch, fetch=True)
        rec = self.records[_rec_i]
        ch, cw = self.cfg.crop_hw
        if getattr(self.cfg, "host_crop", False):
            # Same draw, applied here: ship only the (ch, cw) window. The
            # device kernel then crops at (0, 0) from an identity resize —
            # bit-identical to device-side cropping (test_host_crop.py).
            # Flip stays on device (a row-reversal of the coefficient
            # matrix; zero H2D savings from doing it here).
            # A view is enough — _collate's np.stack materializes the copy.
            frames = frames[:, top:top + ch, left:left + cw]
            top = left = 0
        return ClipSample(frames, rec.label if rec.label is not None else -1,
                          self._multihot(rec), top, left, flip)

    def get_eval_clips(self, index: int) -> tuple[np.ndarray, VideoRecord]:
        """All eval clips of one video: (K, T, H, W, 3) uint8."""
        rec = self.records[index]
        s = self.cfg.sampler
        n = self._num_frames(rec)
        idx = sampler.sample_eval_indices(
            n, s.clip_len, s.stride, mode=s.eval_mode, num_clips=s.num_eval_clips
        )  # (K, T)
        flat = self._clip_frames(rec, idx.reshape(-1))
        k, t = idx.shape
        return flat.reshape((k, t) + flat.shape[1:]), rec

    def _multihot(self, rec: VideoRecord) -> np.ndarray | None:
        if self.num_tags is None:
            return None
        return rec.multihot(self.num_tags)


def _collate(samples: list[ClipSample]) -> dict[str, np.ndarray]:
    batch = {
        "frames": np.stack([s.frames for s in samples]),
        "labels": np.asarray([s.label for s in samples], np.int32),
        "crop_tops": np.asarray([s.crop_top for s in samples], np.int32),
        "crop_lefts": np.asarray([s.crop_left for s in samples], np.int32),
        "flips": np.asarray([s.flip for s in samples], bool),
        "weights": np.ones((len(samples),), np.float32),
    }
    if samples[0].multihot is not None:
        batch["multihot"] = np.stack([s.multihot for s in samples])
    return batch


def train_batches(
    dataset: ClipDataset,
    batch_size: int,
    epoch: int,
    num_workers: int = 8,
    drop_last: bool = True,
    rows: list[int] | None = None,
) -> Iterator[dict[str, np.ndarray]]:
    """Shuffled, worker-decoded training batches for one epoch.

    The shuffle permutation is seeded by (seed, epoch); decode runs in a
    thread pool with a bounded window so at most ~2 batches of futures are in
    flight (backpressure), and results are consumed in deterministic order.

    ``rows`` (multi-host): positions within each GLOBAL batch this process
    materializes (parallel.mesh.local_batch_rows). Every sample's content is
    a pure function of (seed, epoch, dataset index), so decoding a subset on
    each host reproduces exactly the rows of the single-host global batch;
    yielded batches then have len(rows) samples, in global row order, ready
    for mesh.global_batch_put.
    """
    order = np.random.Generator(
        np.random.Philox(key=np.uint64(dataset.seed), counter=[0, 0, 0, epoch])
    ).permutation(len(dataset))
    usable = len(order) - (len(order) % batch_size) if drop_last else len(order)
    if usable == 0:
        # drop_last with len(dataset) < batch_size: no full batch can ever be
        # formed — yield nothing rather than decoding the whole set for free.
        return
    indices = order[:usable]
    if rows is not None:
        if not drop_last:
            raise ValueError("rows= (multi-host loading) requires drop_last")
        if not rows or any(r < 0 or r >= batch_size for r in rows):
            raise ValueError(f"rows must be within [0, {batch_size}): {rows}")
        sel = np.concatenate([
            np.asarray(rows, np.int64) + b * batch_size
            for b in range(usable // batch_size)
        ])
        indices = indices[sel]
        batch_size = len(rows)

    with cf.ThreadPoolExecutor(max_workers=max(1, num_workers)) as pool:
        window = max(2 * batch_size, num_workers * 2)
        futures: dict[int, cf.Future] = {}
        submitted = 0

        def submit_upto(k):
            nonlocal submitted
            while submitted < min(k, len(indices)):
                i = int(indices[submitted])
                futures[submitted] = pool.submit(dataset.get_train, i, epoch)
                submitted += 1

        submit_upto(window)
        buf: list[ClipSample] = []
        for pos in range(len(indices)):
            sample = futures.pop(pos).result()
            submit_upto(pos + 1 + window)
            buf.append(sample)
            if len(buf) == batch_size:
                yield _collate(buf)
                buf = []
        if buf and not drop_last:
            yield _collate(buf)


def device_prefetch(batches: Iterator, sharding=None, depth: int = 2,
                    global_batch: int | None = None,
                    rows: list[int] | None = None) -> Iterator:
    """Keep ``depth`` batches resident on-device ahead of the consumer.

    ``jax.device_put`` is async: the H2D DMA of batch k+1..k+depth overlaps
    the model step on batch k — the double-buffered HBM prefetch of [B:5].

    Multi-host: with ``rows``/``global_batch`` set, each incoming batch holds
    only this process's rows and is assembled into global arrays via
    mesh.global_batch_put (the other hosts contribute theirs).
    """
    import collections

    queue = collections.deque()

    if rows is not None:
        if sharding is None or global_batch is None:
            raise ValueError("rows= needs sharding and global_batch")
        from fastvideotagging_tpu.parallel.mesh import global_batch_put

        def put(b):
            return global_batch_put(b, sharding, global_batch, rows)
    else:
        def put(b):
            if sharding is not None:
                return jax.tree.map(lambda x: jax.device_put(x, sharding), b)
            return jax.tree.map(jax.device_put, b)

    it = iter(batches)
    try:
        for _ in range(depth):
            queue.append(put(next(it)))
    except StopIteration:
        pass
    while queue:
        try:
            queue.append(put(next(it)))
        except StopIteration:
            pass
        yield queue.popleft()
