"""Packed pre-decoded clip dataset — the decode-once "Fast" tier (N3).

The reference's identity was making video IO fast (SURVEY.md §1: its NVVL/
FFmpeg prep decoded ahead of the trainer). On this stack the measured
bottleneck is the same: host cv2 decode sustains ~70-90 clips/s on one core
while the chip consumes 273-392 (BENCH_r02) — real-video training is
loader-bound 4-6x. This module removes FFmpeg from the train loop entirely:

* ``write_pack`` (the prepare step) decodes each video ONCE, resizes every
  frame to the SHIP geometry — what the streaming loader would send to the
  device: ``DataConfig.source_hw`` if the config pins one, else
  ``resize_hw`` — with the SAME half-pixel bilinear the streaming loader
  uses (native/framepack.c via ``pipeline._ensure_size``), and streams the
  uint8 stacks into one flat mmap-able file with a JSON footer index.
  Matching the ship geometry (not unconditionally ``resize_hw``) is what
  keeps packed batches BIT-identical for ``source_hw`` configs, where the
  device does the resize in float and a host-resized uint8 pack would
  carry extra rounding. Memory is O(chunk) even for long-form videos
  (``decode.iter_frame_chunks``).
* ``PackedDataset`` subclasses ``pipeline.ClipDataset`` and overrides only
  the two frame-access points (``_num_frames``, ``_clip_frames``), so clip
  sampling, crop/flip draws, fault policy and collation are BY CONSTRUCTION
  identical to the streaming loader: same (seed, epoch, index) -> same
  batch, bit for bit (tests/test_packed.py golden tests).

File layout (version 1, little-endian)::

    [0:8)    magic  b"FVTPACK1"
    [8:16)   uint64 absolute byte offset of the JSON index
    [16:...) frame data: per video, C-order uint8 (frames, H, W, 3)
    [index_offset:EOF) JSON index {height, width, num_tags?, videos: [
        {path, label, tags, frames, probe_frames, offset}]}

``probe_frames`` preserves the container-reported frame count the streaming
sampler draws indices from (``decode.probe_video`` — an upper bound on some
containers); ``frames`` is what actually decoded. Reads clamp to the last
stored frame, mirroring ``read_frames_at``'s fill policy, so sampling
parity holds even for lying containers.
"""

from __future__ import annotations

import json
import os
import struct

import numpy as np

from fastvideotagging_tpu.config import DataConfig
from fastvideotagging_tpu.data import decode
from fastvideotagging_tpu.data.pipeline import ClipDataset, _ensure_size
from fastvideotagging_tpu.data.ucf101 import VideoRecord
from fastvideotagging_tpu.utils.logging import get_logger

log = get_logger("fvt.data")

MAGIC = b"FVTPACK1"
PACK_EXT = ".fvtpack"
_HEADER = 16  # magic + uint64 index offset


def is_pack(path) -> bool:
    return isinstance(path, (str, os.PathLike)) and str(path).endswith(PACK_EXT)


def write_pack(records, out_path: str, resize_hw, root: str = "",
               chunk_size: int = 256, num_tags: int | None = None) -> dict:
    """Decode each record once -> ship-geometry uint8 stacks in a flat file.

    ``resize_hw`` must be the config's SHIP geometry (``source_hw`` if set,
    else ``resize_hw`` — see module docstring). Atomic (tmp + rename).
    Undecodable videos are skipped with a log line (the loader fault
    policy, applied once at prepare time instead of every epoch).
    ``root``: stored paths are relative to it when given, keeping packs
    relocatable. ``num_tags``: record it in the index when packing
    multi-label tag lists (enables multilabel training from the pack).
    Returns a summary dict.
    """
    h, w = resize_hw
    frame_bytes = h * w * 3
    entries: list[dict] = []
    skipped = 0
    tmp = str(out_path) + ".tmp"
    with open(tmp, "wb") as f:
        f.write(MAGIC)
        f.write(struct.pack("<Q", 0))  # index offset, patched at the end
        for rec in records:
            start = f.tell()
            try:
                probe_n = max(int(decode.probe_video(rec.path)[0]), 1)
                stored = 0
                for chunk in decode.iter_frame_chunks(rec.path, chunk_size):
                    if chunk.shape[1:3] != (h, w):
                        chunk = _ensure_size(chunk, (h, w))
                    f.write(np.ascontiguousarray(chunk))
                    stored += len(chunk)
            except decode.DecodeError as e:
                log.warning("pack: skipping undecodable %s (%s)", rec.path, e)
                f.seek(start)
                f.truncate()
                skipped += 1
                continue
            rel = os.path.relpath(rec.path, root) if root else rec.path
            entries.append({
                "path": rel,
                "label": rec.label,
                "tags": list(rec.tags),
                "frames": stored,
                "probe_frames": probe_n,
                "offset": start - _HEADER,
            })
        index_offset = f.tell()
        index = {"height": h, "width": w, "videos": entries}
        if num_tags is not None:
            index["num_tags"] = num_tags
        f.write(json.dumps(index).encode())
        f.seek(len(MAGIC))
        f.write(struct.pack("<Q", index_offset))
    os.replace(tmp, out_path)
    data_bytes = sum(e["frames"] for e in entries) * frame_bytes
    return {"videos": len(entries), "skipped": skipped,
            "frames": sum(e["frames"] for e in entries),
            "bytes": _HEADER + data_bytes, "path": str(out_path)}


class Pack:
    """mmap-backed reader of one pack file. Thread-safe (read-only views)."""

    def __init__(self, path):
        self.path = str(path)
        with open(self.path, "rb") as f:
            if f.read(8) != MAGIC:
                raise ValueError(f"not a {PACK_EXT} file: {self.path}")
            (index_offset,) = struct.unpack("<Q", f.read(8))
            f.seek(index_offset)
            index = json.loads(f.read().decode())
        self.height = int(index["height"])
        self.width = int(index["width"])
        self.num_tags = index.get("num_tags")
        self.entries = index["videos"]
        self._frame_bytes = self.height * self.width * 3
        # One flat uint8 memmap; the page cache is the only "cache" needed.
        self._mm = np.memmap(self.path, dtype=np.uint8, mode="r")

    def __len__(self) -> int:
        return len(self.entries)

    def records(self, root: str = "") -> list[VideoRecord]:
        return [
            VideoRecord(path=os.path.join(root, e["path"]) if root else e["path"],
                        label=e["label"], tags=tuple(e["tags"]))
            for e in self.entries
        ]

    def video_view(self, i: int) -> np.ndarray:
        """Zero-copy (frames, H, W, 3) view of video ``i``."""
        e = self.entries[i]
        start = _HEADER + e["offset"]
        flat = self._mm[start : start + e["frames"] * self._frame_bytes]
        return flat.reshape(e["frames"], self.height, self.width, 3)

    def gather(self, i: int, frame_idx: np.ndarray) -> np.ndarray:
        """Copy out frames at ``frame_idx`` (clamped to the stored range)."""
        v = self.video_view(i)
        return np.asarray(v[np.minimum(np.asarray(frame_idx), len(v) - 1)])


class PackedDataset(ClipDataset):
    """ClipDataset over a pack file: zero FFmpeg in the train loop.

    Drop-in for ClipDataset everywhere (train_batches, evaluate, fit):
    only the frame-access points differ, so sampling semantics are shared
    with the streaming loader by construction.
    """

    def __init__(self, pack, data_cfg: DataConfig, mode: str = "train",
                 num_tags: int | None = None, seed: int = 0, root: str = ""):
        self.pack = pack if isinstance(pack, Pack) else Pack(pack)
        ship = tuple(getattr(data_cfg, "source_hw", None)
                     or data_cfg.resize_hw)
        if (self.pack.height, self.pack.width) != ship:
            raise ValueError(
                f"pack geometry {self.pack.height}x{self.pack.width} != "
                f"config ship geometry {ship} (source_hw if set, else "
                f"resize_hw); re-run the prepare step (cli.prepare --pack) "
                f"at the ship geometry so packed batches stay bit-identical "
                f"to the streaming loader")
        if num_tags is None:
            num_tags = self.pack.num_tags
        elif self.pack.num_tags is None:
            raise ValueError(
                "multilabel training needs a pack written from tag lists "
                "(cli.prepare --pack-lists ... --tag-lists); this pack was "
                "written from class lists and carries no tag sets, so "
                "multihot targets would be all-zero")
        super().__init__(self.pack.records(root), data_cfg, mode=mode,
                         num_tags=num_tags, seed=seed)
        # The geometry check above makes the parent's ship_hw == the pack
        # geometry, so _clip_frames can return stored bytes unmodified.
        self._index_of = {r.path: i for i, r in enumerate(self.records)}

    def _num_frames(self, rec: VideoRecord) -> int:
        return self.pack.entries[self._index_of[rec.path]]["probe_frames"]

    def _clip_frames(self, rec: VideoRecord, frame_idx: np.ndarray) -> np.ndarray:
        return self.pack.gather(self._index_of[rec.path], frame_idx)


def open_dataset(records_or_pack, data_cfg: DataConfig, mode: str = "train",
                 num_tags: int | None = None, seed: int = 0):
    """Dataset factory: a ``.fvtpack`` path -> PackedDataset (decode-once
    tier); a list of VideoRecords -> streaming ClipDataset."""
    if is_pack(records_or_pack):
        return PackedDataset(records_or_pack, data_cfg, mode=mode,
                             num_tags=num_tags, seed=seed)
    return ClipDataset(records_or_pack, data_cfg, mode=mode,
                       num_tags=num_tags, seed=seed)
