"""tag(video) over the native C++ PJRT daemon (SURVEY.md §6.4 native tier).

The Python side here is a pure HOST front-end: decode + clip sampling +
request framing (numpy only — it never creates a jax device client, so it
coexists with the one-TPU-client tunnel rule). All device work — staging,
the fused preprocess+backbone+head program, readback — happens in the
long-running ``pjrt_runner --serve`` child, compiled ONCE from the
``cli.export`` artifact directory (serving.stablehlo + meta.json).

    with NativeTagger("art/") as t:
        results = t.tag("video.mp4", threshold=0.5)

Aggregation semantics (dense sampling, f64 accumulation, mean over clips)
are shared with the in-process Tagger via ``stream_video_scores`` — the
two engines are parity-tested against each other on-chip
(tests/test_native_pjrt.py, FVT_NATIVE_SERVING gate).
"""

from __future__ import annotations

import json
import os
import tempfile

import numpy as np

from fastvideotagging_tpu.config import ClipSamplerConfig
from fastvideotagging_tpu.evaluation.tagger import (
    TagResult,
    rank_tags,
    stream_video_scores,
)
from fastvideotagging_tpu.native.pjrt import NativeServer


class NativeTagger:
    """Video tagger backed by the no-Python native serving daemon."""

    def __init__(self, artifacts_dir: str, tag_names: list[str] | None = None,
                 workdir: str | None = None, plugin: str | None = None,
                 client_options: dict | None = None,
                 ready_timeout: float = 600.0, pipeline: int = 0):
        meta_path = os.path.join(artifacts_dir, "meta.json")
        module = os.path.join(artifacts_dir, "serving.stablehlo")
        if not os.path.exists(meta_path) or not os.path.exists(module):
            raise FileNotFoundError(
                f"{artifacts_dir!r} is not an export-CLI artifact dir "
                "(need meta.json + serving.stablehlo; create with "
                "`python -m fastvideotagging_tpu.cli.export ... "
                "--format stablehlo|both`)")
        with open(meta_path) as f:
            self.meta = json.load(f)
        shape = tuple(self.meta["input"]["shape"])  # (B, T, H, W, 3)
        self.clip_batch = shape[0]
        self.ship_hw = (shape[2], shape[3])
        self.num_classes = int(self.meta["num_classes"])
        self.sampler_cfg = ClipSamplerConfig(**self.meta["sampler"])
        self.tag_names = (tag_names or self.meta.get("tag_names")
                          or [f"tag_{i}" for i in range(self.num_classes)])
        if len(self.tag_names) != self.num_classes:
            raise ValueError(f"{len(self.tag_names)} tag names for "
                             f"{self.num_classes} classes")
        self._own_workdir = workdir is None
        self.workdir = workdir or tempfile.mkdtemp(prefix="fvt_native_serve_")
        try:
            self.server = NativeServer(
                module, [(shape, np.uint8)], self.workdir, plugin=plugin,
                client_options=client_options, ready_timeout=ready_timeout,
                pipeline=pipeline)
        except BaseException:
            # close() can never run without self.server — don't leak the
            # mkdtemp (and the daemon's compile_options.pb inside) on every
            # failed construction (e.g. a service retry loop)
            if self._own_workdir:
                import shutil

                shutil.rmtree(self.workdir, ignore_errors=True)
            raise

    def _score_u8(self, clips_u8: np.ndarray, nclips: int) -> np.ndarray:
        return self.server.request([clips_u8])[0][:nclips]

    def _pipelined_scores(self, chunks, num_clips: int) -> np.ndarray:
        """Aggregate one video's scores with up to pipeline+1 chunk
        requests in flight (host decode / mmap gather of chunk k+1 overlaps
        the daemon's execution of chunk k). Chunks come from the shared
        ``iter_eval_chunks`` in clip order and the f64 accumulation is the
        ``scores_from_frames`` spec — bit-identical to sequential."""
        nclips_per_req: list[int] = []

        def requests():
            for clips_u8, nclips in chunks:
                nclips_per_req.append(nclips)
                yield [clips_u8]

        total = np.zeros((self.num_classes,), np.float64)
        depth = max(1, self.server.pipeline + 1)
        for m, outs in enumerate(self.server.request_many(requests(),
                                                          depth=depth)):
            total += np.asarray(
                outs[0][:nclips_per_req[m]]).astype(np.float64).sum(axis=0)
        return (total / num_clips).astype(np.float32)

    def video_scores(self, video_path: str) -> np.ndarray:
        if self.server.pipeline <= 0:
            return stream_video_scores(
                video_path, self.sampler_cfg, self.ship_hw, self.num_classes,
                self.clip_batch, self._score_u8)
        # pipelined: the single forward decode pass feeds chunks into the
        # daemon ahead of execution (same one-pass reader + overlap cache
        # as stream_video_scores)
        from fastvideotagging_tpu.evaluation.tagger import (
            eval_clip_index,
            iter_eval_chunks,
            open_sequential_reader,
        )

        n, reader = open_sequential_reader(video_path, self.sampler_cfg)
        clip_idx = eval_clip_index(n, self.sampler_cfg)
        with reader:
            return self._pipelined_scores(
                iter_eval_chunks(reader.read, clip_idx, self.ship_hw,
                                 self.clip_batch),
                clip_idx.shape[0])

    def scores_from(self, read_frames, n_frames: int) -> np.ndarray:
        """Aggregated scores from an arbitrary frame source (e.g. a pack)."""
        from fastvideotagging_tpu.evaluation.tagger import scores_from_frames

        return scores_from_frames(
            read_frames, n_frames, self.sampler_cfg, self.ship_hw,
            self.num_classes, self.clip_batch, self._score_u8)

    def iter_pack_scores(self, pack, root: str = ""):
        """Score every video of a pack, keeping requests in flight across
        video boundaries (``NativeServer.request_many``) so mmap gather and
        H2D staging of the next chunks hide behind the daemon's execution
        of the current one. Yields ``(video_path, scores)`` in pack order.

        Bit-identical to the sequential path: chunks come from the shared
        ``iter_eval_chunks`` in the same order, replies are consumed in
        request order, and each video's scores use the same ordered f64
        accumulation as ``scores_from_frames``."""
        from fastvideotagging_tpu.data.packed import Pack
        from fastvideotagging_tpu.evaluation.tagger import (
            eval_clip_index,
            iter_eval_chunks,
        )

        pack = pack if isinstance(pack, Pack) else Pack(pack)
        recs = pack.records(root)
        meta: list[tuple[int, int]] = []  # per request: (video index, nclips)
        num_clips = [0] * len(recs)

        def requests():
            for i in range(len(recs)):
                clip_idx = eval_clip_index(
                    pack.entries[i]["probe_frames"], self.sampler_cfg)
                num_clips[i] = clip_idx.shape[0]
                for clips_u8, nclips in iter_eval_chunks(
                        lambda idx, _i=i: pack.gather(_i, idx), clip_idx,
                        self.ship_hw, self.clip_batch):
                    meta.append((i, nclips))
                    yield [clips_u8]

        total = np.zeros((self.num_classes,), np.float64)
        done_chunks = 0
        video_i = 0
        depth = max(1, self.server.pipeline + 1)  # pipeline=0 -> sequential
        for m, outs in enumerate(self.server.request_many(requests(),
                                                          depth=depth)):
            i, nclips = meta[m]
            assert i == video_i, "replies out of pack order"
            total += np.asarray(
                outs[0][:nclips]).astype(np.float64).sum(axis=0)
            done_chunks += nclips
            if done_chunks == num_clips[i]:
                yield recs[i].path, (total / num_clips[i]).astype(np.float32)
                total = np.zeros((self.num_classes,), np.float64)
                done_chunks = 0
                video_i += 1

    def tag(self, video_path: str, threshold: float = 0.5,
            top_k: int | None = None) -> list[TagResult]:
        return rank_tags(self.video_scores(video_path), self.tag_names,
                         threshold=threshold, top_k=top_k)

    def close(self) -> None:
        self.server.close()
        if self._own_workdir:
            import shutil

            shutil.rmtree(self.workdir, ignore_errors=True)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
