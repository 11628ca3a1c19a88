"""tag(video): the one-call inference entrypoint (SURVEY.md C17, §4.2; [B:5]
"one-call tag(video) inference entrypoint", [B:10] dense sampling on
long-form video).

Pipeline: decode -> dense/uniform clip sampling -> fused device preprocess ->
batched forward (fixed-size chunks, one compiled shape) -> sigmoid/softmax ->
f32 mean over clips -> [(tag, score), ...] above threshold.

Long-form videos stream: clips are decoded and scored in bounded chunks, so
memory is O(chunk), not O(video length) — the reference's long-context
mechanism (SURVEY.md §6.7), preserved exactly.
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np

from fastvideotagging_tpu.config import ClipSamplerConfig, DataConfig, ExperimentConfig, ModelConfig
from fastvideotagging_tpu.data import decode, sampler
from fastvideotagging_tpu.data.pipeline import _ensure_size
from fastvideotagging_tpu.models import heads, model_from_config
from fastvideotagging_tpu.ops.preprocess_kernel import preprocess_eval_clip


@dataclasses.dataclass
class TagResult:
    tag: str
    score: float
    index: int


def eval_clip_index(n_frames: int, sampler_cfg) -> np.ndarray:
    """The (K, T) eval clip index grid for a video of ``n_frames``."""
    s = sampler_cfg
    return sampler.sample_eval_indices(
        max(int(n_frames), 1), s.clip_len, s.stride, mode=s.eval_mode,
        num_clips=s.num_eval_clips)


def iter_eval_chunks(read_frames, clip_idx: np.ndarray, ship_hw,
                     clip_batch: int):
    """Yield ``(clips_u8, nclips)`` fixed-shape chunks in clip order —
    the chunking half of ``scores_from_frames``, shared with pipelined
    engines so overlap never changes what is scored.

    Each chunk is padded to ``clip_batch`` (one compiled shape);
    ``nclips`` counts the real (non-padding) clips."""
    k = clip_idx.shape[0]
    for i in range(0, k, clip_batch):
        chunk_idx = clip_idx[i : i + clip_batch]
        nclips, t = chunk_idx.shape
        flat = read_frames(chunk_idx.reshape(-1))
        flat = _ensure_size(flat, ship_hw)
        clips_u8 = flat.reshape((nclips, t) + flat.shape[1:])
        if nclips < clip_batch:  # pad to the compiled shape
            pad = np.zeros(
                (clip_batch - nclips,) + clips_u8.shape[1:], np.uint8)
            clips_u8 = np.concatenate([clips_u8, pad], axis=0)
        yield clips_u8, nclips


def scores_from_frames(read_frames, n_frames: int, sampler_cfg, ship_hw,
                       num_classes: int, clip_batch: int,
                       score_u8) -> np.ndarray:
    """The clip-aggregation loop shared by every serving engine and
    frame source (streaming decode, packed mmap).

    Dense/uniform clip sampling over ``n_frames``, fixed-size uint8
    chunks padded to ``clip_batch`` (one compiled shape), f64 score
    accumulation, mean over clips — the aggregation semantics all engines
    (jax, int8, native PJRT) must share bit-for-bit.
    ``read_frames(flat_idx)`` returns uint8 frames at any geometry
    (resized to ``ship_hw`` here if needed); ``score_u8(clips_u8,
    nclips)`` returns scores ``(nclips, num_classes)`` for the first
    ``nclips`` (non-padding) clips of the chunk.
    """
    clip_idx = eval_clip_index(n_frames, sampler_cfg)
    total = np.zeros((num_classes,), np.float64)
    # One-chunk lookahead: the previous chunk's readback (np.asarray blocks
    # until the device finishes) is delayed until AFTER the next chunk has
    # been decoded and dispatched, so host decode of chunk k+1 overlaps the
    # device's execution of chunk k when score_u8 returns a (still in
    # flight) device array — jax dispatch is async. Accumulation order is
    # unchanged, so results stay bit-identical; engines that return numpy
    # (the native daemon's synchronous request) are unaffected.
    pending = None
    for clips_u8, nclips in iter_eval_chunks(read_frames, clip_idx, ship_hw,
                                             clip_batch):
        scores = score_u8(clips_u8, nclips)
        if pending is not None:
            total += np.asarray(pending).astype(np.float64).sum(axis=0)
        pending = scores
    if pending is not None:
        total += np.asarray(pending).astype(np.float64).sum(axis=0)
    return (total / clip_idx.shape[0]).astype(np.float32)


def open_sequential_reader(video_path: str, sampler_cfg):
    """-> (probe frame count, SequentialReader) with the dense-eval cache
    size (2 clip spans of backward overlap). The ONE reader recipe shared
    by stream_video_scores and the pipelined native path — keep the cache
    policy identical or the two engines' decode behavior diverges."""
    n, _, _, _ = decode.probe_video(video_path)
    span = (sampler_cfg.clip_len - 1) * sampler_cfg.stride + 1
    return n, decode.SequentialReader(video_path,
                                      cache_size=max(128, 2 * span))


def stream_video_scores(video_path: str, sampler_cfg, ship_hw,
                        num_classes: int, clip_batch: int,
                        score_u8) -> np.ndarray:
    """scores_from_frames over one forward decode pass of a video file
    (O(video), overlap cache)."""
    n, reader = open_sequential_reader(video_path, sampler_cfg)
    with reader:
        return scores_from_frames(reader.read, n, sampler_cfg, ship_hw,
                                  num_classes, clip_batch, score_u8)


def rank_tags(scores: np.ndarray, tag_names: list[str],
              threshold: float = 0.5,
              top_k: int | None = None) -> list[TagResult]:
    """scores -> sorted [(tag, score, index), ...] above threshold."""
    if not np.all(np.isfinite(scores)):
        from fastvideotagging_tpu.utils.logging import get_logger

        # NaN fails every >= threshold test, so a diverged model would
        # otherwise return [] with no explanation.
        get_logger("fvt.tag").warning(
            "non-finite tag scores (%d/%d) — the model diverged in "
            "training (try --clip-grad-norm / a lower --lr) or the "
            "weights do not match the architecture; no tags can clear "
            "the threshold",
            int((~np.isfinite(scores)).sum()), scores.size)
    order = np.argsort(-scores, kind="stable")
    results = [
        TagResult(tag_names[i], float(scores[i]), int(i))
        for i in order
        if scores[i] >= threshold
    ]
    if top_k is not None:
        results = results[:top_k]
    return results


class Tagger:
    """Reusable tagger: holds the model, weights, and compiled forward."""

    def __init__(
        self,
        cfg: ExperimentConfig,
        variables: dict,
        tag_names: list[str] | None = None,
        clip_batch: int = 8,
        int8: bool = False,
    ):
        self.cfg = cfg
        self.variables = variables
        self.clip_batch = clip_batch
        k = cfg.model.num_classes
        self.tag_names = tag_names or [f"tag_{i}" for i in range(k)]
        if len(self.tag_names) != k:
            raise ValueError(
                f"{len(self.tag_names)} tag names for {k} classes"
            )
        model = model_from_config(cfg.model)
        self._apply = jax.jit(
            lambda v, x: heads.predict_scores(
                model.apply(v, x, train=False), cfg.model.multilabel
            )
        )
        # int8 PTQ serving (ops/int8_infer): the jitted engine is built
        # ONCE here (qpack is a traced argument — per-video rebuilds would
        # recompile the backbone per video); the qpack self-calibrates on
        # the first preprocessed chunk of each video (representative by
        # construction).
        self.int8 = int8
        self._int8_apply = None
        self._qpack = None
        if int8:
            from fastvideotagging_tpu.evaluation.quantized import (
                make_int8_engine,
            )
            from fastvideotagging_tpu.ops.arch_spec import COVERED_MODELS

            if cfg.model.name not in COVERED_MODELS:
                raise ValueError(
                    f"int8 tagging covers {sorted(COVERED_MODELS)}; "
                    f"got {cfg.model.name!r}")
            self._int8_apply = make_int8_engine(
                cfg.model.name, multilabel=cfg.model.multilabel)

    @property
    def sampler_cfg(self):
        return self.cfg.data.sampler

    @property
    def ship_hw(self):
        return self.cfg.data.source_hw or self.cfg.data.resize_hw

    @property
    def num_classes(self) -> int:
        return self.cfg.model.num_classes

    def video_scores(self, video_path: str) -> np.ndarray:
        """Aggregated per-tag scores for one video, streaming over clips."""
        self._qpack = None  # recalibrate per video (engine stays compiled)
        return stream_video_scores(
            video_path, self.sampler_cfg, self.ship_hw, self.num_classes,
            self.clip_batch, self._score_u8)

    def scores_from(self, read_frames, n_frames: int) -> np.ndarray:
        """Aggregated scores from an arbitrary frame source (e.g. a pack)."""
        self._qpack = None  # recalibrate per video (engine stays compiled)
        return scores_from_frames(
            read_frames, n_frames, self.sampler_cfg, self.ship_hw,
            self.num_classes, self.clip_batch, self._score_u8)

    def _score_u8(self, clips_u8: np.ndarray, nclips: int) -> np.ndarray:
        d = self.cfg.data
        clips = preprocess_eval_clip(
            clips_u8, d.resize_hw, d.crop_hw, d.mean, d.std,
            out_dtype_name=self.cfg.model.compute_dtype,
        )
        if self.int8:
            if self._qpack is None:
                from fastvideotagging_tpu.evaluation.quantized import (
                    quantize_for,
                )

                self._qpack = quantize_for(
                    self.cfg.model.name, self.variables, [clips])
            # return the still-in-flight device array (sliced lazily):
            # jax dispatch is async, so the caller's delayed np.asarray
            # readback lets the NEXT chunk's decode overlap this forward
            return self._int8_apply(self._qpack, clips)[:nclips]
        return self._apply(self.variables, clips)[:nclips]

    def tag(self, video_path: str, threshold: float = 0.5,
            top_k: int | None = None) -> list[TagResult]:
        return rank_tags(self.video_scores(video_path), self.tag_names,
                         threshold=threshold, top_k=top_k)


def iter_pack_tags(engine, pack, threshold: float = 0.5,
                   top_k: int | None = None, root: str = ""):
    """Bulk-tag every video in a ``.fvtpack`` — the decode-once backfill
    tier: zero FFmpeg per request, frames served from mmap at the pack's
    measured 1793 clips/s (PERF.md), feeding any engine that exposes
    ``scores_from`` (Tagger incl. int8, NativeTagger).

    Sampling parity with the streaming ``tag()`` holds by construction:
    the pack stores ship-geometry frames from the same decode+resize path
    and ``probe_frames`` (the container-reported count the streaming
    sampler draws indices from). Yields ``(video_path, [TagResult, ...])``
    per video in pack order (paths joined onto ``root``, the same
    convention as the pack-consuming loaders).
    """
    from fastvideotagging_tpu.data.packed import Pack

    pack = pack if isinstance(pack, Pack) else Pack(pack)
    ship = tuple(engine.ship_hw)
    if (pack.height, pack.width) != ship:
        raise ValueError(
            f"pack geometry {pack.height}x{pack.width} != the engine's ship "
            f"geometry {ship}; re-run cli.prepare --pack at this config")
    if hasattr(engine, "iter_pack_scores"):
        # Engines that can keep several chunks in flight (NativeTagger's
        # pipelined daemon) score the whole pack themselves; the chunking
        # and f64 aggregation are the shared iter_eval_chunks/
        # scores_from_frames semantics either way.
        for path, scores in engine.iter_pack_scores(pack, root=root):
            yield path, rank_tags(scores, engine.tag_names,
                                  threshold=threshold, top_k=top_k)
        return
    for i, rec in enumerate(pack.records(root)):
        scores = engine.scores_from(
            lambda idx, _i=i: pack.gather(_i, idx),
            pack.entries[i]["probe_frames"])
        yield rec.path, rank_tags(scores, engine.tag_names,
                                  threshold=threshold, top_k=top_k)


def tag(
    video_path: str,
    checkpoint: str | None = None,
    variables: dict | None = None,
    model_name: str = "r2plus1d_18",
    num_classes: int = 101,
    multilabel: bool = True,
    tag_names: list[str] | None = None,
    threshold: float = 0.5,
    top_k: int | None = None,
    clip_len: int = 16,
    stride: int = 1,
    eval_mode: str = "dense",
    cfg: ExperimentConfig | None = None,
    int8: bool = False,
) -> list[TagResult]:
    """Convenience one-call API mirroring the reference's inference script."""
    if cfg is None:
        cfg = ExperimentConfig(
            model=ModelConfig(name=model_name, num_classes=num_classes,
                              multilabel=multilabel),
            data=DataConfig(sampler=ClipSamplerConfig(
                clip_len=clip_len, stride=stride, eval_mode=eval_mode)),
        )
    if variables is None:
        if checkpoint is None:
            raise ValueError("provide either `variables` or `checkpoint`")
        from fastvideotagging_tpu.train.checkpoint import load_weights

        variables = load_weights(checkpoint)
    tagger = Tagger(cfg, variables, tag_names, int8=int8)
    return tagger.tag(video_path, threshold=threshold, top_k=top_k)
