"""Multi-clip evaluation (SURVEY.md C16, §4.5).

Per video: K deterministic clips (center/uniform/dense per config) -> batched
forward -> scores -> **mean over clips in clip order, f32 accumulation** ->
video-level prediction. The fixed clip order + f32 sum is the "bit-for-bit at
eval" contract [B:5]: rerunning eval yields bitwise-identical video scores.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from fastvideotagging_tpu.config import ExperimentConfig
from fastvideotagging_tpu.data.pipeline import ClipDataset
from fastvideotagging_tpu.models import heads, model_from_config
from fastvideotagging_tpu.ops.preprocess_kernel import preprocess_eval_clip
from fastvideotagging_tpu.train.metrics import (
    mean_average_precision,
    per_tag_precision_recall,
    topk_accuracy,
)
from fastvideotagging_tpu.utils.logging import get_logger

log = get_logger("fvt.eval")


def _make_apply(model, multilabel, mesh=None):
    """Build the jitted scores fn ONCE per eval run — a fresh lambda per
    video would miss jax's jit cache and retrace every call.

    Multi-host (mesh spanning processes): scores are forced fully-replicated
    so every host can read them back (np.asarray on a cross-process sharded
    output is illegal); the all-gather is tiny — (clip_batch, C) f32.
    """
    kw = {}
    if mesh is not None and jax.process_count() > 1:
        from fastvideotagging_tpu.parallel.mesh import replicated

        kw["out_shardings"] = replicated(mesh)
    return jax.jit(
        lambda v, x: heads.predict_scores(
            model.apply(v, x, train=False), multilabel
        ),
        **kw,
    )


def _forward_scores(apply, variables, clips, clip_batch=8, sharding=None):
    """Forward (K,T,ch,cw,3) clips in fixed-size chunks; returns (K,C) f32.

    Chunks are padded to clip_batch so only one program shape is compiled.
    ``sharding``: optional NamedSharding for the chunk's batch axis —
    multi-chip data-parallel eval (clips split over the mesh's data axis,
    XLA inserts the gathers). The per-clip forward has no cross-clip math
    (BN uses frozen stats at eval), so scores match single-device to float
    tolerance — the sharded program is a separate executable, so only
    fusion-level reassociation moves the last bits — and each spelling is
    bitwise-deterministic across reruns (the [B:5] contract).
    """
    k = clips.shape[0]
    out = []
    for i in range(0, k, clip_batch):
        chunk = clips[i : i + clip_batch]
        n = chunk.shape[0]
        if n < clip_batch:
            pad = jnp.zeros((clip_batch - n,) + tuple(chunk.shape[1:]), chunk.dtype)
            chunk = jnp.concatenate([chunk, pad], axis=0)
        if sharding is not None:
            chunk = jax.device_put(chunk, sharding)
        out.append(np.asarray(apply(variables, chunk))[:n])
    return np.concatenate(out, axis=0)


def _eval_plan(mesh, clip_batch):
    """-> (sharding | None, effective clip_batch).

    Single-process, a clip_batch not divisible by the data-axis size falls
    back to unsharded eval (warn).  Multi-host there is NO unsharded
    fallback — the params live on the cross-process mesh, so a host-local
    forward is impossible; instead the clip_batch is rounded UP to a
    multiple of the shard count (chunks are padded to clip_batch anyway,
    so scores are unchanged)."""
    if mesh is None:
        return None, clip_batch
    from fastvideotagging_tpu.parallel.mesh import DATA_AXIS, batch_sharding

    shards = mesh.shape[DATA_AXIS]
    if shards <= 1:
        return None, clip_batch
    if clip_batch % shards:
        if jax.process_count() > 1:
            rounded = ((clip_batch + shards - 1) // shards) * shards
            log.warning(
                "eval: clip_batch=%d not divisible by data shards %d; "
                "padding chunks to %d (multi-host has no unsharded "
                "fallback)", clip_batch, shards, rounded)
            return batch_sharding(mesh), rounded
        log.warning(
            "eval: clip_batch=%d not divisible by data shards %d; "
            "evaluating unsharded", clip_batch, shards)
        return None, clip_batch
    return batch_sharding(mesh), clip_batch


def evaluate_video_scores(
    model, variables, dataset: ClipDataset, cfg: ExperimentConfig,
    clip_batch: int = 8, apply_fn=None, mesh=None,
) -> tuple[np.ndarray, list]:
    """Per-video aggregated scores. Returns (scores (N,C) f32, records).

    ``apply_fn(variables, clips) -> scores`` overrides the default jitted
    ``model.apply`` — the hook for alternate serving engines (e.g. the int8
    PTQ engine, ops/int8_infer: pass the qpack as ``variables``). The
    aggregation spec downstream is identical, so engine comparisons are
    bitwise-fair.
    ``mesh``: evaluate data-parallel across it (clip chunks sharded over
    the data axis; see tests/test_distributed.py for the 8-device ==
    1-device equality)."""
    from concurrent.futures import ThreadPoolExecutor

    d = cfg.data
    apply = apply_fn or _make_apply(model, cfg.model.multilabel, mesh=mesh)
    sharding, clip_batch = _eval_plan(mesh, clip_batch)
    if (apply_fn is not None and sharding is not None
            and jax.process_count() > 1):
        # Custom engines (e.g. the int8 apply_fn) are jitted without the
        # replicated out_shardings _make_apply adds for multi-host; their
        # data-sharded cross-process output cannot be read back — wrap once
        # to force replication (nested jit inlines, one extra all-gather of
        # the tiny score tensor).
        from fastvideotagging_tpu.parallel.mesh import replicated

        inner = apply_fn
        apply = jax.jit(lambda v, x: inner(v, x),
                        out_shardings=replicated(mesh))
    all_scores = []
    # One-video decode lookahead: video i+1 decodes on a worker thread
    # (cv2 releases the GIL) while video i's clips forward on the device.
    # Videos are still processed strictly in order, so the aggregation
    # spec (f32 sum in clip order) is untouched.
    # host_crop (DataConfig): apply the center crop host-side and ship only
    # the (crop_hw) window — same identity-resize row-slice argument as the
    # train path (tests/test_host_crop.py), bit-identical scores with 1.75x
    # fewer H2D bytes per clip. The dataset guard already rejected
    # host_crop+source_hw, so clips arrive at resize_hw here.
    host_crop = getattr(d, "host_crop", False)
    ch, cw = d.crop_hw
    ctop, cleft = (d.resize_hw[0] - ch) // 2, (d.resize_hw[1] - cw) // 2
    pre_hw = d.crop_hw if host_crop else d.resize_hw
    with ThreadPoolExecutor(max_workers=1) as pool:
        pending = pool.submit(dataset.get_eval_clips, 0) if len(dataset) else None
        for i in range(len(dataset)):
            clips_u8, _rec = pending.result()
            pending = (pool.submit(dataset.get_eval_clips, i + 1)
                       if i + 1 < len(dataset) else None)
            if host_crop:
                clips_u8 = clips_u8[:, :, ctop:ctop + ch, cleft:cleft + cw]
            clips = preprocess_eval_clip(
                clips_u8, pre_hw, d.crop_hw, d.mean, d.std,
                out_dtype_name=cfg.model.compute_dtype,
            )
            scores = _forward_scores(apply, variables, clips, clip_batch,
                                     sharding=sharding)
            # Aggregation spec: f32 sum in clip order, divided by clip count.
            video = scores.astype(np.float32).sum(axis=0) / scores.shape[0]
            all_scores.append(video)
    out = np.stack(all_scores)
    if not np.all(np.isfinite(out)):
        # Without this, a diverged model reads as chance-level top1 (argmax
        # of a NaN row is 0) and silently-empty tags — diagnose it loudly.
        bad = int((~np.isfinite(out).all(axis=1)).sum())
        log.warning(
            "non-finite scores for %d/%d videos — the model diverged in "
            "training (try --clip-grad-norm / a lower --lr) or the weights "
            "do not match the architecture; metrics are meaningless",
            bad, out.shape[0])
    return out, dataset.records


def evaluate(
    model, variables, dataset: ClipDataset, cfg: ExperimentConfig,
    clip_batch: int = 8, threshold: float = 0.5, apply_fn=None, mesh=None,
) -> dict:
    """Full eval pass -> scalar metrics dict."""
    scores, records = evaluate_video_scores(model, variables, dataset, cfg,
                                            clip_batch, apply_fn=apply_fn,
                                            mesh=mesh)
    out: dict = {"num_videos": len(records)}
    if cfg.model.multilabel:
        multihot = np.stack([r.multihot(cfg.model.num_classes) for r in records])
        pr = per_tag_precision_recall(scores, multihot, threshold)
        out["mAP"] = mean_average_precision(scores, multihot)
        out["macro_f1"] = float(pr["f1"].mean())
    else:
        labels = np.asarray([r.label for r in records])
        out["top1"] = topk_accuracy(scores, labels, k=1)
        out["top5"] = topk_accuracy(scores, labels, k=min(5, scores.shape[1]))
    return out


def make_eval_fn(cfg: ExperimentConfig, val_records, num_tags=None,
                 clip_batch: int = 8, mesh=None):
    """Builds the per-epoch eval hook used by train.fit.

    ``val_records``: VideoRecords or a ``.fvtpack`` path (decode-once tier).
    ``mesh``: run the eval forward data-parallel over it (fit passes its
    training mesh so the per-epoch eval uses every chip, not one). With a
    mesh spanning multiple hosts, every host decodes the full val list
    (identical inputs feed the global device_put) and the forward shards
    over ALL chips of the job — host decode is duplicated, device time is
    not.
    """
    from fastvideotagging_tpu.data.packed import open_dataset

    dataset = open_dataset(val_records, cfg.data, mode="eval",
                           num_tags=num_tags)
    model = model_from_config(cfg.model)
    # ONE jitted apply for the whole run — building it inside eval_fn would
    # hand evaluate() a fresh lambda per epoch, missing jax's jit cache and
    # recompiling the full backbone every epoch.
    apply = _make_apply(model, cfg.model.multilabel, mesh=mesh)

    def eval_fn(state, epoch):
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        scalars = evaluate(model, variables, dataset, cfg, clip_batch,
                           apply_fn=apply, mesh=mesh)
        log.info("epoch %d eval: %s", epoch, scalars)
        return scalars

    return eval_fn
