"""Serving-artifact export CLI (SURVEY.md §6.4 deployment surface).

Bakes trained weights into the serving program (fused uint8 preprocess +
backbone + sigmoid/softmax, evaluation/serving.py) and writes deployable
artifacts to ``--out``:

* ``serving.jax`` — jax.export artifact, reloadable by any JAX process
  via ``evaluation.serving.load_serving`` (``--format jax``/``both``).
* ``serving.stablehlo`` — raw StableHLO bytecode for the no-Python C++
  PJRT runner (``native/pjrt_runner.cc``) or any PJRT plugin
  (``--format stablehlo``/``both``).
* ``meta.json`` — input/output shapes+dtypes, model identity, tag names:
  everything a serving front-end needs to feed the program.

``--int8`` exports through the PTQ engine (int8 weights + requant
constants baked in as program constants), calibrated on dense clips from
``--calib-video`` — pass a clip representative of production traffic.

    python -m fastvideotagging_tpu.cli.export --weights w_dir --out art/ \
        --model r2plus1d_18 --num-classes 1000 --multilabel \
        --clip-batch 8 [--int8 --calib-video sample.mp4] [--platforms tpu]
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

from fastvideotagging_tpu.cli.common import (
    add_common_flags, apply_platform, build_config,
)
from fastvideotagging_tpu.config import ExperimentConfig
from fastvideotagging_tpu.train.checkpoint import load_weights
from fastvideotagging_tpu.utils.logging import get_logger

log = get_logger("fvt.export")


def parse_args(argv=None) -> argparse.Namespace:
    p = argparse.ArgumentParser(description=__doc__)
    add_common_flags(p)
    p.add_argument("--weights", required=True,
                   help="weights dir from export_weights / orbax")
    p.add_argument("--out", required=True, help="output artifact directory")
    p.add_argument("--clip-batch", type=int, default=8,
                   help="baked batch size of the serving program")
    p.add_argument("--format", choices=["jax", "stablehlo", "both"],
                   default="both")
    p.add_argument("--platforms", nargs="*", default=None, metavar="PLAT",
                   help="cross-platform lowering targets, e.g. --platforms "
                        "tpu (default: the current backend)")
    p.add_argument("--tag-names", default=None,
                   help="text file, one tag name per line, copied into "
                        "meta.json")
    p.add_argument("--int8", action="store_true",
                   help="export through the int8 PTQ engine")
    p.add_argument("--calib-video", action="append", default=None,
                   metavar="VIDEO",
                   help="calibration video for --int8 (repeatable)")
    p.add_argument("--calib-clips", type=int, default=8,
                   help="max calibration clips per video")
    return p.parse_args(argv)


def collect_calib_clips(cfg: ExperimentConfig, video_path: str,
                        clip_batch: int, max_clips: int = 8) -> np.ndarray:
    """Dense-sampled uint8 clips (n, T, H, W, 3) at the serving ship
    geometry — the same decode path the Tagger streams (tagger.py:82),
    bounded to ``max_clips``."""
    from fastvideotagging_tpu.data import decode, sampler
    from fastvideotagging_tpu.data.pipeline import _ensure_size

    d = cfg.data
    s = d.sampler
    n_frames, _, _, _ = decode.probe_video(video_path)
    clip_idx = sampler.sample_eval_indices(
        max(int(n_frames), 1), s.clip_len, s.stride, mode=s.eval_mode,
        num_clips=s.num_eval_clips)[:max_clips]
    ship_hw = d.source_hw or d.resize_hw
    span = (s.clip_len - 1) * s.stride + 1
    with decode.SequentialReader(video_path,
                                 cache_size=max(128, 2 * span)) as reader:
        flat = reader.read(clip_idx.reshape(-1))
    flat = _ensure_size(flat, ship_hw)
    clips = flat.reshape(clip_idx.shape + flat.shape[1:])
    if clips.shape[0] < clip_batch:  # pad to the baked batch shape
        reps = -(-clip_batch // clips.shape[0])
        clips = np.concatenate([clips] * reps, axis=0)
    return clips[:clip_batch]


def export_artifacts(cfg: ExperimentConfig, variables: dict, out_dir: str,
                     clip_batch: int, fmt: str = "both", platforms=None,
                     tag_names=None, qpack=None) -> dict:
    """Write serving artifacts + meta.json to ``out_dir``; returns meta."""
    from fastvideotagging_tpu.evaluation.serving import (
        export_serving, export_serving_stablehlo)

    os.makedirs(out_dir, exist_ok=True)
    d = cfg.data
    h, w = d.source_hw or d.resize_hw
    meta = {
        "model": cfg.model.name,
        "num_classes": cfg.model.num_classes,
        "multilabel": cfg.model.multilabel,
        "compute_dtype": cfg.model.compute_dtype,
        "int8": qpack is not None,
        "clip_batch": clip_batch,
        # host-side serving contract: the program bakes in preprocess
        # (resize/crop/normalize) but clip SAMPLING happens in the
        # front-end — it must follow this spec for parity with tag()
        "sampler": {"clip_len": d.sampler.clip_len,
                    "stride": d.sampler.stride,
                    "eval_mode": d.sampler.eval_mode,
                    "num_eval_clips": d.sampler.num_eval_clips},
        "resize_hw": list(d.resize_hw), "crop_hw": list(d.crop_hw),
        "input": {"shape": [clip_batch, d.sampler.clip_len, h, w, 3],
                  "dtype": "uint8",
                  "layout": "NTHWC raw frames; preprocess is baked in"},
        "output": {"shape": [clip_batch, cfg.model.num_classes],
                   "dtype": "float32",
                   "semantics": ("sigmoid scores" if cfg.model.multilabel
                                 else "softmax probabilities")},
        "platforms": list(platforms) if platforms else None,
        "tag_names": tag_names,
        "artifacts": {},
    }
    if fmt in ("jax", "both"):
        path = os.path.join(out_dir, "serving.jax")
        data = export_serving(cfg, variables, clip_batch, path=path,
                              qpack=qpack,
                              platforms=tuple(platforms) if platforms
                              else None)
        meta["artifacts"]["jax"] = {"file": "serving.jax",
                                    "bytes": len(data)}
        log.info("export: wrote %s (%d bytes)", path, len(data))
    if fmt in ("stablehlo", "both"):
        path = os.path.join(out_dir, "serving.stablehlo")
        data = export_serving_stablehlo(
            cfg, variables, clip_batch, path,
            platforms=tuple(platforms) if platforms else None, qpack=qpack)
        meta["artifacts"]["stablehlo"] = {"file": "serving.stablehlo",
                                          "bytes": len(data)}
        log.info("export: wrote %s (%d bytes)", path, len(data))
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(meta, f, indent=2)
    return meta


def main(argv=None):
    args = parse_args(argv)
    apply_platform(args)
    cfg = build_config(args)

    tag_names = None
    if args.tag_names:
        with open(args.tag_names) as f:
            tag_names = [line.strip() for line in f if line.strip()]
        if len(tag_names) != cfg.model.num_classes:
            raise SystemExit(
                f"{len(tag_names)} tag names for {cfg.model.num_classes} "
                "classes")

    variables = load_weights(args.weights)

    qpack = None
    if args.int8:
        if not args.calib_video:
            raise SystemExit("--int8 needs at least one --calib-video")
        from fastvideotagging_tpu.evaluation.serving import (
            quantize_for_serving)

        calib = [collect_calib_clips(cfg, v, args.clip_batch,
                                     max_clips=args.calib_clips)
                 for v in args.calib_video]
        try:
            qpack = quantize_for_serving(cfg, variables, calib)
        except KeyError as e:  # int8 coverage error -> clean CLI failure
            raise SystemExit(e.args[0])

    meta = export_artifacts(
        cfg, variables, args.out, args.clip_batch, fmt=args.format,
        platforms=args.platforms, tag_names=tag_names, qpack=qpack)
    log.info("export: done %s", json.dumps(meta["artifacts"]))


if __name__ == "__main__":
    main()
