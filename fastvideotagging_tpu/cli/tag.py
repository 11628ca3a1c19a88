"""Tag CLI (reference: inference script; SURVEY.md §4.2).

    python -m fastvideotagging_tpu.cli.tag video.mp4 --weights w_dir \
        --model r2plus1d_18 --num-classes 1000 --tag-names tags.txt

A ``.fvtpack`` argument bulk-tags every video in the pack (decode-once
backfill tier: zero FFmpeg per video, one JSON line each).

``--engine native --artifacts art/`` scores through the long-running C++
PJRT daemon instead of in-process jax; for packs the daemon pipelines —
``--pipeline K`` requests are H2D-staged ahead while the chip executes,
with bit-identical aggregation (tests/test_native_pjrt.py).
"""

from __future__ import annotations

import argparse
import json
import sys

from fastvideotagging_tpu.cli.common import (
    add_common_flags, apply_platform, build_config,
)
from fastvideotagging_tpu.data.packed import is_pack
from fastvideotagging_tpu.evaluation.tagger import Tagger, iter_pack_tags
from fastvideotagging_tpu.train.checkpoint import load_weights


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    add_common_flags(p)
    p.add_argument("videos", nargs="+",
                   help="video file(s) and/or .fvtpack pack(s) to tag")
    p.add_argument("--weights", default=None,
                   help="weights dir from export_weights / orbax "
                        "(required with --engine jax)")
    p.add_argument("--tag-names", default=None,
                   help="text file, one tag name per line (row = class id)")
    p.add_argument("--threshold", type=float, default=0.5)
    p.add_argument("--top-k", type=int, default=None)
    p.add_argument("--clip-batch", type=int, default=8)
    p.add_argument("--int8", action="store_true",
                   help="serve through the int8 PTQ engine (self-calibrates "
                        "on each video's first chunk; r2plus1d family)")
    p.add_argument("--engine", choices=["jax", "native"], default="jax",
                   help="jax: in-process engine from --weights. native: the "
                        "C++ PJRT daemon from --artifacts (Python stays a "
                        "host-only decode front-end)")
    p.add_argument("--artifacts", default=None,
                   help="export-CLI artifact dir (required with "
                        "--engine native)")
    p.add_argument("--pipeline", type=int, default=2,
                   help="native engine: requests staged ahead of execution "
                        "in the daemon; bulk pack tagging keeps this many "
                        "chunks in flight (0 = strictly sequential)")
    args = p.parse_args(argv)
    apply_platform(args)
    cfg = build_config(args)

    tag_names = None
    if args.tag_names:
        with open(args.tag_names) as f:
            tag_names = [line.strip() for line in f if line.strip()]

    if args.engine == "native":
        if not args.artifacts:
            raise SystemExit("--engine native needs --artifacts (an export-"
                             "CLI directory: serving.stablehlo + meta.json)")
        if args.int8:
            raise SystemExit("--int8 is baked at export time for the native "
                             "engine (cli.export --int8)")
        # The native engine's sampling/batch contract is FROZEN in the
        # exported meta.json — silently ignoring these flags would be the
        # silent-misconfig class this CLI is built to refuse.
        raw = list(argv) if argv is not None else sys.argv[1:]
        frozen = {"--weights", "--clip-len", "--stride", "--eval-mode",
                  "--num-eval-clips", "--clip-batch", "--resize", "--crop"}
        offending = sorted(frozen.intersection(raw))
        if offending:
            raise SystemExit(
                f"{' '.join(offending)}: fixed at export time for "
                f"--engine native (see {args.artifacts}/meta.json); "
                f"re-export with cli.export to change them")
        from fastvideotagging_tpu.evaluation.native_tagger import NativeTagger

        tagger = NativeTagger(args.artifacts, tag_names=tag_names,
                              pipeline=args.pipeline)
    else:
        if not args.weights:
            raise SystemExit("--engine jax needs --weights")
        variables = load_weights(args.weights)
        tagger = Tagger(cfg, variables, tag_names,
                        clip_batch=args.clip_batch, int8=args.int8)
    def emit(video, results):
        print(json.dumps({
            "video": video,
            "tags": [{"tag": r.tag, "score": round(r.score, 5)}
                     for r in results],
        }))

    try:
        for video in args.videos:
            if is_pack(video):
                for path, results in iter_pack_tags(
                        tagger, video, threshold=args.threshold,
                        top_k=args.top_k, root=cfg.data.root or ""):
                    emit(path, results)
            else:
                emit(video, tagger.tag(video, threshold=args.threshold,
                                       top_k=args.top_k))
    finally:
        if hasattr(tagger, "close"):
            tagger.close()  # the native engine owns a daemon + workdir


if __name__ == "__main__":
    main()
