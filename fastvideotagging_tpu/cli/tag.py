"""Tag CLI (reference: inference script; SURVEY.md §4.2).

    python -m fastvideotagging_tpu.cli.tag video.mp4 --weights w_dir \
        --model r2plus1d_18 --num-classes 1000 --tag-names tags.txt

A ``.fvtpack`` argument bulk-tags every video in the pack (decode-once
backfill tier: zero FFmpeg per video, one JSON line each).
"""

from __future__ import annotations

import argparse
import json

from fastvideotagging_tpu.cli.common import add_common_flags, build_config
from fastvideotagging_tpu.data.packed import is_pack
from fastvideotagging_tpu.evaluation.tagger import Tagger, iter_pack_tags
from fastvideotagging_tpu.train.checkpoint import load_weights


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    add_common_flags(p)
    p.add_argument("videos", nargs="+",
                   help="video file(s) and/or .fvtpack pack(s) to tag")
    p.add_argument("--weights", required=True,
                   help="weights dir from export_weights / orbax")
    p.add_argument("--tag-names", default=None,
                   help="text file, one tag name per line (row = class id)")
    p.add_argument("--threshold", type=float, default=0.5)
    p.add_argument("--top-k", type=int, default=None)
    p.add_argument("--clip-batch", type=int, default=8)
    p.add_argument("--int8", action="store_true",
                   help="serve through the int8 PTQ engine (self-calibrates "
                        "on each video's first chunk; r2plus1d family)")
    args = p.parse_args(argv)
    cfg = build_config(args)

    tag_names = None
    if args.tag_names:
        with open(args.tag_names) as f:
            tag_names = [line.strip() for line in f if line.strip()]

    variables = load_weights(args.weights)
    tagger = Tagger(cfg, variables, tag_names, clip_batch=args.clip_batch,
                    int8=args.int8)
    def emit(video, results):
        print(json.dumps({
            "video": video,
            "tags": [{"tag": r.tag, "score": round(r.score, 5)}
                     for r in results],
        }))

    for video in args.videos:
        if is_pack(video):
            for path, results in iter_pack_tags(
                    tagger, video, threshold=args.threshold,
                    top_k=args.top_k, root=cfg.data.root or ""):
                emit(path, results)
        else:
            emit(video, tagger.tag(video, threshold=args.threshold,
                                   top_k=args.top_k))


if __name__ == "__main__":
    main()
