"""Serving daemon CLI (SURVEY.md §4.2 inference surface, long-running form).

Loads the model/engine ONCE, then serves tag requests line-by-line from
stdin until EOF — the deployment shape for batch backfills and socket
front-ends (`nc -l | python -m fastvideotagging_tpu.cli.serve ... | ...`),
where per-request process spin-up (imports + weight load + first compile,
tens of seconds on TPU) would dominate.

Request per line: a bare video path, or a JSON object
``{"video": path, "threshold"?: float, "top_k"?: int}``.
Response per line (stdout, flushed): ``{"video", "tags": [{tag, score}]}``
or ``{"video", "error"}`` — a failing video never takes the daemon down
(the decode fault policy of the batch pipeline, applied per request).
``ready`` is printed to stderr once the engine is warm.

    python -m fastvideotagging_tpu.cli.serve --weights w_dir \
        --model r2plus1d_18 --num-classes 1000 --tag-names tags.txt [--int8]

``--engine native --artifacts art/`` serves through the no-Python C++
PJRT daemon instead (compiled once from a ``cli.export`` artifact dir;
this process stays a host-only decode front-end).
"""

from __future__ import annotations

import argparse
import json
import sys

from fastvideotagging_tpu.cli.common import (
    add_common_flags, apply_platform, build_config,
)
from fastvideotagging_tpu.evaluation.tagger import Tagger
from fastvideotagging_tpu.train.checkpoint import load_weights
from fastvideotagging_tpu.utils.logging import get_logger

log = get_logger("fvt.serve")


def parse_args(argv=None) -> argparse.Namespace:
    p = argparse.ArgumentParser(description=__doc__)
    add_common_flags(p)
    p.add_argument("--weights", default=None,
                   help="weights dir from export_weights / orbax "
                        "(required with --engine jax)")
    p.add_argument("--engine", choices=["jax", "native"], default="jax",
                   help="jax: in-process engine from --weights. native: the "
                        "no-Python C++ PJRT daemon (pjrt_runner --serve) "
                        "compiled from an export-CLI --artifacts dir; model/"
                        "data flags are then baked in and ignored")
    p.add_argument("--artifacts", default=None,
                   help="cli.export output dir (required with "
                        "--engine native)")
    p.add_argument("--tag-names", default=None,
                   help="text file, one tag name per line (row = class id)")
    p.add_argument("--threshold", type=float, default=0.5)
    p.add_argument("--top-k", type=int, default=None)
    p.add_argument("--clip-batch", type=int, default=8)
    p.add_argument("--int8", action="store_true",
                   help="serve through the int8 PTQ engine")
    p.add_argument("--warmup", default=None, metavar="VIDEO",
                   help="tag this video before reading stdin so the first "
                        "request does not pay the compile")
    return p.parse_args(argv)


def _parse_request(line: str) -> dict:
    line = line.strip()
    if line.startswith("{"):
        req = json.loads(line)
        if "video" not in req:
            raise ValueError("request object needs a 'video' key")
        return req
    return {"video": line}


def serve(tagger: Tagger, requests, out, threshold: float = 0.5,
          top_k=None) -> dict:
    """Drain ``requests`` (iterable of lines) -> one JSON line each on
    ``out``. Returns counters. Split from main() so tests can drive it
    without a subprocess."""
    n_ok = n_err = 0
    for line in requests:
        if not line.strip():
            continue
        video = None
        try:
            req = _parse_request(line)
            video = req["video"]
            results = tagger.tag(
                video,
                threshold=float(req.get("threshold", threshold)),
                top_k=req.get("top_k", top_k),
            )
            out.write(json.dumps({
                "video": video,
                "tags": [{"tag": r.tag, "score": round(r.score, 5)}
                         for r in results],
            }) + "\n")
            n_ok += 1
        except Exception as e:  # per-request fault isolation
            from fastvideotagging_tpu.native.pjrt import NativeServerDied

            if isinstance(e, NativeServerDied):
                # the engine itself is gone — every further request would
                # error too; fail fast instead of flooding error lines
                raise
            log.warning("serve: request failed for %r: %s", video or line, e)
            out.write(json.dumps(
                {"video": video or line.strip(), "error": str(e)}) + "\n")
            n_err += 1
        out.flush()
    return {"served": n_ok, "errors": n_err}


def main(argv=None):
    args = parse_args(argv)
    apply_platform(args)

    tag_names = None
    if args.tag_names:
        with open(args.tag_names) as f:
            tag_names = [line.strip() for line in f if line.strip()]

    if args.engine == "native":
        if not args.artifacts:
            raise SystemExit("--engine native needs --artifacts (an export-"
                             "CLI output dir)")
        if args.int8:
            raise SystemExit("--int8 is baked at export time for the native "
                             "engine (cli.export --int8)")
        from fastvideotagging_tpu.evaluation.native_tagger import NativeTagger

        tagger = NativeTagger(args.artifacts, tag_names=tag_names)
    else:
        if not args.weights:
            raise SystemExit("--engine jax needs --weights")
        cfg = build_config(args)
        variables = load_weights(args.weights)
        tagger = Tagger(cfg, variables, tag_names,
                        clip_batch=args.clip_batch, int8=args.int8)
    try:
        if args.warmup:
            tagger.tag(args.warmup, top_k=1)
        print("ready", file=sys.stderr, flush=True)
        stats = serve(tagger, sys.stdin, sys.stdout,
                      threshold=args.threshold, top_k=args.top_k)
        log.info("serve: done %s", stats)
    finally:
        if hasattr(tagger, "close"):
            tagger.close()


if __name__ == "__main__":
    main()
