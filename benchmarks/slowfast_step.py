"""SlowFast train-step measurement: faithful dual-rate vs the
time-to-channel packed `_tpu` variant (VERDICT r3 item 2).

The faithful fast pathway runs C=8..64 convs at full frame rate — 6-50%
MXU lane occupancy (the worst roofline row in BENCH_r03, 0.2945);
`slowfast_r2plus1d_tpu` packs alpha frames into channels so the same
pathway runs at 32..256 channels with stride-free laterals
(models/slowfast.py). This records the dedupe-proof step time, achieved
TF/s and conv-roofline fraction for both, plus eval-mode serving clips/s.

NOTE the models are different programs (the packed fast convs do ~4x the
fast-path FLOPs at ~8x the lane occupancy) — clips/s is the
apples-to-apples number; roofline_fraction is each program's own.

    python benchmarks/slowfast_step.py --out benchmarks/SLOWFAST_STEP.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default=None)
    p.add_argument("--batch", type=int, default=32)
    args = p.parse_args(argv)

    from bench import bench_inference, bench_train_step

    rows = {}
    for model in ("slowfast_r2plus1d", "slowfast_r2plus1d_tpu"):
        clips, tflops, _fl, sec, roof = bench_train_step(
            args.batch, model_name=model)
        infer = bench_inference(args.batch, model_name=model)
        rows[model] = {
            "train_clips_per_sec": round(clips, 2),
            "step_s": round(sec, 5),
            "achieved_tflops": round(tflops, 2),
            "conv_roofline_step_s": round(roof, 5),
            "roofline_fraction": round(roof / sec, 4) if sec > 0 else -1.0,
            "infer_clips_per_sec": round(infer, 2),
        }
        print(f"[slowfast_step] {model}: {rows[model]}", file=sys.stderr)

    result = {"benchmark": "slowfast_train_step", "batch": args.batch,
              "geometry": "16x112x112", "rows": rows}
    line = json.dumps(result, indent=2)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    sys.exit(main())
