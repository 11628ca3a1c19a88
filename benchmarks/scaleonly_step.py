"""norm='scaleonly' train-step measurement (VERDICT r3 item 1).

MEASURED RESULT: NEUTRAL — scaleonly is an accuracy-parity norm OPTION
(0.975 from scratch, ACCURACY_HARD_SCALEONLY.json), NOT a step-time
lever. The round-4 first-pass attribution had read 4 floor-0
multiply_add fusions (~6.6 ms) as deletable BN-backward stat passes;
the corrected profiler (trace-event long_name/model_flops floors,
PERF.md ROUND-4b/4c) identifies them as stage-1 dw CONVS fused with the
SGD update, running near their physical floors — and the per-channel
affine scaleonly keeps still pays dscale/dbias reductions in backward.
Deleting BN statistics therefore buys nothing at this fusion granularity.

This measures the dedupe-proof step time of the faithful and `_tpu` models
under batch vs scaleonly norm, with the conv-roofline fraction bench.py
reports (the conv inventory is identical across norm modes, so fractions
compare directly).

    python benchmarks/scaleonly_step.py --out benchmarks/SCALEONLY_STEP.json
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

    from bench import bench_train_step

    rows = {}
    for model, norm in (("r2plus1d_18_tpu", "batch"),
                        ("r2plus1d_18_tpu", "scaleonly"),
                        ("r2plus1d_18", "scaleonly")):
        clips, tflops, _fl, sec, roof = bench_train_step(
            args.batch, model_name=model, norm=norm)
        key = f"{model}+{norm}"
        rows[key] = {
            "clips_per_sec": round(clips, 2),
            "step_s": round(sec, 5),
            "achieved_tflops": round(tflops, 2),
            "conv_roofline_step_s": round(roof, 5),
            "roofline_fraction": round(roof / sec, 4) if sec > 0 else -1.0,
        }
        print(f"[scaleonly_step] {key}: {rows[key]}", file=sys.stderr)

    result = {"benchmark": "scaleonly_train_step", "batch": args.batch,
              "rows": rows}
    line = json.dumps(result, indent=2)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    sys.exit(main())
