"""Attribute the scaleonly 3.9x wall-clock anomaly (VERDICT r4 weak #6a).

ACCURACY_HARD_SCALEONLY.json trained r2plus1d_18_tpu+scaleonly in 621.3 s
where the batch-norm run of the same model/geometry/epochs took 159.8 s —
while SCALEONLY_STEP.json measured the step NEUTRAL at the ship geometry
(B=32, 16x112x112). This harness measures where the 3.9x lives at the
ACCURACY geometry (B=64, 8x32x32 from 40x40 sources):

1. dedupe-proof device step time for norm='batch' vs 'scaleonly'
   (bench.bench_train_step at the accuracy geometry) — if the ratio
   reproduces ~3.9x, the anomaly is device-side and per-fusion
   attributable; if the steps are near-parity, it is host-side
   (dispatch/loader) and the trace's device_us_per_step proves it.
2. trace attribution (utils.step_profiler.profile_train_step) of BOTH
   norms at that geometry; the scaleonly-only rows are the per-step
   scaled-weight-standardization fusions (param-shaped: their cost is
   INDEPENDENT of the activation geometry, so shrinking the clip 37x
   turns a ship-geometry-invisible constant into the step itself).

    python benchmarks/scaleonly_anomaly.py --out benchmarks/SCALEONLY_ANOMALY.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GEOM = dict(clip_len=8, crop=32, source_hw=(40, 40))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default=None)
    p.add_argument("--batch", type=int, default=64,
                   help="accuracy-benchmark batch (ACCURACY_HARD* use 64)")
    p.add_argument("--model", default="r2plus1d_18_tpu")
    args = p.parse_args(argv)

    from bench import bench_train_step
    from fastvideotagging_tpu.utils.step_profiler import profile_train_step

    rows = {}
    for norm in ("batch", "scaleonly"):
        clips, tflops, _fl, sec, roof = bench_train_step(
            args.batch, model_name=args.model, norm=norm, **GEOM)
        rows[norm] = {"step_s": round(sec, 6),
                      "clips_per_sec": round(clips, 2),
                      "achieved_tflops": round(tflops, 3)}
        print(f"[scaleonly_anomaly] {norm}: {rows[norm]}", file=sys.stderr)

    traces = {}
    for norm in ("batch", "scaleonly"):
        trows, cat, info = profile_train_step(
            model_name=args.model, batch_size=args.batch, norm=norm,
            trace_dir=f"/tmp/fvt_anom_{norm}", **GEOM)
        # param-shaped (weight-standardization) fusions have zero conv list
        # and tiny byte floors; the robust split at this geometry is simply
        # the fusion count + the top rows by time
        traces[norm] = {
            "device_us_per_step": round(info["device_us_per_step"], 1),
            "steps_captured": info["steps_captured"],
            "n_fusions": len(trows),
            "categories_us": {k: round(v, 1) for k, v in cat.items()},
            "top_rows": [
                {"us": round(r[0], 1), "tf_per_s": round(r[1], 1),
                 "floor_us": round(r[2], 1), "op": r[3][:160]}
                for r in trows[:15]],
        }
        print(f"[scaleonly_anomaly] trace {norm}: "
              f"{traces[norm]['device_us_per_step']} us/step, "
              f"{traces[norm]['n_fusions']} fusions", file=sys.stderr)

    ratio = rows["scaleonly"]["step_s"] / rows["batch"]["step_s"]
    result = {
        "benchmark": "scaleonly_accuracy_geometry_anomaly",
        "model": args.model,
        "batch": args.batch,
        "geometry": "8x32x32 from 40x40 (the ACCURACY_HARD_* recipe)",
        "wall_clock_anomaly": {
            "scaleonly_train_seconds": 621.3,
            "batch_train_seconds": 159.8,
            "ratio": 3.89,
            "source": "ACCURACY_HARD_SCALEONLY.json vs "
                      "ACCURACY_HARD_TPU_VARIANT.json (60 epochs each)"},
        "step": rows,
        "step_ratio_scaleonly_over_batch": round(ratio, 3),
        "trace": traces,
    }
    line = json.dumps(result, indent=2)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    sys.exit(main())
