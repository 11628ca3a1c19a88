"""Trained-accuracy artifact at the Kinetics geometry (VERDICT r3 item 8).

BASELINE config 3 names 32x224x224 multi-clip evaluation; BENCH_r03 has
perf rows only at that geometry. This trains a small-class model at the
REAL geometry (32-frame clips, 256->224 crop, the Kinetics protocol's
resize/crop), then records video-level top-1 under single-clip vs
multi-clip uniform aggregation — exercising the ``eval_mode='uniform',
num_eval_clips`` path at the geometry it ships for, with accuracy (not
just speed) evidence.

Model: s3d (the efficiency-family anchor — the only backbone fast enough
to train at 224px on one chip in benchmark time; requires grad clipping,
CLAUDE.md). Dataset: hard synthetic-motion at 256x256x64 sources.

    python benchmarks/accuracy_kinetics_geom.py \
        --out benchmarks/ACCURACY_KINETICS_GEOM.json
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(num_classes: int = 8, epochs: int = 30, batch_size: int = 8,
        base_lr: float = 0.02, seed: int = 0) -> dict:
    import dataclasses

    import numpy as np

    from fastvideotagging_tpu.config import (
        ClipSamplerConfig, DataConfig, ExperimentConfig, ModelConfig,
        ParallelConfig, TrainConfig,
    )
    from fastvideotagging_tpu.data.pipeline import ClipDataset
    from fastvideotagging_tpu.data.synthetic_motion import make_motion_dataset
    from fastvideotagging_tpu.data.ucf101 import load_video_list
    from fastvideotagging_tpu.evaluation.evaluate import evaluate_video_scores
    from fastvideotagging_tpu.models import model_from_config
    from fastvideotagging_tpu.train.fit import fit
    from fastvideotagging_tpu.train.metrics import topk_accuracy

    root = tempfile.mkdtemp(prefix="fvt_kinetics_geom_")
    t0 = time.time()
    train_list, eval_list = make_motion_dataset(
        root, num_classes=num_classes, train_per_class=12, eval_per_class=4,
        num_frames=64, height=256, width=256, seed=seed)
    gen_s = time.time() - t0
    train_records = load_video_list(train_list, root=root)
    eval_records = load_video_list(eval_list, root=root)

    cfg = ExperimentConfig(
        model=ModelConfig(name="s3d", num_classes=num_classes, dropout=0.0),
        # the Kinetics protocol: 256-side source, 224 crop, 32-frame clips
        data=DataConfig(source_hw=(256, 256), resize_hw=(256, 256),
                        crop_hw=(224, 224), random_flip=False,
                        num_workers=8, cache_mb=2048,
                        sampler=ClipSamplerConfig(clip_len=32, stride=2,
                                                  eval_mode="uniform",
                                                  num_eval_clips=4)),
        train=TrainConfig(batch_size=batch_size, num_epochs=epochs,
                          base_lr=base_lr, weight_decay=1e-4,
                          lr_steps=(int(epochs * 0.6), int(epochs * 0.85)),
                          warmup_epochs=2, seed=seed, log_every=20,
                          clip_grad_norm=1.0,  # s3d requirement
                          checkpoint_dir=""),
        parallel=ParallelConfig(data_parallel=1, model_parallel=1),
    )
    t0 = time.time()
    state = fit(cfg, train_records)
    train_s = time.time() - t0
    model = model_from_config(cfg.model)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    labels = np.asarray([r.label for r in eval_records])

    def eval_top1(num_clips: int):
        c = dataclasses.replace(
            cfg, data=dataclasses.replace(
                cfg.data, sampler=dataclasses.replace(
                    cfg.data.sampler, num_eval_clips=num_clips)))
        ds = ClipDataset(eval_records, c.data, mode="eval")
        scores, recs = evaluate_video_scores(model, variables, ds, c,
                                             clip_batch=4)
        assert [r.label for r in recs] == list(labels)
        return round(topk_accuracy(scores, labels, k=1), 4)

    t0 = time.time()
    result = {
        "benchmark": "kinetics_geometry_accuracy",
        "model": "s3d",
        "geometry": "32x224x224 (stride 2) from 256x256x64 videos",
        "num_classes": num_classes,
        "train_videos": len(train_records),
        "eval_videos": len(eval_records),
        "epochs": epochs,
        "seed": seed,
        "clip_grad_norm": 1.0,
        "chance_top1": round(1.0 / num_classes, 4),
        # the aggregation sweep BASELINE config 3 ships with
        "top1_single_clip": eval_top1(1),
        "top1_multi_clip_4": eval_top1(4),
        "gen_seconds": round(gen_s, 1),
        "train_seconds": round(train_s, 1),
    }
    result["eval_seconds"] = round(time.time() - t0, 1)
    shutil.rmtree(root, ignore_errors=True)
    return result


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--classes", type=int, default=8)
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)
    result = run(num_classes=args.classes, epochs=args.epochs)
    line = json.dumps(result, indent=2)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    sys.exit(main())
