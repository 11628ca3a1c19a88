"""int8 PTQ accuracy for the S3D family (round 3f) — the Inception
``Branches`` walk has no residual structure, so none of the r2plus1d
float-block mixed-precision machinery applies: the question is simply
whether the full-int8 spec-driven engine holds top-1 parity with bf16 on
a REAL trained s3d (hard 50-class motion benchmark, the same recipe as
ACCURACY_HARD_S3D.json).

    python benchmarks/int8_s3d.py --out benchmarks/INT8_S3D.json

Writes {bf16_top1, int8_top1, int8_dynamic_top1, ...}; thresholds are
asserted by tests/test_synthetic_motion.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(num_classes: int = 50, epochs: int = 120, batch_size: int = 64,
        base_lr: float = 0.05, seed: int = 0) -> dict:
    import numpy as np

    from fastvideotagging_tpu.config import (
        ClipSamplerConfig, DataConfig, ExperimentConfig, ModelConfig,
        ParallelConfig, TrainConfig,
    )
    from fastvideotagging_tpu.data.pipeline import ClipDataset
    from fastvideotagging_tpu.data.synthetic_motion import make_motion_dataset
    from fastvideotagging_tpu.data.ucf101 import load_video_list
    from fastvideotagging_tpu.evaluation.evaluate import evaluate_video_scores
    from fastvideotagging_tpu.evaluation.quantized import (
        make_int8_engine, quantize_for,
    )
    from fastvideotagging_tpu.models import model_from_config
    from fastvideotagging_tpu.ops.preprocess_kernel import preprocess_eval_clip
    from fastvideotagging_tpu.train.fit import fit
    from fastvideotagging_tpu.train.metrics import topk_accuracy

    root = tempfile.mkdtemp(prefix="fvt_int8_s3d_")
    train_list, eval_list = make_motion_dataset(
        root, num_classes=num_classes, seed=seed)
    train_records = load_video_list(train_list, root=root)
    eval_records = load_video_list(eval_list, root=root)
    cfg = ExperimentConfig(
        model=ModelConfig(name="s3d", num_classes=num_classes, dropout=0.0),
        data=DataConfig(source_hw=(48, 48), resize_hw=(40, 40),
                        crop_hw=(32, 32), random_flip=False,
                        num_workers=8, cache_mb=1024,
                        sampler=ClipSamplerConfig(clip_len=8, stride=2,
                                                  eval_mode="uniform",
                                                  num_eval_clips=4)),
        train=TrainConfig(batch_size=batch_size, num_epochs=epochs,
                          base_lr=base_lr, weight_decay=1e-4,
                          lr_steps=(int(epochs * 0.6), int(epochs * 0.85)),
                          warmup_epochs=2, seed=seed, log_every=50,
                          clip_grad_norm=1.0,  # s3d diverges without it
                          checkpoint_dir=""),
        parallel=ParallelConfig(data_parallel=1, model_parallel=1),
    )
    t0 = time.time()
    state = fit(cfg, train_records)
    train_s = time.time() - t0
    model = model_from_config(cfg.model)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    # Calibration: eval clips of a few TRAIN videos, preprocessed exactly
    # as the engines consume them (the int8_serving.py recipe).
    train_ds = ClipDataset(train_records[:16], cfg.data, mode="eval")
    calib = []
    for i in range(len(train_ds)):
        clips_u8, _ = train_ds.get_eval_clips(i)
        calib.append(preprocess_eval_clip(
            clips_u8, cfg.data.resize_hw, cfg.data.crop_hw, cfg.data.mean,
            cfg.data.std, out_dtype_name=cfg.model.compute_dtype))
    qpack = quantize_for("s3d", variables, calib)

    ds = ClipDataset(eval_records, cfg.data, mode="eval")
    bf16_scores, records = evaluate_video_scores(model, variables, ds, cfg,
                                                 clip_batch=8)
    labels = np.asarray([r.label for r in records])

    def int8_top1(dynamic):
        apply = make_int8_engine("s3d", multilabel=False, dynamic=dynamic)
        scores, _ = evaluate_video_scores(model, qpack, ds, cfg,
                                          clip_batch=8, apply_fn=apply)
        return topk_accuracy(scores, labels, k=1)

    result = {
        "benchmark": "int8_s3d_hard_motion_50",
        "model": "s3d",
        "num_classes": num_classes,
        "epochs": epochs,
        "seed": seed,
        "clip_grad_norm": 1.0,
        "bf16_top1": round(topk_accuracy(bf16_scores, labels, k=1), 4),
        "int8_top1": round(int8_top1(dynamic=False), 4),
        "int8_dynamic_top1": round(int8_top1(dynamic=True), 4),
        "train_seconds": round(train_s, 1),
    }
    import shutil

    shutil.rmtree(root, ignore_errors=True)
    return result


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--epochs", type=int, default=120)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)
    result = run(epochs=args.epochs, seed=args.seed)
    line = json.dumps(result, indent=2)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    sys.exit(main())
