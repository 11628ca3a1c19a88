"""int8 PTQ accuracy artifacts for the NON-r2plus1d families (round 3).

The spec-driven engine (ops/arch_spec + ops/int8_infer) covers P3D and C3D;
this records the trained-model accuracy evidence the r2plus1d engine has in
INT8_SERVING.json: train each backbone on the hard 50-class motion
benchmark, then bf16 vs int8 video-level top-1 under the identical
bit-for-bit eval spec.

    python benchmarks/int8_family.py --out benchmarks/INT8_FAMILY.json
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_model(model_name: str, num_classes=50, epochs=40, batch_size=64,
              base_lr=0.05, seed=0) -> dict:
    import jax
    import numpy as np

    from fastvideotagging_tpu.config import (
        ClipSamplerConfig, DataConfig, ExperimentConfig, ModelConfig,
        ParallelConfig, TrainConfig,
    )
    from fastvideotagging_tpu.data.pipeline import ClipDataset
    from fastvideotagging_tpu.data.synthetic_motion import make_motion_dataset
    from fastvideotagging_tpu.data.ucf101 import load_video_list
    from fastvideotagging_tpu.evaluation.evaluate import evaluate_video_scores
    from fastvideotagging_tpu.models import heads, model_from_config
    from fastvideotagging_tpu.ops.arch_spec import spec_for
    from fastvideotagging_tpu.ops.int8_infer import (
        calibrate, int8_infer, quantize_variables,
    )
    from fastvideotagging_tpu.ops.preprocess_kernel import preprocess_eval_clip
    from fastvideotagging_tpu.train.fit import fit
    from fastvideotagging_tpu.train.metrics import topk_accuracy

    root = tempfile.mkdtemp(prefix=f"fvt_int8_{model_name}_")
    train_list, eval_list = make_motion_dataset(
        root, num_classes=num_classes, seed=seed)
    train_records = load_video_list(train_list, root=root)
    eval_records = load_video_list(eval_list, root=root)
    cfg = ExperimentConfig(
        model=ModelConfig(name=model_name, num_classes=num_classes,
                          dropout=0.0),
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
                          checkpoint_dir=""),
        parallel=ParallelConfig(data_parallel=1, model_parallel=1),
    )
    state = fit(cfg, train_records)
    model = model_from_config(cfg.model)
    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats
    spec = spec_for(model_name)

    train_ds = ClipDataset(train_records[:16], cfg.data, mode="eval")
    calib = []
    for i in range(len(train_ds)):
        clips_u8, _ = train_ds.get_eval_clips(i)
        calib.append(preprocess_eval_clip(
            clips_u8, cfg.data.resize_hw, cfg.data.crop_hw, cfg.data.mean,
            cfg.data.std, out_dtype_name=cfg.model.compute_dtype))
    scales = calibrate(variables, calib, spec=spec)
    qpack = quantize_variables(variables, scales, spec=spec)

    ds = ClipDataset(eval_records, cfg.data, mode="eval")
    bf16_scores, records = evaluate_video_scores(model, variables, ds, cfg,
                                                 clip_batch=8)
    labels = np.asarray([r.label for r in records])

    def int8_top1(float_blocks):
        apply = jax.jit(lambda q, x: heads.predict_scores(
            int8_infer(q, x, spec, float_blocks=float_blocks), False))
        scores, _ = evaluate_video_scores(model, qpack, ds, cfg,
                                          clip_batch=8, apply_fn=apply)
        return topk_accuracy(scores, labels, k=1)

    sweep = {"full_int8": (),
             "default_tail": spec.default_float_blocks}
    top1 = {name: round(int8_top1(fb), 4) for name, fb in sweep.items()}
    shutil.rmtree(root, ignore_errors=True)
    return {
        "model": model_name,
        "bf16_top1": round(topk_accuracy(bf16_scores, labels, k=1), 4),
        "int8_top1": top1["default_tail"],
        "sweep_top1": top1,
        "default_float_blocks": list(spec.default_float_blocks),
        "epochs": epochs,
        "steps": int(state.step),
    }


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default=None)
    p.add_argument("--epochs", type=int, default=40)
    p.add_argument("--models", nargs="+", default=["p3d_63", "c3d"])
    args = p.parse_args(argv)
    result = {"benchmark": "int8_ptq_family",
              "task": "hard_synthetic_motion_50 (8x32x32 clips)",
              "results": [run_model(m, epochs=args.epochs)
                          for m in args.models]}
    line = json.dumps(result, indent=2)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    sys.exit(main())
