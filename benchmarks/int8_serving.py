"""int8 PTQ serving benchmark: accuracy + throughput vs the bf16 engine.

Trains the real r2plus1d_18 on the hard 50-class motion benchmark (the
UCF101 stand-in), calibrates the int8 engine on a handful of train batches,
then reports:

  * bf16 vs int8 video-level top-1 on the held-out set (same bit-for-bit
    clip sampling + aggregation spec for both engines);
  * serving throughput (clips/s, B=32 16x112x112 — the [B:8] geometry) for
    jit(model.apply) vs the int8 engine, dedupe-proof chained timing.

    python benchmarks/int8_serving.py --out benchmarks/INT8_SERVING.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def serving_throughput(batch_size=32, clip_len=16, crop=112, classes=101):
    """bf16 vs int8 clips/s on the standard serving geometry, random
    weights (throughput is weight-independent)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fastvideotagging_tpu.models import get_model
    from fastvideotagging_tpu.ops.int8_infer import (
        calibrate, quantize_variables, r2plus1d_int8_infer,
    )

    model = get_model("r2plus1d_18", num_classes=classes)
    x0 = jnp.asarray(np.random.default_rng(0).standard_normal(
        (batch_size, clip_len, crop, crop, 3)), jnp.bfloat16)
    variables = jax.jit(model.init, static_argnames="train")(
        jax.random.PRNGKey(0), x0[:1], train=False)
    scales = calibrate(variables, [x0[:4]])
    qpack = quantize_variables(variables, scales)

    from bench import _timeit_chain  # one timing protocol, one place

    def timeit(step):
        return _timeit_chain(lambda c: step(x0 if c is None else c))

    @jax.jit
    def bf16_step(xi):
        y = model.apply(variables, xi, train=False)
        # evolving input: content-identical buffers get deduped by the
        # runtime (CLAUDE.md), so fold the logits back in
        return xi + (jnp.tanh(y.sum()) * 1e-2).astype(xi.dtype)

    @jax.jit
    def int8_step(xi):
        y = r2plus1d_int8_infer(qpack, xi)  # ENGINE DEFAULTS (the product)
        return xi + (jnp.tanh(y.sum()) * 1e-2).astype(xi.dtype)

    @jax.jit
    def int8_dyn_step(xi):
        y = r2plus1d_int8_infer(qpack, xi, dynamic=True)
        return xi + (jnp.tanh(y.sum()) * 1e-2).astype(xi.dtype)

    @jax.jit
    def int8_exact_step(xi):
        y = r2plus1d_int8_infer(qpack, xi, residual="exact")
        return xi + (jnp.tanh(y.sum()) * 1e-2).astype(xi.dtype)

    return (batch_size / timeit(bf16_step), batch_size / timeit(int8_step),
            batch_size / timeit(int8_dyn_step),
            batch_size / timeit(int8_exact_step))


def accuracy(num_classes=50, epochs=60, batch_size=64, base_lr=0.05, seed=0):
    import jax
    import numpy as np

    from accuracy_hard import run as _noop  # noqa: F401  (path check)
    from fastvideotagging_tpu.config import (
        ClipSamplerConfig, DataConfig, ExperimentConfig, ModelConfig,
        ParallelConfig, TrainConfig,
    )
    from fastvideotagging_tpu.data.pipeline import ClipDataset
    from fastvideotagging_tpu.data.synthetic_motion import make_motion_dataset
    from fastvideotagging_tpu.data.ucf101 import load_video_list
    from fastvideotagging_tpu.evaluation.evaluate import evaluate_video_scores
    from fastvideotagging_tpu.models import heads, model_from_config
    from fastvideotagging_tpu.ops.int8_infer import (
        calibrate, quantize_variables, r2plus1d_int8_infer,
    )
    from fastvideotagging_tpu.train.fit import fit
    from fastvideotagging_tpu.train.loop import make_sample_batch  # noqa: F401
    from fastvideotagging_tpu.train.metrics import topk_accuracy

    import tempfile

    root = tempfile.mkdtemp(prefix="fvt_int8_")
    train_list, eval_list = make_motion_dataset(
        root, num_classes=num_classes, seed=seed)
    train_records = load_video_list(train_list, root=root)
    eval_records = load_video_list(eval_list, root=root)
    cfg = ExperimentConfig(
        model=ModelConfig(name="r2plus1d_18", num_classes=num_classes,
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
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    # calibration: first eval clips of a few TRAIN videos (preprocessed the
    # same way the engines consume them)
    from fastvideotagging_tpu.ops.preprocess_kernel import preprocess_eval_clip
    train_ds = ClipDataset(train_records[:16], cfg.data, mode="eval")
    calib = []
    for i in range(len(train_ds)):
        clips_u8, _ = train_ds.get_eval_clips(i)
        calib.append(preprocess_eval_clip(
            clips_u8, cfg.data.resize_hw, cfg.data.crop_hw, cfg.data.mean,
            cfg.data.std, out_dtype_name=cfg.model.compute_dtype))
    scales = calibrate(variables, calib)
    qpack = quantize_variables(variables, scales)
    qpacks_margin = {m: quantize_variables(variables, scales,
                                           static_margin=m)
                     for m in (1.0, 1.5, 2.0)}

    ds = ClipDataset(eval_records, cfg.data, mode="eval")
    bf16_scores, records = evaluate_video_scores(model, variables, ds, cfg,
                                                 clip_batch=8)

    def int8_scores_for(float_blocks, dynamic=False, qp=None,
                        residual="dequant"):  # = the engine default
        apply = jax.jit(lambda q, x: heads.predict_scores(
            r2plus1d_int8_infer(q, x, float_blocks=float_blocks,
                                dynamic=dynamic, residual=residual), False))
        scores, _ = evaluate_video_scores(model, qp or qpack, ds, cfg,
                                          clip_batch=8, apply_fn=apply)
        return scores

    labels = np.asarray([r.label for r in records])
    all_blocks = tuple(f"stage{s + 1}_block{b}"
                       for s in range(4) for b in range(2))
    sweep = {
        "full_int8": (),
        "stage4_float": ("stage4_block0", "stage4_block1"),
        "stage34_float": ("stage3_block0", "stage3_block1",
                          "stage4_block0", "stage4_block1"),
        "stage234_float": ("stage2_block0", "stage2_block1",
                           "stage3_block0", "stage3_block1",
                           "stage4_block0", "stage4_block1"),
        "stem_only_int8": all_blocks,
    }
    top1 = {name: topk_accuracy(int8_scores_for(fb), labels, k=1)
            for name, fb in sweep.items()}
    top1["stage4_float_dynamic"] = topk_accuracy(
        int8_scores_for(sweep["stage4_float"], dynamic=True), labels, k=1)
    for m, qp in qpacks_margin.items():
        top1[f"stage4_float_margin{m}"] = topk_accuracy(
            int8_scores_for(sweep["stage4_float"], qp=qp), labels, k=1)
    top1["stage4_float_exact_residual"] = topk_accuracy(
        int8_scores_for(sweep["stage4_float"], residual="exact"),
        labels, k=1)
    import shutil

    shutil.rmtree(root, ignore_errors=True)
    return topk_accuracy(bf16_scores, labels, k=1), top1


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default=None)
    p.add_argument("--epochs", type=int, default=60)
    p.add_argument("--skip-throughput", action="store_true")
    args = p.parse_args(argv)

    bf16_top1, sweep_top1 = accuracy(epochs=args.epochs)
    result = {
        "benchmark": "int8_ptq_serving",
        "scheme": ("per-out-channel int8 weights with folded smoothing "
                   "factors (clamped 10x band); static per-site scales "
                   "with 2x headroom margin, fused single-pass requant "
                   "(default) or dynamic in-graph per-tensor scales "
                   "(robust mode); mixed-precision bf16 tail for the "
                   "cancellation-amplifying stage-4 blocks"),
        "bf16_top1": round(bf16_top1, 4),
        "sweep_top1": {k: round(v, 4) for k, v in sweep_top1.items()},
        "int8_top1": round(sweep_top1["stage4_float"], 4),
    }
    if not args.skip_throughput:
        bf16_cps, int8_cps, dyn_cps, exact_cps = serving_throughput()
        result.update({
            "geometry": "B=32 16x112x112",
            "bf16_clips_per_sec": round(bf16_cps, 1),
            "int8_clips_per_sec": round(int8_cps, 1),
            "int8_dynamic_clips_per_sec": round(dyn_cps, 1),
            "int8_exact_residual_clips_per_sec": round(exact_cps, 1),
            "speedup": round(int8_cps / bf16_cps, 3),
        })
    line = json.dumps(result, indent=2)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    sys.exit(main())
