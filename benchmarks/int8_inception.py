"""int8 PTQ for the Inception families (s3d, i3d): measured accuracy AND
throughput across the three scale schemes (VERDICT r3 items 3+5).

Round 3 shipped ``default_dynamic=True`` for s3d from an accuracy-only
measurement (static -3pp, INT8_S3D.json) and inherited it for i3d "by
analogy" — violating the engine's own every-choice-measured methodology,
and paying the dynamic amax pass (the activation tensor is written bf16
and re-read twice instead of 1-byte straight from the conv epilogue;
~35% throughput on r2plus1d). Round 4 adds the branch-site-aware STATIC
scheme: ``calibrate(return_margins=True)`` gives each site a headroom
multiplier proportional to its calibration absmax spread, so the
drift-prone Branches sites get the clip room dynamic mode was buying
while everything else keeps the 1-byte epilogue path.

Per model this script measures, on a REAL trained model (hard 50-class
motion benchmark, same recipe as ACCURACY_HARD_S3D.json):

  * video-level top-1: bf16 | static global margin 2.0 | static
    site-aware | dynamic  (identical bit-for-bit eval spec);
  * serving throughput (clips/s, B=32 16x112x112, dedupe-proof chained
    timing): bf16 | static | dynamic.

The winner sets ``ArchSpec.default_dynamic`` / ``default_site_margins``
for the family (ops/arch_spec.py cites this artifact).

    python benchmarks/int8_inception.py --out benchmarks/INT8_INCEPTION.json
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


def serving_throughput(model_name: str, batch_size=32, clip_len=16, crop=112,
                       classes=101):
    """bf16 vs int8-static vs int8-dynamic clips/s, random weights
    (throughput is weight-independent)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fastvideotagging_tpu.models import get_model, heads
    from fastvideotagging_tpu.ops.arch_spec import spec_for
    from fastvideotagging_tpu.ops.int8_infer import (
        calibrate, int8_infer, quantize_variables,
    )

    model = get_model(model_name, num_classes=classes)
    x0 = jnp.asarray(np.random.default_rng(0).standard_normal(
        (batch_size, clip_len, crop, crop, 3)), jnp.bfloat16)
    variables = jax.jit(model.init, static_argnames="train")(
        jax.random.PRNGKey(0), x0[:1], train=False)
    spec = spec_for(model_name)
    scales = calibrate(variables, [x0[:4]], spec=spec)
    qpack = quantize_variables(variables, scales, spec=spec)

    from bench import _timeit_chain  # one timing protocol, one place

    def timeit(step):
        return _timeit_chain(lambda c: step(x0 if c is None else c))

    @jax.jit
    def bf16_step(xi):
        y = model.apply(variables, xi, train=False)
        # evolving input: content-identical buffers get deduped by the
        # runtime (CLAUDE.md), so fold the logits back in
        return xi + (jnp.tanh(y.sum()) * 1e-2).astype(xi.dtype)

    def int8_step_fn(dynamic):
        @jax.jit
        def step(xi):
            y = heads.predict_scores(
                int8_infer(qpack, xi, spec,
                           float_blocks=spec.default_float_blocks,
                           dynamic=dynamic), False)
            return xi + (jnp.tanh(y.sum()) * 1e-2).astype(xi.dtype)
        return step

    return {
        "bf16_clips_per_sec": round(batch_size / timeit(bf16_step), 1),
        "int8_static_clips_per_sec":
            round(batch_size / timeit(int8_step_fn(False)), 1),
        "int8_dynamic_clips_per_sec":
            round(batch_size / timeit(int8_step_fn(True)), 1),
        "geometry": f"B={batch_size} {clip_len}x{crop}x{crop}",
    }


def accuracy(model_name: str, num_classes=50, epochs=120, batch_size=64,
             base_lr=0.05, seed=0, margin_sweep=False) -> dict:
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

    root = tempfile.mkdtemp(prefix=f"fvt_int8inc_{model_name}_")
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
                          # no residual bypass in either family: unclipped
                          # early grads destroy the params (CLAUDE.md s3d)
                          clip_grad_norm=1.0,
                          checkpoint_dir=""),
        parallel=ParallelConfig(data_parallel=1, model_parallel=1),
    )
    t0 = time.time()
    state = fit(cfg, train_records)
    train_s = time.time() - t0
    model = model_from_config(cfg.model)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    spec = spec_for(model_name)

    # Calibration: eval clips of a few TRAIN videos, preprocessed exactly
    # as the engines consume them (the int8_serving.py recipe).
    train_ds = ClipDataset(train_records[:16], cfg.data, mode="eval")
    calib = []
    for i in range(len(train_ds)):
        clips_u8, _ = train_ds.get_eval_clips(i)
        calib.append(preprocess_eval_clip(
            clips_u8, cfg.data.resize_hw, cfg.data.crop_hw, cfg.data.mean,
            cfg.data.std, out_dtype_name=cfg.model.compute_dtype))
    scales, margins = calibrate(variables, calib, spec=spec,
                                return_margins=True)
    qpack_global = quantize_variables(variables, scales, spec=spec,
                                      static_margin=2.0)
    qpack_site = quantize_variables(variables, scales, spec=spec,
                                    static_margin=margins)

    ds = ClipDataset(eval_records, cfg.data, mode="eval")
    bf16_scores, records = evaluate_video_scores(model, variables, ds, cfg,
                                                 clip_batch=8)
    labels = np.asarray([r.label for r in records])

    def int8_top1(qpack, dynamic):
        apply = jax.jit(lambda q, x: heads.predict_scores(
            int8_infer(q, x, spec, float_blocks=spec.default_float_blocks,
                       dynamic=dynamic), False))
        scores, _ = evaluate_video_scores(model, qpack, ds, cfg,
                                          clip_batch=8, apply_fn=apply)
        return round(topk_accuracy(scores, labels, k=1), 4)

    marr = np.asarray(sorted(margins.values()))
    result = {
        "model": model_name,
        "num_classes": num_classes,
        "epochs": epochs,
        "seed": seed,
        "clip_grad_norm": 1.0,
        "bf16_top1": round(topk_accuracy(bf16_scores, labels, k=1), 4),
        "int8_static_global_top1": int8_top1(qpack_global, dynamic=False),
        "int8_static_site_top1": int8_top1(qpack_site, dynamic=False),
        "int8_dynamic_top1": int8_top1(qpack_global, dynamic=True),
        "site_margins": {
            "min": round(float(marr[0]), 3),
            "median": round(float(np.median(marr)), 3),
            "max": round(float(marr[-1]), 3),
            "num_sites": int(marr.size),
        },
        "train_seconds": round(train_s, 1),
    }
    if margin_sweep:
        # VERDICT r4 item 8: i3d's site-static (0.925) scored UNDER
        # global-static 2.0 (0.93) despite every site margin >= 2.03 —
        # i.e. i3d got MORE headroom everywhere and still lost. More
        # margin = coarser quantization steps (scale = margin*absmax/127),
        # so the sweep separates the two error sources: if top1 RISES as
        # margin shrinks below 2.0, i3d is resolution-bound (opposite of
        # s3d's drift-prone Branches, which need the clip room).
        sweep = {}
        for m in (1.0, 1.25, 1.5, 2.5):
            q = quantize_variables(variables, scales, spec=spec,
                                   static_margin=m)
            sweep[f"global_{m}"] = int8_top1(q, dynamic=False)
        q = quantize_variables(
            variables, scales, spec=spec,
            static_margin={k: v * 0.75 for k, v in margins.items()})
        sweep["site_x0.75"] = int8_top1(q, dynamic=False)
        result["margin_sweep"] = sweep
    shutil.rmtree(root, ignore_errors=True)
    return result


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--models", nargs="+", default=["s3d", "i3d"])
    p.add_argument("--epochs", type=int, default=120)
    p.add_argument("--skip-throughput", action="store_true")
    p.add_argument("--margin-sweep", action="store_true",
                   help="also sweep static margins (global 1.0-2.5 + "
                        "site x0.75) — VERDICT r4 item 8")
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)

    results = []
    for m in args.models:
        row = accuracy(m, epochs=args.epochs, margin_sweep=args.margin_sweep)
        if not args.skip_throughput:
            row["throughput"] = serving_throughput(m)
        results.append(row)
        print(f"[int8_inception] {m}: {row}", file=sys.stderr)

    result = {"benchmark": "int8_inception_schemes",
              "task": "hard_synthetic_motion_50 (8x32x32 clips)",
              "results": results}
    line = json.dumps(result, indent=2)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    sys.exit(main())
