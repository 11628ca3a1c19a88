"""End-to-end offline demo: generate videos -> train -> evaluate -> tag.

Runs anywhere (CPU or TPU) with no external data:

    python examples/train_synthetic.py [--model tiny3d] [--epochs 10]

Generates a tiny synthetic action dataset (class = motion direction/speed),
trains with the full pipeline (decode workers -> uint8 batches -> fused
device preprocess -> jitted train step), evaluates with multi-clip
aggregation, exports weights, and runs the one-call tag() API on a video.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from fastvideotagging_tpu.config import (
    ClipSamplerConfig,
    DataConfig,
    ExperimentConfig,
    ModelConfig,
    ParallelConfig,
    TrainConfig,
)
from fastvideotagging_tpu.data import synthetic
from fastvideotagging_tpu.data.pipeline import ClipDataset
from fastvideotagging_tpu.data.ucf101 import load_video_list
from fastvideotagging_tpu.evaluation.evaluate import evaluate
from fastvideotagging_tpu.evaluation.tagger import Tagger
from fastvideotagging_tpu.models import get_model
from fastvideotagging_tpu.train.checkpoint import export_weights
from fastvideotagging_tpu.train.fit import fit


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default="tiny3d")
    p.add_argument("--classes", type=int, default=4)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--platform", choices=["cpu", "tpu"], default=None,
                   help="force the jax backend (in-process switch — env "
                        "vars are rewritten by this image's sitecustomize)")
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    with tempfile.TemporaryDirectory() as root:
        print(f"generating synthetic dataset in {root} ...")
        list_path = synthetic.make_dataset(
            root, num_classes=args.classes, videos_per_class=2,
            num_frames=32, height=64, width=80)
        records = load_video_list(list_path, root=root)

        cfg = ExperimentConfig(
            model=ModelConfig(name=args.model, num_classes=args.classes,
                              compute_dtype="float32"),
            data=DataConfig(source_hw=(64, 80), resize_hw=(56, 72),
                            crop_hw=(48, 48),
                            sampler=ClipSamplerConfig(clip_len=8, stride=2,
                                                      eval_mode="dense"),
                            num_workers=4),
            train=TrainConfig(batch_size=args.batch, num_epochs=args.epochs,
                              base_lr=0.03, weight_decay=0.0, log_every=2,
                              checkpoint_dir=f"{root}/ckpt"),
            parallel=ParallelConfig(data_parallel=1),
        )
        state = fit(cfg, records)

        model = get_model(args.model, num_classes=args.classes,
                          dtype=jnp.float32)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        ds = ClipDataset(records, cfg.data, mode="eval")
        metrics = evaluate(model, variables, ds, cfg, clip_batch=4)
        print("eval:", json.dumps(metrics))

        export_weights(f"{root}/weights", jax.device_get(state.params),
                       jax.device_get(state.batch_stats))
        tagger = Tagger(cfg, variables,
                        tag_names=[f"action_{i}" for i in range(args.classes)],
                        clip_batch=4)
        results = tagger.tag(records[0].path, threshold=0.0, top_k=3)
        print("tag(video):", [(r.tag, round(r.score, 3)) for r in results])


if __name__ == "__main__":
    main()
