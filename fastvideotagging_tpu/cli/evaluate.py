"""Eval CLI (reference: test/eval script; SURVEY.md §4.5).

    python -m fastvideotagging_tpu.cli.evaluate --preset r2plus1d18_ucf101 \
        --data-root /data/ucf101 --val-list testlist01.txt \
        --class-index classInd.txt --checkpoint-dir checkpoints
"""

from __future__ import annotations

import argparse
import json

import jax

from fastvideotagging_tpu.cli.common import add_common_flags, build_config
from fastvideotagging_tpu.data import ucf101
from fastvideotagging_tpu.data.pipeline import ClipDataset
from fastvideotagging_tpu.evaluation.evaluate import evaluate
from fastvideotagging_tpu.models import model_from_config
from fastvideotagging_tpu.train import lr as lr_lib
from fastvideotagging_tpu.train.checkpoint import CheckpointManager
from fastvideotagging_tpu.train.state import create_train_state


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    add_common_flags(p)
    p.add_argument("--checkpoint-dir", required=True)
    p.add_argument("--class-index", default=None)
    p.add_argument("--clip-batch", type=int, default=8)
    p.add_argument("--threshold", type=float, default=0.5)
    args = p.parse_args(argv)
    cfg = build_config(args)

    cidx = (ucf101.load_class_index(args.class_index)
            if args.class_index else None)
    records = ucf101.load_video_list(cfg.data.val_list, cfg.data.root, cidx)
    num_tags = cfg.model.num_classes if cfg.model.multilabel else None
    dataset = ClipDataset(records, cfg.data, mode="eval", num_tags=num_tags)

    model = model_from_config(cfg.model)
    import jax.numpy as jnp

    ch, cw = cfg.data.crop_hw
    sample = jnp.zeros((1, cfg.data.sampler.clip_len, ch, cw, 3), jnp.float32)
    tx = lr_lib.make_optimizer(cfg.train, steps_per_epoch=1)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), sample)
    ckpt = CheckpointManager(args.checkpoint_dir)
    state, _ = ckpt.restore(state)
    if state is None:
        raise SystemExit(f"no checkpoint found in {args.checkpoint_dir}")

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    out = evaluate(model, variables, dataset, cfg, clip_batch=args.clip_batch,
                   threshold=args.threshold)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
