"""Eval CLI (reference: test/eval script; SURVEY.md §4.5).

    python -m fastvideotagging_tpu.cli.evaluate --preset r2plus1d18_ucf101 \
        --data-root /data/ucf101 --val-list testlist01.txt \
        --class-index classInd.txt --checkpoint-dir checkpoints
"""

from __future__ import annotations

import argparse
import json

import jax

from fastvideotagging_tpu.cli.common import (
    add_common_flags, add_multihost_flags, apply_platform, build_config,
    maybe_init_multihost,
)
from fastvideotagging_tpu.data import ucf101
from fastvideotagging_tpu.data.packed import is_pack, open_dataset
from fastvideotagging_tpu.data.pipeline import ClipDataset
from fastvideotagging_tpu.evaluation.evaluate import evaluate
from fastvideotagging_tpu.models import model_from_config
from fastvideotagging_tpu.train.checkpoint import CheckpointManager


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    add_common_flags(p)
    p.add_argument("--checkpoint-dir", required=True)
    p.add_argument("--class-index", default=None)
    p.add_argument("--clip-batch", type=int, default=8)
    p.add_argument("--threshold", type=float, default=0.5)
    p.add_argument("--int8", action="store_true",
                   help="serve through the int8 PTQ engine "
                        "(ops/int8_infer; r2plus1d family), calibrated on "
                        "the first --int8-calib-videos eval videos")
    p.add_argument("--int8-calib-videos", type=int, default=8)
    add_multihost_flags(p)
    args = p.parse_args(argv)
    apply_platform(args)
    maybe_init_multihost(args)
    cfg = build_config(args)

    num_tags = cfg.model.num_classes if cfg.model.multilabel else None
    if is_pack(cfg.data.val_list):
        dataset = open_dataset(cfg.data.val_list, cfg.data, mode="eval",
                               num_tags=num_tags)
    else:
        cidx = (ucf101.load_class_index(args.class_index)
                if args.class_index else None)
        records = ucf101.load_video_list(cfg.data.val_list, cfg.data.root, cidx)
        dataset = ClipDataset(records, cfg.data, mode="eval", num_tags=num_tags)

    model = model_from_config(cfg.model)

    # Weights-only restore: eval doesn't need the optimizer state, and a
    # typed restore would force this CLI's optimizer flags (--clip-grad-norm,
    # --grad-accum) to match the training run's exactly.
    ckpt = CheckpointManager(args.checkpoint_dir)
    variables, _step = ckpt.restore_weights()
    if variables is None:
        raise SystemExit(f"no checkpoint found in {args.checkpoint_dir}")
    apply_fn = None
    if args.int8:
        from fastvideotagging_tpu.evaluation.quantized import make_int8_apply
        from fastvideotagging_tpu.ops.preprocess_kernel import (
            preprocess_eval_clip,
        )

        calib = []
        for i in range(min(args.int8_calib_videos, len(dataset))):
            clips_u8, _ = dataset.get_eval_clips(i)
            calib.append(preprocess_eval_clip(
                clips_u8, cfg.data.resize_hw, cfg.data.crop_hw,
                cfg.data.mean, cfg.data.std,
                out_dtype_name=cfg.model.compute_dtype))
        variables, apply_fn = make_int8_apply(
            cfg.model.name, variables, calib,
            multilabel=cfg.model.multilabel)
    from fastvideotagging_tpu.parallel import make_mesh

    try:
        mesh = make_mesh(cfg.parallel.data_parallel,
                         cfg.parallel.model_parallel)
    except ValueError as e:
        # eval only shards the clip batch over the data axis; a config
        # whose (training) parallelism doesn't fit the local devices —
        # e.g. a model_parallel preset evaluated on one chip — must still
        # evaluate, just unsharded
        from fastvideotagging_tpu.utils.logging import get_logger

        get_logger("fvt.eval").warning(
            "eval: config mesh unavailable on this host (%s); "
            "evaluating unsharded", e)
        mesh = None
    if mesh is not None and jax.process_count() > 1:
        # orbax restore commits the weights to one local device; the jitted
        # eval runs on the cross-process mesh, so replicate them onto it
        # (every process restored identical values)
        from fastvideotagging_tpu.parallel.mesh import replicated

        # via host numpy: device_put of a COMMITTED device array onto a
        # cross-process sharding would attempt a cross-host transfer; host
        # values take the every-process-provides-the-value path
        variables = jax.device_put(jax.device_get(variables),
                                   replicated(mesh))
    out = evaluate(model, variables, dataset, cfg, clip_batch=args.clip_batch,
                   threshold=args.threshold, apply_fn=apply_fn, mesh=mesh)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
