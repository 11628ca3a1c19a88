"""Train CLI (reference: train.py; SURVEY.md §4.1).

    python -m fastvideotagging_tpu.cli.train --preset r2plus1d18_ucf101 \
        --data-root /data/ucf101 --train-list trainlist01.txt \
        --val-list testlist01.txt --class-index classInd.txt
"""

from __future__ import annotations

import argparse

from fastvideotagging_tpu.cli.common import (
    add_common_flags, add_train_flags, apply_platform, build_config,
    maybe_init_multihost,
)
from fastvideotagging_tpu.data import ucf101
from fastvideotagging_tpu.train.fit import fit


def parse_args(argv=None) -> argparse.Namespace:
    p = argparse.ArgumentParser(description=__doc__)
    add_common_flags(p)
    add_train_flags(p)
    p.add_argument("--class-index", default=None,
                   help="UCF101 classInd.txt (enables 1-based label parsing)")
    p.add_argument("--tag-lists", action="store_true",
                   help="parse lists as multi-label tag lists")
    p.add_argument("--pretrained", default=None,
                   help="initialize from pretrained weights: a weights "
                        "export dir or a torch .pth checkpoint (the "
                        "reference's pretrained= fine-tune path)")
    return p.parse_args(argv)


def load_records(cfg, args):
    from fastvideotagging_tpu.data.packed import is_pack

    if is_pack(cfg.data.train_list):
        # Decode-once tier: labels/tags live inside the pack; pass the
        # paths straight through (fit/make_eval_fn open PackedDatasets).
        if args.class_index:
            raise SystemExit(
                "--class-index is unused with a .fvtpack train list: "
                "labels were resolved at pack time (cli.prepare --pack)")
        val = cfg.data.val_list or None
        if val is not None and not is_pack(val):
            raise SystemExit(
                "--train-list is a .fvtpack but --val-list is not; pack "
                "both splits (cli.prepare --pack) or neither")
        num_tags = None
        if args.tag_lists:
            from fastvideotagging_tpu.data.packed import Pack

            num_tags = Pack(cfg.data.train_list).num_tags
            if num_tags is None:
                raise SystemExit(
                    "--tag-lists: this pack carries no tag sets (it was "
                    "written from class lists); re-pack the tag lists with "
                    "cli.prepare --pack-lists <lists...> --tag-lists")
        return cfg.data.train_list, val, num_tags
    cidx = (ucf101.load_class_index(args.class_index)
            if args.class_index else None)
    num_tags = None
    if args.tag_lists:
        train, tag_index = ucf101.load_tag_list(cfg.data.train_list, cfg.data.root)
        val = (ucf101.load_tag_list(cfg.data.val_list, cfg.data.root,
                                    tag_index)[0]
               if cfg.data.val_list else None)
        num_tags = len(tag_index)
    else:
        train = ucf101.load_video_list(cfg.data.train_list, cfg.data.root, cidx)
        val = (ucf101.load_video_list(cfg.data.val_list, cfg.data.root, cidx)
               if cfg.data.val_list else None)
    return train, val, num_tags


def main(argv=None):
    args = parse_args(argv)
    apply_platform(args)
    maybe_init_multihost(args)
    cfg = build_config(args)
    train_records, val_records, num_tags = load_records(cfg, args)
    init_variables = None
    if args.pretrained:
        from fastvideotagging_tpu.models.zoo import load_pretrained

        _, init_variables = load_pretrained(
            cfg.model.name, args.pretrained,
            num_classes=cfg.model.num_classes)
    fit(cfg, train_records, val_records=val_records, num_tags=num_tags,
        metrics_path=args.metrics_jsonl, init_variables=init_variables)


if __name__ == "__main__":
    main()
