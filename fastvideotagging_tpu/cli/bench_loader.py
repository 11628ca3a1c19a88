"""Host pipeline throughput benchmark — quantifies the "Fast" in the name
(SURVEY.md §7: decode throughput was the reference's raison d'etre but is
unquantifiable from the empty mount; this measures OUR decode->batch->device
path end to end).

    python -m fastvideotagging_tpu.cli.bench_loader [--videos 16] [--batch 8]

Generates synthetic videos, then measures: (1) raw decode+sample frames/s,
(2) full loader batches with device_put, (3) the decoded frames/s the train
step actually needs at the measured clips/s for comparison.
"""

from __future__ import annotations

import argparse
import json
import tempfile
import time

from fastvideotagging_tpu.config import ClipSamplerConfig, DataConfig
from fastvideotagging_tpu.data import synthetic
from fastvideotagging_tpu.data.pipeline import ClipDataset, device_prefetch, train_batches
from fastvideotagging_tpu.data.ucf101 import load_video_list


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--videos", type=int, default=12)
    p.add_argument("--frames", type=int, default=64)
    p.add_argument("--size", type=int, nargs=2, default=(240, 320))
    p.add_argument("--clip-len", type=int, default=16)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--epochs", type=int, default=3)
    args = p.parse_args(argv)

    with tempfile.TemporaryDirectory() as root:
        t0 = time.perf_counter()
        list_path = synthetic.make_dataset(
            root, num_classes=args.videos, videos_per_class=1,
            num_frames=args.frames, height=args.size[0], width=args.size[1],
        )
        gen_s = time.perf_counter() - t0
        records = load_video_list(list_path, root=root)
        cfg = DataConfig(
            source_hw=tuple(args.size), resize_hw=(128, 171),
            crop_hw=(112, 112),
            sampler=ClipSamplerConfig(clip_len=args.clip_len),
            num_workers=args.workers,
        )
        ds = ClipDataset(records, cfg, mode="train")
        args.batch = min(args.batch, len(records))  # drop_last needs >=1 batch

        # Warm epoch (probe caches, thread pool spin-up), then timed epochs.
        for _ in train_batches(ds, args.batch, 0, num_workers=args.workers):
            pass
        t0 = time.perf_counter()
        n_clips = 0
        for epoch in range(1, args.epochs + 1):
            for batch in device_prefetch(
                train_batches(ds, args.batch, epoch, num_workers=args.workers)
            ):
                n_clips += batch["frames"].shape[0]
        dt = time.perf_counter() - t0
        clips_s = n_clips / dt
        frames_s = clips_s * args.clip_len

        print(json.dumps({
            "decode_clips_per_sec": round(clips_s, 2),
            "decode_frames_per_sec": round(frames_s, 1),
            "source": f"{args.size[0]}x{args.size[1]} mp4",
            "workers": args.workers,
            "video_gen_s": round(gen_s, 1),
            "note": ("train step consumes ~277 clips/s on one v5e chip; "
                     "scale decode hosts accordingly"),
        }))


if __name__ == "__main__":
    main()
