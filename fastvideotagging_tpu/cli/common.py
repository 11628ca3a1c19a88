"""Shared argparse plumbing: flags -> frozen config tree (SURVEY.md C18, §6.6).

Every knob of the reference's train/eval/tag scripts exists as a flag here;
``--preset`` selects one of the checked-in BASELINE configs and flags override
its fields.
"""

from __future__ import annotations

import argparse
import dataclasses

from fastvideotagging_tpu.config import (
    PRESETS,
    ClipSamplerConfig,
    DataConfig,
    ExperimentConfig,
    ModelConfig,
    ParallelConfig,
    TrainConfig,
)


def add_common_flags(p: argparse.ArgumentParser) -> None:
    p.add_argument("--preset", choices=sorted(PRESETS), default=None,
                   help="named BASELINE config; flags override its fields")
    # Backend selection must happen IN-PROCESS: on this image a baked
    # sitecustomize re-exports JAX_PLATFORMS before user code runs, so the
    # env-var route is dead (CLAUDE.md §pitfalls); jax.config.update before
    # the first backend query is the only working switch.
    p.add_argument("--platform", choices=["cpu", "tpu", "axon"], default=None,
                   help="force the jax backend (default: the environment's); "
                        "cpu is useful for smoke runs and multi-host drills; "
                        "'axon' is the dev image's TPU-tunnel backend (its "
                        "default, so usually no flag is needed for the TPU)")
    p.add_argument("--cpu-devices", type=int, default=None,
                   help="with --platform cpu: number of virtual CPU devices")
    # model
    p.add_argument("--model", default=None, help="zoo name, e.g. r2plus1d_18")
    p.add_argument("--num-classes", type=int, default=None)
    p.add_argument("--multilabel", action=argparse.BooleanOptionalAction,
               default=None,
               help="--no-multilabel overrides a preset's True")
    p.add_argument("--dropout", type=float, default=None)
    p.add_argument("--kernels", choices=["xla", "pallas"], default=None)
    p.add_argument("--norm",
                   choices=["batch", "frozen", "group", "scaleonly"],
                   default=None,
                   help="normalization: batch (faithful) | frozen (BN-lite) "
                        "| group | scaleonly (stats-free affine + weight "
                        "standardization — the TPU training mode)")
    p.add_argument("--compute-dtype", choices=["bfloat16", "float32"],
                   default=None)
    # data
    p.add_argument("--data-root", default=None)
    p.add_argument("--train-list", default=None)
    p.add_argument("--val-list", default=None)
    p.add_argument("--clip-len", type=int, default=None)
    p.add_argument("--stride", type=int, default=None)
    p.add_argument("--eval-mode", choices=["center", "uniform", "dense"],
                   default=None)
    p.add_argument("--num-eval-clips", type=int, default=None)
    p.add_argument("--resize", type=int, nargs=2, metavar=("H", "W"), default=None)
    p.add_argument("--crop", type=int, nargs=2, metavar=("H", "W"), default=None)
    p.add_argument("--num-workers", type=int, default=None)
    p.add_argument("--cache-mb", type=int, default=None,
                   help=">0 caches decoded videos in host RAM (small sets)")
    p.add_argument("--host-crop", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="crop on the host before H2D (1.75x fewer shipped "
                        "bytes at 128x171->112x112, bit-identical pixels; "
                        "training path; needs frames shipped at resize_hw)")
    p.add_argument("--cache-on-device", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="stage the whole .fvtpack into device HBM once and "
                        "gather clips on-device — per-step H2D becomes a few "
                        "KB of indices (needs a packed --train-list; "
                        "bit-identical batches to the streaming loader)")


def add_train_flags(p: argparse.ArgumentParser) -> None:
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--momentum", type=float, default=None)
    p.add_argument("--wd", type=float, default=None)
    p.add_argument("--lr-steps", type=int, nargs="*", default=None)
    p.add_argument("--lr-decay", type=float, default=None)
    p.add_argument("--warmup-epochs", type=int, default=None)
    p.add_argument("--clip-grad-norm", type=float, default=None,
                   help=">0 clips gradients to this global L2 norm "
                        "(recommended for s3d, which has no residual "
                        "bypass and explodes at init on tiny batches)")
    p.add_argument("--grad-accum", type=int, default=None)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--resume", action=argparse.BooleanOptionalAction,
               default=None,
               help="--no-resume overrides a preset's True")
    p.add_argument("--log-every", type=int, default=None)
    p.add_argument("--data-parallel", type=int, default=None)
    p.add_argument("--model-parallel", type=int, default=None)
    p.add_argument("--metrics-jsonl", default=None)
    add_multihost_flags(p)


def add_multihost_flags(p: argparse.ArgumentParser) -> None:
    # multi-host (SURVEY.md §6.8 DCN tier): run the SAME command on every
    # host with its --process-id; jax.distributed joins them into one job
    # and make_mesh spans all hosts' chips. Used by train and evaluate.
    p.add_argument("--coordinator", default=None, metavar="HOST:PORT",
                   help="multi-host coordinator address (process 0's host); "
                        "enables jax.distributed across hosts")
    p.add_argument("--num-processes", type=int, default=None,
                   help="total number of host processes in the job")
    p.add_argument("--process-id", type=int, default=None,
                   help="this host's index in [0, num-processes)")


def apply_platform(args: argparse.Namespace) -> None:
    """Apply --platform/--cpu-devices. Call FIRST in every CLI main, before
    anything that could initialize the jax backend."""
    if getattr(args, "cpu_devices", None) and \
            getattr(args, "platform", None) != "cpu":
        raise SystemExit("--cpu-devices needs --platform cpu")
    if getattr(args, "platform", None) is None:
        return
    import jax

    try:
        jax.config.update("jax_platforms", args.platform)
        if args.platform == "cpu" and args.cpu_devices:
            jax.config.update("jax_num_cpu_devices", int(args.cpu_devices))
    except RuntimeError as e:
        raise SystemExit(
            f"--platform {args.platform}: backend already initialized "
            f"({e}); pass the flag to the entry CLI, not after jax use")
    # A too-late jax_platforms update is silently IGNORED by jax (only the
    # device-count update raises), so verify the switch actually took — a
    # 'cpu smoke run' silently landing on the TPU tunnel would consume the
    # single client slot. default_backend() initializes the (now correctly
    # selected) backend, which the CLI was about to do anyway.
    got = jax.default_backend()
    if got != args.platform:
        raise SystemExit(
            f"--platform {args.platform}: jax already initialized the "
            f"{got!r} backend before the flag applied; pass the flag to "
            f"the entry CLI, not after jax use")


def maybe_init_multihost(args: argparse.Namespace) -> None:
    """Join the multi-host job when --coordinator is given. Must run before
    any other jax use (the backend initializes once)."""
    if getattr(args, "coordinator", None) is None:
        return
    if args.num_processes is None or args.process_id is None:
        raise SystemExit("--coordinator needs --num-processes and --process-id")
    from fastvideotagging_tpu.parallel.mesh import init_multihost

    init_multihost(args.coordinator, args.num_processes, args.process_id)


def _override(dc, **kw):
    updates = {k: v for k, v in kw.items() if v is not None}
    return dataclasses.replace(dc, **updates) if updates else dc


def build_config(args: argparse.Namespace) -> ExperimentConfig:
    cfg = PRESETS[args.preset] if args.preset else ExperimentConfig()
    g = lambda name: getattr(args, name, None)  # noqa: E731

    sampler = _override(
        cfg.data.sampler,
        clip_len=g("clip_len"), stride=g("stride"), eval_mode=g("eval_mode"),
        num_eval_clips=g("num_eval_clips"),
    )
    data = _override(
        cfg.data,
        root=g("data_root"), train_list=g("train_list"), val_list=g("val_list"),
        resize_hw=tuple(args.resize) if g("resize") else None,
        crop_hw=tuple(args.crop) if g("crop") else None,
        num_workers=g("num_workers"), cache_mb=g("cache_mb"),
        host_crop=g("host_crop"), cache_on_device=g("cache_on_device"),
    )
    data = dataclasses.replace(data, sampler=sampler)
    model = _override(
        cfg.model,
        name=g("model"), num_classes=g("num_classes"), multilabel=g("multilabel"),
        dropout=g("dropout"), kernels=g("kernels"), norm=g("norm"),
        compute_dtype=g("compute_dtype"),
    )
    train = _override(
        cfg.train,
        batch_size=g("batch_size"), num_epochs=g("epochs"), base_lr=g("lr"),
        momentum=g("momentum"), weight_decay=g("wd"),
        lr_steps=tuple(args.lr_steps) if g("lr_steps") else None,
        lr_decay=g("lr_decay"), warmup_epochs=g("warmup_epochs"),
        clip_grad_norm=g("clip_grad_norm"),
        grad_accum_steps=g("grad_accum"), seed=g("seed"),
        checkpoint_dir=g("checkpoint_dir"), resume=g("resume"),
        log_every=g("log_every"),
    )
    parallel = _override(
        cfg.parallel,
        data_parallel=g("data_parallel"), model_parallel=g("model_parallel"),
    )
    return ExperimentConfig(model=model, data=data, train=train,
                            parallel=parallel)
