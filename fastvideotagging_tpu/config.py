"""Frozen configuration tree for the framework.

The reference exposed every knob as a per-script argparse flag (SURVEY.md C18).
Here the single source of truth is a frozen dataclass tree; the CLI layer
(cli/*.py) constructs it from flags mirroring the reference's surface, and the
five BASELINE.json configs are checked in as named presets (SURVEY.md §6.6).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class ClipSamplerConfig:
    """Clip sampling semantics (SURVEY.md C3 — the golden-spec component).

    clip_len:   number of frames per clip (T).
    stride:     temporal stride between sampled frames.
    train_mode: 'random'  — random start offset (seeded per (epoch, sample)).
    eval_mode:  'center'  — single centered clip,
                'uniform' — num_eval_clips starts evenly spaced over the video,
                'dense'   — consecutive non-overlapping windows covering the video.
    """

    clip_len: int = 16
    stride: int = 1
    train_mode: str = "random"
    eval_mode: str = "center"
    num_eval_clips: int = 10


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Decode + preprocess pipeline config (SURVEY.md C1/C2/C4/C5)."""

    root: str = ""
    train_list: str = ""
    val_list: str = ""
    # Decoded source size the loader ships to the device. If set, frames go
    # to HBM raw and the device does the (spec-exact) resize; if None, the
    # host pre-resizes to resize_hw and the device resize is an identity.
    source_hw: Optional[Tuple[int, int]] = None
    # Resize target (height, width) before cropping. (128, 171) is the
    # canonical C3D/UCF101 geometry (Tran'15); Kinetics configs use (256, 342).
    resize_hw: Tuple[int, int] = (128, 171)
    crop_hw: Tuple[int, int] = (112, 112)
    # Per-channel RGB normalization in [0,1] units.
    mean: Tuple[float, float, float] = (0.43216, 0.394666, 0.37645)
    std: Tuple[float, float, float] = (0.22803, 0.22145, 0.216989)
    random_flip: bool = True
    # Apply the (random/center) crop on the HOST before shipping, sending
    # (crop_hw) uint8 instead of (resize_hw) — 1.75x fewer H2D bytes at the
    # canonical 128x171->112x112 geometry, bit-identical pixels (the device
    # resize is an identity matmul once frames are pre-resized, so its crop
    # row-slice equals the host slice). Covers the train step and
    # evaluate(); requires frames shipped at resize_hw (incompatible with
    # source_hw device-resize). Tagger/serving keep full-frame contracts.
    host_crop: bool = False
    num_workers: int = 8
    prefetch_depth: int = 2  # double-buffered device prefetch (SURVEY.md N5)
    # >0: cache decoded videos (at ship resolution) in host RAM up to this
    # many MiB. Decode-once for small datasets/benchmarks; 0 (default) keeps
    # the streaming decode path (UCF101/Kinetics do not fit in RAM).
    cache_mb: int = 0
    # Stage the WHOLE training pack into device HBM once and gather clips
    # on-device — per-step H2D becomes a few KB of indices instead of the
    # uint8 frame batch (data/device_cache.py). Requires a .fvtpack train
    # source; UCF101-scale packs at ship geometry fit a v5e's 16 GB.
    # Incompatible with host_crop (nothing left to crop on the host).
    cache_on_device: bool = False
    sampler: ClipSamplerConfig = dataclasses.field(default_factory=ClipSamplerConfig)


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    name: str = "r2plus1d_18"
    num_classes: int = 101
    multilabel: bool = False  # sigmoid tag head vs softmax CE (SURVEY.md C10)
    dropout: float = 0.5
    # 'xla'    -> lax.conv_general_dilated everywhere (always-correct fallback)
    # 'pallas' -> first-party Pallas kernels for the factorized (2+1)D convs
    kernels: str = "xla"
    compute_dtype: str = "bfloat16"  # params stay f32; compute in bf16 (MXU)
    # Normalization (r2plus1d family + tiny3d; models.layers.Norm):
    # 'batch'  -> BatchNorm, batch stats in train (reference-faithful default)
    # 'frozen' -> BN-lite: running averages always; removes the batch-stats
    #             passes from the train step (+15% measured on v5e)
    # 'group'  -> GroupNorm, batch-independent, no running stats
    # 'scaleonly' -> learned per-channel affine, no normalization statistics
    #             at all (WS + SkipInit restore from-scratch trainability:
    #             0.975 top-1, ACCURACY_HARD_SCALEONLY.json). Step-time
    #             NEUTRAL (PERF.md ROUND-4b) — choose it for train==eval /
    #             batch-independence / no SyncBN, not for speed.
    norm: str = "batch"
    # Activation rematerialization on the residual blocks (r2plus1d family;
    # models.r2plus1d.remat_policy): 'none'|'full'|'dots'|'mid'|'conv'.
    # Numerics-identical to 'none' — a training-throughput/memory knob that
    # trades recompute FLOPs (idle MXU, the step is byte-bound 2:1) for
    # activation HBM round-trips. Measured per-policy in REMAT_STEP.json.
    remat: str = "none"


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    batch_size: int = 32
    num_epochs: int = 30
    base_lr: float = 0.01
    momentum: float = 0.9
    weight_decay: float = 1e-4
    # Multi-factor LR schedule: multiply by lr_decay at each epoch in lr_steps.
    lr_steps: Tuple[int, ...] = (10, 20)
    lr_decay: float = 0.1
    warmup_epochs: int = 0
    # >0 clips gradients to this global L2 norm before SGD. Deep
    # no-residual backbones (s3d: ~45 chained BNs) have exploding
    # gradients at init when BN normalization groups are tiny (small
    # batch x 1x1x1 late-stage extents) — measured global grad norm 2.6e5
    # at loss 0.52 for s3d at batch 2, crop 32. 0 disables (default:
    # reference-faithful plain SGD).
    clip_grad_norm: float = 0.0
    grad_accum_steps: int = 1
    seed: int = 0
    log_every: int = 20
    checkpoint_dir: str = "checkpoints"  # "" disables checkpointing
    checkpoint_every_steps: int = 0  # 0 -> once per epoch
    resume: bool = False


@dataclasses.dataclass(frozen=True)
class ParallelConfig:
    """Mesh/partitioning config (SURVEY.md §6.8 — the comm 'component').

    data_axis:  batch sharded over this mesh axis, grads allreduced over ICI.
    model_axis: channel sharding for the dual-pathway stretch config (TP-like).
    Sizes of -1 mean "use all available devices on the data axis".
    """

    data_parallel: int = -1
    model_parallel: int = 1
    data_axis: str = "data"
    model_axis: str = "model"


@dataclasses.dataclass(frozen=True)
class ExperimentConfig:
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    parallel: ParallelConfig = dataclasses.field(default_factory=ParallelConfig)


def _kinetics_data(**kw) -> DataConfig:
    return DataConfig(
        resize_hw=(256, 342),
        crop_hw=(224, 224),
        sampler=ClipSamplerConfig(clip_len=32, stride=2, eval_mode="uniform"),
        **kw,
    )


# The five BASELINE.json configs, checked in as named presets (BASELINE.json
# "configs" list; SURVEY.md §7 maps them to [B:6-11]).
PRESETS = {
    # [B:7] C3D on one UCF101 clip: 16x112x112, batch 1, forward + sigmoid loss.
    "c3d_ucf101_smoke": ExperimentConfig(
        model=ModelConfig(name="c3d", num_classes=101, multilabel=True),
        train=TrainConfig(batch_size=1),
    ),
    # [B:8] R(2+1)D-18 on UCF101: 16x112x112 clips, batch 32, full train step.
    "r2plus1d18_ucf101": ExperimentConfig(
        model=ModelConfig(name="r2plus1d_18", num_classes=101),
        train=TrainConfig(batch_size=32),
    ),
    # [B:2] UCF101 top-1 PARITY protocol — the reference's de-facto
    # validation (SURVEY.md §5): official split lists (testlist01.txt has
    # no ids; classInd.txt maps the directory prefix), 128x171 resize ->
    # center 112x112 crop, 10 uniformly spaced eval clips per video,
    # video-level top-1 over fixed-order f32 score averaging. The day a
    # real UCF101 tree is mounted, the parity number is ONE command:
    #   python -m fastvideotagging_tpu.cli.evaluate --preset ucf101_parity \
    #     --data-root <UCF101 root> --val-list <.../testlist01.txt> \
    #     --class-index <.../classInd.txt> --checkpoint-dir <ckpts>
    # (protocol smoke-tested on a synthetic stand-in tree with the real
    # directory layout: tests/test_ucf101_parity.py; MIGRATION.md §parity)
    "ucf101_parity": ExperimentConfig(
        model=ModelConfig(name="r2plus1d_18", num_classes=101),
        data=DataConfig(
            sampler=ClipSamplerConfig(clip_len=16, eval_mode="uniform",
                                      num_eval_clips=10)),
        train=TrainConfig(batch_size=32),
    ),
    # [B:9] P3D-63 / R(2+1)D-34 on Kinetics-400: 32x224x224, multi-clip eval.
    "p3d63_kinetics": ExperimentConfig(
        model=ModelConfig(name="p3d_63", num_classes=400),
        data=_kinetics_data(),
    ),
    "r2plus1d34_kinetics": ExperimentConfig(
        model=ModelConfig(name="r2plus1d_34", num_classes=400),
        data=_kinetics_data(),
    ),
    # [B:10] Multi-label tagging: 1k-tag sigmoid head, dense clip sampling.
    "multilabel_tagging_1k": ExperimentConfig(
        model=ModelConfig(name="r2plus1d_18", num_classes=1000, multilabel=True),
        data=DataConfig(sampler=ClipSamplerConfig(eval_mode="dense")),
    ),
    # [B:11] SlowFast-style dual-pathway stretch, channel-sharded over ICI.
    "slowfast_stretch": ExperimentConfig(
        model=ModelConfig(name="slowfast_r2plus1d", num_classes=400),
        data=_kinetics_data(),
        parallel=ParallelConfig(model_parallel=2),
    ),
}
