"""fastvideotagging_tpu — a TPU-native video tagging / action recognition framework.

A from-scratch JAX/XLA/Pallas rebuild of the capability surface of
``bruceyang2012/FastVideoTagging`` (see SURVEY.md for the reconstructed component
inventory; the reference mount is empty, so parity is defined against
BASELINE.json and SURVEY.md's executable spec, not upstream file:line).

Public API (mirrors the reference's surface, SURVEY.md C9/C17):
    get_model(name, num_classes, ...)   -- model-zoo constructor by name
    list_models()                        -- registered backbone names
    tag(video_path, ...)                 -- one-call video -> [(tag, score)]
    ClipSamplerConfig                    -- clip sampler configuration

Internal layout convention: video tensors are **NTHWC** (batch, time, height,
width, channels) — channels-last is the TPU-native layout (C rides the 128-wide
lane dimension). The reference's MXNet convention was NCTHW; use
``utils.layout.ncthw_to_nthwc`` at the boundary if needed.
"""

__version__ = "0.1.0"

from fastvideotagging_tpu.config import (
    ClipSamplerConfig,
    DataConfig,
    ModelConfig,
    TrainConfig,
    ParallelConfig,
    ExperimentConfig,
    PRESETS,
)
from fastvideotagging_tpu.models.zoo import get_model, list_models

__all__ = [
    "__version__",
    "get_model",
    "list_models",
    "tag",
    "ClipSamplerConfig",
    "DataConfig",
    "ModelConfig",
    "TrainConfig",
    "ParallelConfig",
    "ExperimentConfig",
    "PRESETS",
]


def tag(video_path, *args, **kwargs):
    """One-call tagging entrypoint (lazy import to keep `import` light)."""
    from fastvideotagging_tpu.evaluation.tagger import tag as _tag

    return _tag(video_path, *args, **kwargs)
