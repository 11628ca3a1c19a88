"""3D-CNN backbones, heads, and the model zoo (SURVEY.md C6-C10)."""

from fastvideotagging_tpu.models.zoo import (  # noqa: F401
    get_model,
    list_models,
    model_from_config,
)
