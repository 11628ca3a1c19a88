"""int8 PTQ serving glue: calibrate + build an eval ``apply_fn``.

Bridges ops/int8_infer (the quantized engine) into the evaluation surface:
``make_int8_apply`` calibrates on a handful of clips, quantizes the
variables, and returns ``(qpack, apply_fn)`` where ``apply_fn`` plugs
straight into ``evaluate(..., apply_fn=...)`` / ``evaluate_video_scores``
(pass the qpack as the ``variables`` argument).
"""

from __future__ import annotations

import jax

from fastvideotagging_tpu.models import heads

# zoo name -> residual stage depths (the engine's layer walk)
STAGE_BLOCKS = {
    "r2plus1d_18": (2, 2, 2, 2),
    "r2plus1d_18_tpu": (2, 2, 2, 2),
    "r2plus1d_34": (3, 4, 6, 3),
    "r2plus1d_34_tpu": (3, 4, 6, 3),
}


def make_int8_apply(model_name: str, variables: dict, calib_clips,
                    multilabel: bool = False, float_blocks=None,
                    dynamic: bool = False):
    """-> (qpack, jitted apply_fn(qpack, clips) -> scores).

    ``calib_clips``: iterable of preprocessed (K, T, ch, cw, 3) clip
    batches (e.g. ``preprocess_eval_clip`` outputs of a few videos).
    Raises KeyError for model families the engine does not cover."""
    from fastvideotagging_tpu.ops.int8_infer import (
        calibrate, quantize_variables, r2plus1d_int8_infer,
    )

    if model_name not in STAGE_BLOCKS:
        raise KeyError(
            f"int8 serving engine covers {sorted(STAGE_BLOCKS)}; "
            f"got {model_name!r}")
    stage_blocks = STAGE_BLOCKS[model_name]
    if float_blocks is None:
        # default mixed-precision tail: ALL of stage 4 in bf16 (measured:
        # the cancellation-amplifying blocks; ops/int8_infer docstring)
        fb = tuple(f"stage4_block{b}" for b in range(stage_blocks[3]))
    else:
        fb = tuple(float_blocks)
    scales = calibrate(variables, calib_clips, stage_blocks)
    qpack = quantize_variables(variables, scales, stage_blocks)
    apply_fn = jax.jit(lambda q, x: heads.predict_scores(
        r2plus1d_int8_infer(q, x, stage_blocks, float_blocks=fb,
                            dynamic=dynamic),
        multilabel))
    return qpack, apply_fn
