"""int8 PTQ serving glue: calibrate + build an eval ``apply_fn``.

Bridges ops/int8_infer (the quantized engine) into the evaluation surface:
``make_int8_engine`` builds the jitted engine ONCE (qpack is a traced
argument), ``quantize_for`` produces a qpack from calibration clips, and
``make_int8_apply`` is the one-shot convenience doing both. The apply_fn
plugs straight into ``evaluate(..., apply_fn=...)`` /
``evaluate_video_scores`` (pass the qpack as the ``variables`` argument).
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


def _resolved(model_name: str, float_blocks):
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
    return stage_blocks, fb


def make_int8_engine(model_name: str, multilabel: bool = False,
                     float_blocks=None, dynamic: bool = False):
    """-> jitted ``apply_fn(qpack, clips) -> scores``, built ONCE.

    The qpack is a traced argument, so one engine serves any number of
    (re)calibrations — rebuilding the jitted lambda per qpack would miss
    jax's jit cache and recompile the whole backbone each time (the
    pitfall evaluate._make_apply documents)."""
    from fastvideotagging_tpu.ops.int8_infer import r2plus1d_int8_infer

    stage_blocks, fb = _resolved(model_name, float_blocks)
    return jax.jit(lambda q, x: heads.predict_scores(
        r2plus1d_int8_infer(q, x, stage_blocks, float_blocks=fb,
                            dynamic=dynamic),
        multilabel))


def quantize_for(model_name: str, variables: dict, calib_clips):
    """-> qpack for make_int8_engine's apply_fn.

    ``calib_clips``: iterable of preprocessed (K, T, ch, cw, 3) clip
    batches (e.g. ``preprocess_eval_clip`` outputs of a few videos)."""
    from fastvideotagging_tpu.ops.int8_infer import (
        calibrate, quantize_variables,
    )

    stage_blocks, _ = _resolved(model_name, None)
    scales = calibrate(variables, calib_clips, stage_blocks)
    return quantize_variables(variables, scales, stage_blocks)


def make_int8_apply(model_name: str, variables: dict, calib_clips,
                    multilabel: bool = False, float_blocks=None,
                    dynamic: bool = False):
    """One-shot convenience: -> (qpack, jitted apply_fn(qpack, clips)).

    For repeated requantization (e.g. per-video self-calibration), build
    the engine once with make_int8_engine and requantize with
    quantize_for instead."""
    qpack = quantize_for(model_name, variables, calib_clips)
    apply_fn = make_int8_engine(model_name, multilabel, float_blocks,
                                dynamic)
    return qpack, apply_fn
