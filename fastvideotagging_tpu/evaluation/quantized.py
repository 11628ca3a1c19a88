"""int8 PTQ serving glue: calibrate + build an eval ``apply_fn``.

Bridges ops/int8_infer (the quantized engine) into the evaluation surface:
``make_int8_engine`` builds the jitted engine ONCE (qpack is a traced
argument), ``quantize_for`` produces a qpack from calibration clips, and
``make_int8_apply`` is the one-shot convenience doing both. The apply_fn
plugs straight into ``evaluate(..., apply_fn=...)`` /
``evaluate_video_scores`` (pass the qpack as the ``variables`` argument).

Round 3: coverage is driven by the declarative architecture specs
(ops/arch_spec.spec_for) — the r2plus1d family, P3D-63/131/199, C3D,
r3d/mc3, the SlowFast dual-pathway net and S3D all share one engine; the
per-model mixed-precision bf16 tail comes from the spec
(``default_float_blocks``).
"""

from __future__ import annotations

import jax

from fastvideotagging_tpu.models import heads
from fastvideotagging_tpu.ops.arch_spec import COVERED_MODELS, spec_for

# Round-2 compatibility: the stage depths of the r2plus1d family (a few
# call sites and tests key on this name; coverage itself now lives in
# arch_spec.spec_for).
STAGE_BLOCKS = {
    "r2plus1d_18": (2, 2, 2, 2),
    "r2plus1d_18_tpu": (2, 2, 2, 2),
    "r2plus1d_34": (3, 4, 6, 3),
    "r2plus1d_34_tpu": (3, 4, 6, 3),
}


def _resolved(model_name: str, float_blocks):
    """-> (ArchSpec, float_blocks tuple); raises the informative coverage
    KeyError for unsupported zoo names."""
    spec = spec_for(model_name)  # raises KeyError with the covered list
    fb = (spec.default_float_blocks if float_blocks is None
          else tuple(float_blocks))
    return spec, fb


def make_int8_engine(model_name: str, multilabel: bool = False,
                     float_blocks=None, dynamic: bool | None = None):
    """-> jitted ``apply_fn(qpack, clips) -> scores``, built ONCE.

    The qpack is a traced argument, so one engine serves any number of
    (re)calibrations — rebuilding the jitted lambda per qpack would miss
    jax's jit cache and recompile the whole backbone each time (the
    pitfall evaluate._make_apply documents).

    ``dynamic=None`` takes the SPEC's measured default: static calibrated
    scales for the residual families (the requant fuses into the conv
    epilogue — the 1.3x path), dynamic per-batch scales where statics
    measurably lose accuracy (s3d: -3pp, benchmarks/INT8_S3D.json)."""
    from fastvideotagging_tpu.ops.int8_infer import int8_infer

    spec, fb = _resolved(model_name, float_blocks)
    if dynamic is None:
        dynamic = spec.default_dynamic
    return jax.jit(lambda q, x: heads.predict_scores(
        int8_infer(q, x, spec, float_blocks=fb, dynamic=dynamic),
        multilabel))


def quantize_for(model_name: str, variables: dict, calib_clips):
    """-> qpack for make_int8_engine's apply_fn.

    ``calib_clips``: iterable of preprocessed (K, T, ch, cw, 3) clip
    batches (e.g. ``preprocess_eval_clip`` outputs of a few videos).

    Specs with ``default_site_margins`` (the Inception families) get
    branch-site-aware static headroom: per-site margins derived from the
    calibration batches' absmax spread, so the STATIC engine holds the
    accuracy dynamic mode was previously needed for
    (benchmarks/INT8_INCEPTION.json)."""
    from fastvideotagging_tpu.ops.int8_infer import (
        calibrate, quantize_variables,
    )

    spec, _ = _resolved(model_name, None)
    if spec.default_site_margins:
        scales, margins = calibrate(variables, calib_clips, spec=spec,
                                    return_margins=True)
        return quantize_variables(variables, scales, spec=spec,
                                  static_margin=margins)
    scales = calibrate(variables, calib_clips, spec=spec)
    return quantize_variables(variables, scales, spec=spec)


def make_int8_apply(model_name: str, variables: dict, calib_clips,
                    multilabel: bool = False, float_blocks=None,
                    dynamic: bool | None = None):
    """One-shot convenience: -> (qpack, jitted apply_fn(qpack, clips)).

    For repeated requantization (e.g. per-video self-calibration), build
    the engine once with make_int8_engine and requantize with
    quantize_for instead."""
    qpack = quantize_for(model_name, variables, calib_clips)
    apply_fn = make_int8_engine(model_name, multilabel, float_blocks,
                                dynamic)
    return qpack, apply_fn
