"""Serving export: serialize the inference function as portable StableHLO.

Production deployment path beyond Python: `export_serving_fn` bakes the
trained weights into a jitted scores function (uint8 clips in, per-class
scores out — the full fused preprocess + backbone + sigmoid/softmax) and
serializes it with jax.export. The artifact is a self-contained StableHLO
program loadable by any JAX process (or a C++ PJRT runner) without this
package's code.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import export as jax_export

from fastvideotagging_tpu.config import ExperimentConfig
from fastvideotagging_tpu.models import heads, model_from_config
from fastvideotagging_tpu.ops.preprocess_kernel import preprocess_batch


def make_serving_fn(cfg: ExperimentConfig, variables: dict, qpack=None):
    """(clips uint8 (N,T,H,W,3)) -> scores f32 (N,K): preprocess + fwd + head.

    Center-crop, no flip — the deterministic eval path baked end to end.
    With ``qpack`` (from quantize_for_serving) the backbone runs through the
    int8 PTQ engine instead of model.apply — the int8 weights and epilogue
    constants bake into the exported program like any other constant.
    """
    d = cfg.data
    model = model_from_config(cfg.model, backend="xla")
    rh, rw = d.resize_hw
    ch, cw = d.crop_hw
    top, left = (rh - ch) // 2, (rw - cw) // 2
    mean = jnp.asarray(d.mean, jnp.float32)
    std = jnp.asarray(d.std, jnp.float32)
    multilabel = cfg.model.multilabel
    if qpack is not None:
        from fastvideotagging_tpu.evaluation.quantized import _resolved
        from fastvideotagging_tpu.ops.int8_infer import int8_infer

        # _resolved raises the informative coverage error (not a bare
        # KeyError) for models the int8 engine does not cover (ADVICE r2)
        arch, tail = _resolved(cfg.model.name, None)

    def scores(frames_u8):
        n = frames_u8.shape[0]
        clips = preprocess_batch(
            frames_u8,
            jnp.full((n,), top, jnp.int32), jnp.full((n,), left, jnp.int32),
            jnp.zeros((n,), bool), mean, std,
            resize_hw=d.resize_hw, crop_hw=d.crop_hw,
            out_dtype_name=cfg.model.compute_dtype,
        )
        if qpack is not None:
            # spec default: dynamic per-batch scales where static
            # calibration measurably loses accuracy (s3d, INT8_S3D.json)
            logits = int8_infer(qpack, clips, arch, float_blocks=tail,
                                dynamic=arch.default_dynamic)
        else:
            logits = model.apply(variables, clips, train=False)
        return heads.predict_scores(logits, multilabel)

    return scores


def quantize_for_serving(cfg: ExperimentConfig, variables: dict,
                         calib_frames_u8) -> dict:
    """-> qpack for the int8 serving export, calibrated on uint8 clip
    batches run through the SAME baked preprocess path."""
    from fastvideotagging_tpu.evaluation.quantized import _resolved
    from fastvideotagging_tpu.ops.int8_infer import calibrate, quantize_variables

    d = cfg.data
    rh, rw = d.resize_hw
    ch, cw = d.crop_hw
    top, left = (rh - ch) // 2, (rw - cw) // 2
    arch, _ = _resolved(cfg.model.name, None)
    calib = []
    for frames in calib_frames_u8:
        n = frames.shape[0]
        calib.append(preprocess_batch(
            jnp.asarray(frames),
            jnp.full((n,), top, jnp.int32), jnp.full((n,), left, jnp.int32),
            jnp.zeros((n,), bool),
            jnp.asarray(d.mean, jnp.float32), jnp.asarray(d.std, jnp.float32),
            resize_hw=d.resize_hw, crop_hw=d.crop_hw,
            out_dtype_name=cfg.model.compute_dtype))
    scales = calibrate(variables, calib, spec=arch)
    return quantize_variables(variables, scales, spec=arch)


def export_serving(cfg: ExperimentConfig, variables: dict, clip_batch: int,
                   path: str | None = None, qpack=None,
                   platforms=None) -> bytes:
    """Serialize the serving fn for (clip_batch, T, H, W, 3) uint8 input.

    ``platforms`` lowers for other backends (e.g. ("tpu",) from a CPU
    process) — same semantics as export_serving_stablehlo, so a
    ``--format both`` export stays consistent across the two artifacts.
    """
    d = cfg.data
    h, w = d.source_hw or d.resize_hw
    spec = jax.ShapeDtypeStruct(
        (clip_batch, d.sampler.clip_len, h, w, 3), jnp.uint8)
    fn = jax.jit(make_serving_fn(cfg, variables, qpack=qpack))
    data = jax_export.export(fn, platforms=platforms)(spec).serialize()
    if path is not None:
        with open(path, "wb") as f:
            f.write(data)
    return data


def load_serving(path_or_bytes) -> "jax_export.Exported":
    """Deserialize an exported serving program; run via ``.call(clips)``."""
    data = (path_or_bytes if isinstance(path_or_bytes, bytes)
            else open(path_or_bytes, "rb").read())
    return jax_export.deserialize(data)


def export_serving_stablehlo(cfg: ExperimentConfig, variables: dict,
                             clip_batch: int, path: str,
                             platforms=None, qpack=None) -> bytes:
    """Raw StableHLO bytecode of the serving fn — the native-runner format.

    Unlike export_serving (a jax.export artifact, reloadable only by jax),
    this writes the bare MLIR module bytecode that any PJRT plugin compiles
    directly: the C++ runner (native/pjrt_runner.cc) consumes it with zero
    Python in the serving process. ``platforms`` lowers cross-platform (e.g.
    ("tpu",) from a CPU-backend process).
    """
    d = cfg.data
    h, w = d.source_hw or d.resize_hw
    spec = jax.ShapeDtypeStruct(
        (clip_batch, d.sampler.clip_len, h, w, 3), jnp.uint8)
    fn = jax.jit(make_serving_fn(cfg, variables, qpack=qpack))
    exported = jax_export.export(fn, platforms=platforms)(spec)
    data = exported.mlir_module_serialized
    with open(path, "wb") as f:
        f.write(data)
    return data
