"""Fused inference engine for R(2+1)D (serving runtime).

Executes a trained R2Plus1D's forward pass directly from its variables
(params + BN running stats, as produced by models/r2plus1d.py), replacing
each stride-1 (2+1)D pair + BN + ReLU with the single-kernel
ops/fused_block.py and folding every BatchNorm into an affine. Strided
stage-entry pairs and the tiny-channel stem use the lax fallback.

This is the params-as-data serving path: no flax module in the loop, one
jittable function. Output parity with model.apply(train=False) is tested to
bf16 tolerance.

Status (v5e, 2026-08-16): end-to-end this engine measures ~47 ms vs ~31 ms
for the jitted model.apply at B=32 — XLA's in-graph conv + epilogue fusion
currently beats the per-block custom-call path (each pallas_call pays layout
/ pipeline-boundary costs that outweigh keeping the mid tensor in VMEM).
Kept as the correctness-tested foundation for a future whole-stage kernel;
the production serving path remains jit(model.apply).

NOTE (round 3): the production serving/int8 walks are spec-driven
(ops/arch_spec.py — the single source of truth for block structure); this
module intentionally keeps its own hand walk because its whole point is
the (2+1)D-pair fusion experiment, and it is parity-tested against
model.apply (tests/test_fused_infer.py). Structure changes land in
arch_spec first; this file is measured-dead-end evidence, not a surface.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from fastvideotagging_tpu.ops.fused_block import (
    conv2plus1d_fused,
    fold_bn,
    fused_supported,
)


def _conv(x, kernel, strides):
    # Symmetric (k//2, k//2) padding — must match models.layers semantics.
    pad = tuple((k // 2, k // 2) for k in kernel.shape[:3])
    return lax.conv_general_dilated(
        x, kernel.astype(x.dtype), window_strides=strides, padding=pad,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def _bn_affine(p, s):
    return fold_bn(p["BatchNorm_0"]["scale"], p["BatchNorm_0"]["bias"],
                   s["BatchNorm_0"]["mean"], s["BatchNorm_0"]["var"])


def _apply_affine(x, scale, bias, relu=False):
    y = x.astype(jnp.float32) * scale + bias
    if relu:
        y = jnp.maximum(y, 0.0)
    return y.astype(x.dtype)


def _conv2plus1d(x, cp, cs, spatial_stride, temporal_stride):
    """One factorized pair; fused kernel when stride-1 and wide enough."""
    w_sp = cp["spatial"]["kernel"][0]          # (k, k, C, M)
    w_tmp = cp["temporal"]["kernel"][:, 0, 0]  # (k, M, Co)
    scale, bias = _bn_affine(cp["bn_mid"], cs["bn_mid"])
    if (spatial_stride == 1 and temporal_stride == 1
            and fused_supported(x.shape, w_sp.shape[0], w_sp.shape[-1],
                                w_tmp.shape[-1])):
        return conv2plus1d_fused(x, w_sp.astype(x.dtype), scale, bias,
                                 w_tmp.astype(x.dtype))
    y = _conv(x, w_sp[None], (1, spatial_stride, spatial_stride))
    y = _apply_affine(y, scale, bias, relu=True)
    return _conv(y, w_tmp[:, None, None], (temporal_stride, 1, 1))


@functools.partial(jax.jit, static_argnames=("stage_blocks",))
def r2plus1d_fused_infer(variables: dict, x: jax.Array,
                         stage_blocks: tuple = (2, 2, 2, 2)) -> jax.Array:
    """Inference-mode forward, fused. x: (B, T, H, W, 3) -> (B, K) f32."""
    p, s = variables["params"], variables["batch_stats"]
    x = x.astype(jnp.bfloat16) if x.dtype != jnp.bfloat16 else x

    # Stem (tiny channels: lax path).
    y = _conv(x, p["stem_spatial"]["kernel"], (1, 2, 2))
    y = _apply_affine(y, *_bn_affine(p["stem_bn1"], s["stem_bn1"]), relu=True)
    y = _conv(y, p["stem_temporal"]["kernel"], (1, 1, 1))
    y = _apply_affine(y, *_bn_affine(p["stem_bn2"], s["stem_bn2"]), relu=True)

    for stage, num_blocks in enumerate(stage_blocks):
        for block in range(num_blocks):
            stride = 2 if (stage > 0 and block == 0) else 1
            bp = p[f"stage{stage + 1}_block{block}"]
            bs = s[f"stage{stage + 1}_block{block}"]
            residual = y
            z = _conv2plus1d(y, bp["conv1"], bs["conv1"], stride, stride)
            z = _apply_affine(z, *_bn_affine(bp["bn1"], bs["bn1"]), relu=True)
            z = _conv2plus1d(z, bp["conv2"], bs["conv2"], 1, 1)
            z = _apply_affine(z, *_bn_affine(bp["bn2"], bs["bn2"]))
            if "downsample" in bp:
                residual = _conv(y, bp["downsample"]["kernel"],
                                 (stride, stride, stride))
                residual = _apply_affine(
                    residual, *_bn_affine(bp["bn_down"], bs["bn_down"]))
            y = jnp.maximum(z + residual, 0.0).astype(z.dtype)

    pooled = jnp.mean(y.astype(jnp.float32), axis=(1, 2, 3))
    logits = pooled @ p["fc"]["kernel"] + p["fc"]["bias"]
    return logits.astype(jnp.float32)
