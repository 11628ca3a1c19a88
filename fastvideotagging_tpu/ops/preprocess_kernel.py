"""Fused on-device preprocessing (SURVEY.md N3, C4; BASELINE "resize /
center-crop / normalize fused into on-device Pallas/XLA preprocessing").

Replaces the reference's host-side numpy/cv2 per-frame loop (and NVVL's GPU
preprocessing) with a TPU-first formulation: the loader ships **raw uint8
frame stacks** (B, T, H0, W0, 3) to HBM, and the entire geometry pipeline —
bilinear resize, crop, horizontal flip, mean/std normalize — runs on-device
as two batched matmuls plus fused elementwise ops.

The trick: separable bilinear resize is a pair of small coefficient-matrix
matmuls (``A_h @ img @ A_w^T``), and *cropping is a row-slice of those
matrices* while *flipping is a row-reversal of A_w* — so resize+crop+flip
collapse into the same two MXU contractions, with per-sample crop offsets /
flip bits handled by dynamically slicing the coefficient matrices under vmap.
Normalization fuses into the epilogue. Numerics match the host numpy spec in
data/preprocess.py (same coefficients, same contraction order, f32).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from fastvideotagging_tpu.data.preprocess import resize_coeffs


@functools.partial(
    jax.jit,
    static_argnames=("resize_hw", "crop_hw", "out_dtype_name"),
)
def preprocess_batch(
    frames: jax.Array,  # (B, T, H0, W0, 3) uint8
    crop_tops: jax.Array,  # (B,) int32
    crop_lefts: jax.Array,  # (B,) int32
    flips: jax.Array,  # (B,) bool
    mean: jax.Array,  # (3,) f32, [0,1] units
    std: jax.Array,  # (3,) f32, [0,1] units
    *,
    resize_hw: tuple[int, int],
    crop_hw: tuple[int, int],
    out_dtype_name: str = "bfloat16",
) -> jax.Array:
    """uint8 NTHWC frames -> normalized (B, T, ch, cw, 3) in out_dtype."""
    b, t, h0, w0, c = frames.shape
    rh, rw = resize_hw
    ch, cw = crop_hw
    out_dtype = jnp.dtype(out_dtype_name)

    ah = jnp.asarray(resize_coeffs(h0, rh))  # (rh, h0) f32
    aw = jnp.asarray(resize_coeffs(w0, rw))  # (rw, w0) f32

    def one(frames_i, top, left, flip):
        # Fold crop into the coefficient matrices: take ch/cw rows.
        ah_i = jax.lax.dynamic_slice_in_dim(ah, top, ch, axis=0)  # (ch, h0)
        aw_i = jax.lax.dynamic_slice_in_dim(aw, left, cw, axis=0)  # (cw, w0)
        # Fold horizontal flip into A_w by reversing its rows.
        aw_i = jnp.where(flip, aw_i[::-1, :], aw_i)
        x = frames_i.astype(jnp.float32)  # (T, H0, W0, 3)
        # Same contraction order as the host spec: height, then width.
        # precision=HIGHEST: TPU f32 matmuls otherwise use bf16 multiplies,
        # which would put the resize ~1e-2 off the geometry spec.
        x = jnp.einsum("oh,thwc->towc", ah_i, x,
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
        x = jnp.einsum("pw,towc->topc", aw_i, x,
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
        return x

    x = jax.vmap(one)(frames, crop_tops, crop_lefts, flips)  # (B,T,ch,cw,3) f32
    m = mean.astype(jnp.float32) * 255.0
    s = std.astype(jnp.float32) * 255.0
    x = (x - m) / s
    return x.astype(out_dtype)


def preprocess_eval_clip(
    frames: np.ndarray | jax.Array,  # (K, T, H0, W0, 3) uint8, K clips
    resize_hw: tuple[int, int],
    crop_hw: tuple[int, int],
    mean,
    std,
    out_dtype_name: str = "float32",
) -> jax.Array:
    """Deterministic eval path: center crop, no flip, fixed float order."""
    k = frames.shape[0]
    rh, rw = resize_hw
    ch, cw = crop_hw
    top = (rh - ch) // 2
    left = (rw - cw) // 2
    return preprocess_batch(
        jnp.asarray(frames),
        jnp.full((k,), top, jnp.int32),
        jnp.full((k,), left, jnp.int32),
        jnp.zeros((k,), bool),
        jnp.asarray(mean, jnp.float32),
        jnp.asarray(std, jnp.float32),
        resize_hw=resize_hw,
        crop_hw=crop_hw,
        out_dtype_name=out_dtype_name,
    )
