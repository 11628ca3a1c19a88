"""Fused (2+1)D inference block: spatial conv + folded-BN affine + ReLU +
temporal conv in ONE Pallas kernel.

The unfused path writes the mid tensor (B,T,H,W,M — the *widest* tensor in
the network) to HBM after the spatial conv and reads it back for the temporal
conv. Here it never leaves VMEM: per (batch, H-tile) grid step the kernel

  1. builds spatial tap-packed patches from a halo'd slab (same scheme as
     ops/conv2plus1d.py) and runs k matmuls -> mid (T*tile_h*W, M) in f32,
  2. applies the folded BatchNorm affine (scale = gamma*rsqrt(var+eps),
     bias = beta - mean*scale) and ReLU on the accumulator,
  3. builds temporal tap patches by shifting mid along T with zero boundary
     rows and runs one (T*tile_h*W, k*M) @ (k*M, Co) matmul.

Inference-only (BN running stats are folded as constants; training-time BN
needs batch statistics over the whole mid tensor, which breaks tile
locality). Round-1 status: op-level with parity tests + on-chip benchmark;
model integration (an inference-specialized apply) is the designated next
step. Stride-1, odd k, C >= MIN_C; callers fall back to the composed ops
otherwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fastvideotagging_tpu.ops.conv2plus1d import MIN_C, _interpret, _pick_tile


def _kernel(x_cur, x_nxt, w_sp, scale, bias, w_tmp, out_ref, *,
            k: int, t: int, tile_h: int, w_out: int, c: int, m: int):
    # (t, tile_h + k - 1, Wp, C) halo'd slab along H
    slab = jnp.concatenate([x_cur[0], x_nxt[0][:, : k - 1]], axis=1)

    # 1) spatial conv: k matmuls with dh-taps packed into the contraction dim
    acc = jnp.zeros((t * tile_h * w_out, m), jnp.float32)
    for dw in range(k):
        cols = slab[:, :, dw : dw + w_out, :]  # normalize sublane offset
        taps = [cols[:, dh : dh + tile_h] for dh in range(k)]
        patches = jnp.concatenate(taps, axis=-1).reshape(
            t * tile_h * w_out, k * c)
        acc = acc + jnp.dot(patches, w_sp[dw],
                            preferred_element_type=jnp.float32)

    # 2) folded-BN affine + ReLU on the f32 accumulator (never leaves VMEM)
    mid = jnp.maximum(acc * scale[0] + bias[0], 0.0).astype(out_ref.dtype)
    mid = mid.reshape(t, tile_h * w_out, m)

    # 3) temporal conv: k accumulated matmuls over T-shifted slices of the
    # zero-extended mid (no k*M patch buffer — keeps VMEM bounded)
    p = k // 2
    zeros = jnp.zeros((p, tile_h * w_out, m), mid.dtype)
    ext = jnp.concatenate([zeros, mid, zeros], axis=0)  # (t + k - 1, ., m)
    y = jnp.zeros((t * tile_h * w_out, out_ref.shape[-1]), jnp.float32)
    for dt in range(k):
        tap = ext[dt : dt + t].reshape(t * tile_h * w_out, m)
        y = y + jnp.dot(tap, w_tmp[dt], preferred_element_type=jnp.float32)
    out_ref[0] = y.reshape(t, tile_h, w_out, -1).astype(out_ref.dtype)


def choose_tile_h(shape, k: int, m: int, co: int) -> int | None:
    """H-tile for the fused kernel, or None if no feasible tile exists.

    Feasible = divides H, provides the full (k-1)-row halo from ONE next
    block (tile_h >= k-1), and fits the VMEM budget. Mosaic's live-buffer
    accounting runs ~1.5-2x above the static estimate (concat temporaries,
    pipeline copies), hence the conservative 6 MB budget.
    """
    _, t, h, w, c = shape
    p = k // 2

    def vmem_estimate(th):
        pix = t * th * w
        x_blocks = 4 * t * th * (w + 2 * p) * c * 2  # 2 specs x 2 buffers
        acc = pix * m * 4
        patches = pix * k * c * 2
        mid_ext = (t + 2 * p) * th * w * m * 2
        out = 2 * pix * co * 2 + pix * co * 4
        weights = k * k * c * m * 2 + k * m * co * 2
        return x_blocks + acc + patches + mid_ext + out + weights

    tile_h = _pick_tile(h, 8)
    while tile_h >= k - 1 and vmem_estimate(tile_h) > 6 * 2 ** 20:
        nxt = _pick_tile(h, tile_h - 1)
        if nxt == tile_h:
            break
        tile_h = nxt
    if tile_h < k - 1 or vmem_estimate(tile_h) > 6 * 2 ** 20:
        return None
    return tile_h


@functools.partial(jax.jit, static_argnames=("k",))
def _fused_pallas(x, w_sp2d, scale, bias, w_tmp2d, k):
    b, t, h, w, c = x.shape
    m = w_sp2d.shape[-1]
    co = w_tmp2d.shape[-1]
    p = k // 2
    tile_h = choose_tile_h(x.shape, k, m, co)
    assert tile_h is not None, "caller must check fused_supported()"
    n_tiles = h // tile_h
    xp = jnp.pad(x, ((0, 0), (0, 0), (p, tile_h), (p, p), (0, 0)))
    block = (1, t, tile_h, w + 2 * p, c)
    return pl.pallas_call(
        functools.partial(_kernel, k=k, t=t, tile_h=tile_h, w_out=w, c=c, m=m),
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec(block, lambda i, j: (i, 0, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(block, lambda i, j: (i, 0, j + 1, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, k * c, m), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, m, co), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t, tile_h, w, co),
                               lambda i, j: (i, 0, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t, h, w, co), x.dtype),
        interpret=_interpret(),
    )(xp, xp, w_sp2d, scale, bias, w_tmp2d)


def fold_bn(gamma, beta, mean, var, eps: float = 1e-5):
    """BatchNorm running stats -> (scale, bias) affine, f32."""
    scale = gamma.astype(jnp.float32) * jax.lax.rsqrt(
        var.astype(jnp.float32) + eps)
    bias = beta.astype(jnp.float32) - mean.astype(jnp.float32) * scale
    return scale, bias


def fused_supported(x_shape, k: int, m: int, co: int) -> bool:
    """True if conv2plus1d_fused can run for these shapes."""
    _, t, h, w, c = x_shape
    return (k % 2 == 1 and c >= MIN_C and h >= k and w >= k
            and choose_tile_h(x_shape, k, m, co) is not None)


def conv2plus1d_fused(x, w_sp, scale, bias, w_tmp):
    """Fused inference (2+1)D block on NTHWC input.

    x: (B, T, H, W, C); w_sp: (k, k, C, M); scale/bias: (M,) folded BN;
    w_tmp: (k, M, Co). Returns (B, T, H, W, Co).
    """
    k = w_sp.shape[0]
    c = x.shape[-1]
    m = w_sp.shape[-1]
    if not (w_tmp.shape[0] == k
            and fused_supported(x.shape, k, m, w_tmp.shape[-1])):
        raise ValueError(
            "fused block requires odd k, C >= MIN_C, H/W >= k, and a feasible "
            "VMEM tile — check fused_supported() first")
    w_sp2d = w_sp.transpose(1, 0, 2, 3).reshape(k, k * c, m).astype(x.dtype)
    w_tmp2d = w_tmp.astype(x.dtype)  # (k, M, Co), tap-indexed in the kernel
    return _fused_pallas(
        x, w_sp2d, scale.reshape(1, -1).astype(jnp.float32),
        bias.reshape(1, -1).astype(jnp.float32), w_tmp2d, k)
