"""EXPERIMENTAL: channel-major (transposed-layout) spatial conv prototype.

Motivation (see CLAUDE.md "perf state"): with NTHWC activations, the MXU
output tile has N = Cout in lanes — the paper's channel counts (144, 230,
288...) pad to 128-multiples and cap lane utilization at ~56%. Transposing
the problem puts Cout on the SUBLANE axis (pad-to-8: 144 -> exact) and
pixels on lanes (pad-to-128 over thousands of pixels: ~98%):

    out^T (Co, S) = W2 (Co, k^2*C) @ patches (k^2*C, S)

with activations stored channel-major, x^T (N, C, S_padded). Tap shifts
become lane-offset slices of one fully-VMEM-resident slab (per batch item);
taps stack on the sublane axis at C-aligned offsets. Boundary wrap from the
flattened (H, W) -> S indexing is corrected by lane masks.

This file is the measured evidence for the round-2 "C-major model" decision;
nothing in the model uses it yet (activations would need to be C-major
end-to-end or boundary transposes eat the win).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fastvideotagging_tpu.ops.conv2plus1d import _interpret


def _kernel(x_ref, w_ref, mask_ref, out_ref, patches, *, k: int, h: int,
            w: int, c: int):
    # slab lanes: [p lead zeros] + (h + 2p) padded rows * w + [p trail zeros];
    # out pixel s for tap (dh, dw) reads slab lane s + dh*w + dw (always >= 0).
    s_out = h * w
    slab = x_ref[0]  # (C, p + (h + 2p)*w + p), fully VMEM-resident
    for dh in range(k):
        for dw in range(k):
            i = dh * k + dw
            sl = slab[:, dh * w + dw : dh * w + dw + s_out]
            # store into scratch: normalizes the lane-offset layout (Mosaic
            # cannot concat operands with mismatched non-concat offsets, and
            # roll is 32-bit-only); mask kills the row-wrap lanes.
            patches[i * c : (i + 1) * c, :] = sl * mask_ref[i]
    out_ref[0] = jnp.dot(w_ref[:], patches[:],
                         preferred_element_type=jnp.float32
                         ).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("k", "h", "w"))
def _cmajor_pallas(x_cm, w2, masks, k, h, w):
    n, c, _sp = x_cm.shape
    co = w2.shape[0]
    s_out = h * w
    return pl.pallas_call(
        functools.partial(_kernel, k=k, h=h, w=w, c=c),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, c, x_cm.shape[2]), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((co, k * k * c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k * k, 1, s_out), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, co, s_out), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, co, s_out), x_cm.dtype),
        scratch_shapes=[pltpu.VMEM((k * k * c, s_out), x_cm.dtype)],
        interpret=_interpret(),
    )(x_cm, w2, masks)


def spatial_conv_cmajor(x_cm: jax.Array, w: jax.Array, h: int,
                        w_dim: int) -> jax.Array:
    """Stride-1 SAME 1xkxk conv on channel-major input.

    x_cm: (N, C, H*W) channel-major flattened pixels; w: (k, k, C, Co).
    Returns (N, Co, H*W).
    """
    k = w.shape[0]
    p = k // 2
    n, c, s = x_cm.shape
    assert s == h * w_dim
    co = w.shape[-1]

    # Pad H by p rows top/bottom, then p lead + p trail zero lanes so every
    # tap slice offset dh*w + dw (length h*w) is in range:
    # out pixel s reads padded flat (s + dh*w + dw - p) + p lead = s + dh*w + dw.
    xp = x_cm.reshape(n, c, h, w_dim)
    xp = jnp.pad(xp, ((0, 0), (0, 0), (p, p), (0, 0)))
    xp = xp.reshape(n, c, (h + 2 * p) * w_dim)
    xp = jnp.pad(xp, ((0, 0), (0, 0), (p, p)))

    # Masks: out pixel (r, col) for tap (dh, dw) is valid iff
    # 0 <= col + dw - p < w (row wrap correction).
    cols = np.arange(h * w_dim) % w_dim
    masks = np.stack([
        ((cols + dw - p >= 0) & (cols + dw - p < w_dim)).astype(np.float32)
        for dh in range(k) for dw in range(k)
    ]).reshape(k * k, 1, h * w_dim)

    # Weight: (Co, k*k*C) matching tap-major, C-minor patch stacking.
    w2 = w.transpose(3, 0, 1, 2).reshape(co, k * k * c)

    return _cmajor_pallas(xp, w2.astype(x_cm.dtype),
                          jnp.asarray(masks, x_cm.dtype), k, h, w_dim)
