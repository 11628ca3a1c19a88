"""Max-pool over (T, H, W) with a TPU-fast backward pass.

Why this exists (round 5, VERDICT item 3): the per-fusion closure of the
s3d train step (benchmarks/TPU_STEP_CLOSURE_S3D.json) shows the single
worst fusion in the whole program is `select_and_scatter` — XLA's default
VJP for `reduce_window` max — at **33x its physical byte floor**
(2074 us measured vs 63 us of HBM traffic for the mixed3c 3x3x3 s1
branch pool). select_and_scatter is a sequential window-scan primitive
that maps to neither the MXU nor a wide VPU fusion; every Inception
max-pool in s3d/i3d and every C3D/P3D stage pool pays it.

This module replaces the VJP only. The forward is the same
`lax.reduce_window` max the default path uses (bit-identical eval/serving;
fwd-only jits are untouched). The backward is an equality-mask stencil:

    ties[o]  = sum_d [x_pad[o*s + d] == y[o]]            (k^3-tap stencil)
    grad[j]  = sum_d [x_pad[j] == y_dil[j - d]] * ct_dil[j - d] / ties_dil
                                                          (k^3-tap stencil)

where `_dil` arrays are the output-grid quantities interior-dilated by the
stride onto the padded-input grid (lax.pad with interior padding — free at
fusion time). Both passes are pure elementwise/shift fusions: XLA emits
them as wide VPU loops reading each buffer ~once, so the backward runs at
its byte roofline instead of select_and_scatter's scan.

Semantics vs the default VJP: on TIES the cotangent is split EVENLY among
the tied window elements (the subgradient average). XLA's
select_and_scatter and torch both route it to the first tied element.
Post-ReLU feature maps tie on 0.0 frequently, so full-model grads differ
from the default path in the last bits on tied windows; both are valid
subgradients. Tie-free inputs (e.g. permutation-valued tests) match the
default VJP exactly, including in bf16 (the max is an exact element of the
window, so the equality test is exact in any dtype).

Escape hatch: FVT_MAXPOOL_GRAD=sas in the environment (read at import)
restores the select_and_scatter path globally; `grad='sas'` does it per
call site.
"""

from __future__ import annotations

import functools
import os
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax

Triple = Tuple[int, int, int]
Pads = Tuple[Tuple[int, int], Tuple[int, int], Tuple[int, int]]

# Import-time default so a jitted train step is one program, not a
# per-call branch. 'mask' = stencil VJP; 'sas' = XLA's select_and_scatter.
DEFAULT_GRAD = os.environ.get("FVT_MAXPOOL_GRAD", "mask")


def _reduce_max(x: jax.Array, window: Triple, strides: Triple,
                pads: Pads) -> jax.Array:
    full_window = (1, *window, 1)
    full_strides = (1, *strides, 1)
    full_pads = ((0, 0), *pads, (0, 0))
    # Python-scalar init, NOT a concrete array: jax 0.9's reduce_window VJP
    # pattern-matcher only recognizes the max-pool form with a weak-typed
    # literal init; an array init makes the op non-differentiable under jit
    # (the 'sas' escape hatch would break).
    init = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else int(
        jnp.iinfo(x.dtype).min)
    return lax.reduce_window(x, init, lax.max,
                             full_window, full_strides, full_pads)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _max_pool_mask_grad(x: jax.Array, window: Triple, strides: Triple,
                        pads: Pads) -> jax.Array:
    return _reduce_max(x, window, strides, pads)


def _fwd(x, window, strides, pads):
    y = _reduce_max(x, window, strides, pads)
    return y, (x, y)


def _pad_spatial(x: jax.Array, value, lows, highs, interiors) -> jax.Array:
    cfg = [(0, 0, 0)] + [(lo, hi, it)
                         for lo, hi, it in zip(lows, highs, interiors)] \
        + [(0, 0, 0)]
    return lax.pad(x, jnp.asarray(value, x.dtype), cfg)


def _offsets(window: Triple):
    for dt in range(window[0]):
        for dh in range(window[1]):
            for dw in range(window[2]):
                yield (dt, dh, dw)


def _bwd(window, strides, pads, res, ct):
    x, y = res
    n, _t, _h, _w, c = x.shape
    xsp = x.shape[1:4]
    ysp = y.shape[1:4]
    neg = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else (
        jnp.iinfo(x.dtype).min)

    # Padded input grid (window origin o covers x_pad[o*s : o*s + k]).
    x_pad = _pad_spatial(x, neg, [p[0] for p in pads], [p[1] for p in pads],
                         (0, 0, 0))
    psp = x_pad.shape[1:4]

    def _ostrided(arr, off):
        """arr sliced on the padded grid: start=off, stride=s, len=out."""
        starts = (0, *off, 0)
        limits = (n, *[off[i] + (ysp[i] - 1) * strides[i] + 1
                       for i in range(3)], c)
        return lax.slice(arr, starts, limits, (1, *strides, 1))

    # Pass 1: tie counts per window. Small ints are exact in the compute
    # dtype (k^3 <= 27 << 256), so stay in x.dtype for a single fused pass.
    ties = None
    for off in _offsets(window):
        eq = (_ostrided(x_pad, off) == y).astype(x.dtype)
        ties = eq if ties is None else ties + eq
    share = ct / ties.astype(ct.dtype)

    # Dilate the output-grid arrays onto the padded-input grid, then
    # pre-pad (k-1) low so every shift is a static slice of one buffer.
    span = [(ysp[i] - 1) * strides[i] + 1 for i in range(3)]
    highs = [psp[i] - span[i] for i in range(3)]
    kless = [window[i] - 1 for i in range(3)]
    it = [s - 1 for s in strides]
    y_dil = _pad_spatial(_pad_spatial(y, neg, (0, 0, 0), highs, it),
                         neg, kless, (0, 0, 0), (0, 0, 0))
    s_dil = _pad_spatial(_pad_spatial(share, 0, (0, 0, 0), highs, it),
                         0, kless, (0, 0, 0), (0, 0, 0))

    def _shifted(arr, off):
        """arr[j - off] on the padded grid (static slice of the pre-pad)."""
        starts = (0, *[kless[i] - off[i] for i in range(3)], 0)
        limits = [starts[i] + d for i, d in
                  enumerate((n, *psp, c))]
        return lax.slice(arr, starts, tuple(limits))

    grad_pad = None
    for off in _offsets(window):
        hit = (x_pad == _shifted(y_dil, off)).astype(share.dtype)
        term = hit * _shifted(s_dil, off)
        grad_pad = term if grad_pad is None else grad_pad + term

    lo = [p[0] for p in pads]
    grad = lax.slice(grad_pad, (0, *lo, 0),
                     (n, *[lo[i] + xsp[i] for i in range(3)], c))
    return (grad.astype(x.dtype),)


_max_pool_mask_grad.defvjp(_fwd, _bwd)


def resolve_pads(shape_sp: Sequence[int], window: Triple, strides: Triple,
                 padding) -> Pads:
    """Resolve flax-style padding (string or explicit) to per-dim pads.

    'SAME' is TF-SAME (extra pixel on the high side) — matches both
    flax.linen.max_pool and the i3d reference semantics.
    """
    if isinstance(padding, str):
        p = padding.upper()
        if p == "VALID":
            return ((0, 0), (0, 0), (0, 0))
        if p == "SAME":
            out = []
            for i in range(3):
                o = -(-shape_sp[i] // strides[i])
                pad = max((o - 1) * strides[i] + window[i] - shape_sp[i], 0)
                out.append((pad // 2, pad - pad // 2))
            return tuple(out)
        raise ValueError(f"unknown padding {padding!r}")
    pads = tuple((int(lo), int(hi)) for lo, hi in padding)
    if len(pads) != 3:
        raise ValueError("explicit padding must give (lo, hi) for T, H, W")
    return pads


def max_pool_nthwc(x: jax.Array, window: Triple, strides: Triple | None = None,
                   padding="VALID", grad: str | None = None) -> jax.Array:
    """Max-pool over the (T, H, W) dims of an NTHWC tensor.

    Forward is `lax.reduce_window` max either way; `grad` selects the VJP:
    'mask' (default, TPU-fast stencil) or 'sas' (XLA select_and_scatter).
    """
    window = tuple(window)
    strides = tuple(strides) if strides is not None else window
    pads = resolve_pads(x.shape[1:4], window, strides, padding)
    mode = grad or DEFAULT_GRAD
    if mode == "mask":
        return _max_pool_mask_grad(x, window, strides, pads)
    if mode == "sas":
        return _reduce_max(x, window, strides, pads)
    raise ValueError(f"unknown maxpool grad mode {mode!r}")
