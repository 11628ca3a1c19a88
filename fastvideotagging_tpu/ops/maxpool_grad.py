"""Max-pool over (T, H, W) with a TPU-fast backward pass.

Why this exists (round 5, VERDICT item 3): the per-fusion closure of the
s3d train step (benchmarks/TPU_STEP_CLOSURE_S3D.json) shows the single
worst fusion in the whole program is `select_and_scatter` — XLA's default
VJP for `reduce_window` max — at **33x its physical byte floor**
(2074 us measured vs 63 us of HBM traffic for the mixed3c 3x3x3 s1
branch pool). select_and_scatter is a sequential window-scan primitive
that maps to neither the MXU nor a wide VPU fusion; every Inception
max-pool in s3d/i3d and every C3D/P3D stage pool pays it.

THE SHIPPED FIX IS SEPARABILITY, chosen by step-level A/B on the chip
(benchmarks/MAXPOOL_GRAD_AB.json; protocol per CLAUDE.md): max over a
rectangular k_t x k_h x k_w window separates EXACTLY into three chained
1D pools, so mode 'sep' lowers one 3D reduce_window into per-dim 1D
reduce_windows. Forward values are bit-identical (max is associative);
the backward becomes three 1D select_and_scatters, each scanning a
k-wide window along ONE dim — which XLA executes at a small multiple of
the byte floor instead of the 3D scan's 33x. Measured train step, B=32
16x112x112: s3d 26.37 -> 20.46 ms (+29% clips/s), i3d 31.34 -> 25.17 ms
(+24.5%).

Two rejected alternatives are kept as modes for the record (both
measured, do not re-default them):

* 'mask' — a custom_vjp whose backward is an equality-mask stencil
  (ties count + dilated cotangent gather, k^3 taps each). The hypothesis
  was that two fused elementwise passes beat the scan; MEASURED 2x
  step-NEGATIVE on both Inception models (s3d 57.6 ms, i3d 58.6 ms):
  a fused stencil's shifted reads are not free — the emitter re-reads
  the x-sized operands once per tap, so the pass costs ~k^3 x-sized HBM
  reads (PERF.md dead end #16).
* 'sepmask' — 1D pools with the k-tap stencil VJP; the per-site
  custom_vjp triplication blows the HLO up and the axon remote compiler
  times out (>1200 s) at s3d scale.

Tie semantics: 'sep'/'sas' route the cotangent to the first tied element
per window (XLA select semantics; torch does the same). 'mask'/'sepmask'
split it evenly (subgradient average). Tie-free inputs match exactly in
every mode, including in bf16 (the max is an exact element of the
window, so equality tests are exact in any dtype).

The lowering is PHASE-DEPENDENT: 'sep' is the TRAIN default only. In
eval there is no backward to fix, and the chained 1D windows just add
materialization passes — measured s3d eval-mode A/B: sas 8645 clips/s,
sep 5853 (-32%). So eval keeps the single fused 3D reduce_window
('sas'), values identical either way; call sites pass their `train`
flag. Escape hatches (read at import): FVT_MAXPOOL_GRAD overrides the
train-mode lowering, FVT_MAXPOOL_EVAL the eval-mode one; `grad=` does
it per call site.
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
# per-call branch. Measured on-chip (benchmarks/MAXPOOL_GRAD_AB.json,
# B=32 16x112x112 train step, fresh process per arm):
#   'sep'  s3d 20.46 ms (+29% clips/s vs sas), i3d 25.17 ms (+24.5%)
#   'sas'  s3d 26.37 ms, i3d 31.34 ms  (XLA 3D select_and_scatter bwd)
#   'mask' s3d 57.62 ms, i3d 58.62 ms  (dead end #16: the fused k^3-tap
#          stencil re-reads its x-sized operands once PER TAP)
#   'sepmask' compile timeout >1200 s on the axon compiler (dead).
# Eval mode measured the OPPOSITE way (s3d fwd-only: sas 8645 clips/s,
# sep 5853): no backward to fix, extra passes only — eval stays 'sas'.
DEFAULT_GRAD = os.environ.get("FVT_MAXPOOL_GRAD", "sep")
EVAL_DEFAULT = os.environ.get("FVT_MAXPOOL_EVAL", "sas")


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


def _sep_dims(window: Triple, strides: Triple, pads: Pads):
    """Dims that actually pool, ordered; 1-wide unstrided unpadded dims
    are identity and skipped."""
    return [i for i in range(3)
            if window[i] > 1 or strides[i] > 1 or pads[i] != (0, 0)]


def _axis_spec(i: int, window: Triple, strides: Triple, pads: Pads):
    w = [1, 1, 1]
    s = [1, 1, 1]
    p = [(0, 0)] * 3
    w[i], s[i], p[i] = window[i], strides[i], pads[i]
    return tuple(w), tuple(s), tuple(p)


def max_pool_nthwc(x: jax.Array, window: Triple, strides: Triple | None = None,
                   padding="VALID", grad: str | None = None,
                   train: bool = False) -> jax.Array:
    """Max-pool over the (T, H, W) dims of an NTHWC tensor.

    `grad` selects the lowering (identical forward values in all modes —
    max over a rectangular window separates exactly per dim):
      'sas'     one 3D reduce_window; VJP = XLA's 3D select_and_scatter.
      'mask'    one 3D reduce_window; VJP = k^3-tap equality stencil.
                MEASURED 2x step-NEGATIVE on i3d (PERF.md ROUND-5c): the
                fused stencil re-reads the x-sized buffers once PER TAP.
      'sep'     chain of 1D reduce_windows; VJP = 1D select_and_scatters
                (each scans a 3-wide window along one dim).
      'sepmask' chain of 1D pools each with the k-tap stencil VJP.
    With grad=None the lowering is phase-dependent (module docstring):
    'sep' when train=True, 'sas' in eval.
    """
    window = tuple(window)
    strides = tuple(strides) if strides is not None else window
    pads = resolve_pads(x.shape[1:4], window, strides, padding)
    mode = grad or (DEFAULT_GRAD if train else EVAL_DEFAULT)
    if mode == "mask":
        return _max_pool_mask_grad(x, window, strides, pads)
    if mode == "sas":
        return _reduce_max(x, window, strides, pads)
    if mode in ("sep", "sepmask"):
        for i in _sep_dims(window, strides, pads):
            w, s, p = _axis_spec(i, window, strides, pads)
            x = (_max_pool_mask_grad(x, w, s, p) if mode == "sepmask"
                 else _reduce_max(x, w, s, p))
        return x
    raise ValueError(f"unknown maxpool grad mode {mode!r}")
