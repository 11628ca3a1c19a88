"""Micro-benchmarks for the temporal (k x 1 x 1) conv.

ANSWERED (round 3, 2026-08-17 — full analysis in PERF.md top section):
XLA's temporal fwd/dx/dw all run at 85-100% of the HBM byte roofline
standalone; the round-2 "emitter weakness" numbers were protocol variance
and fusion-attribution artifacts. The v3/v3p kernels here (no pad, no
halo, divisor tiles — 2-4x over round 2's v2, dw ties XLA) are the
checked-in evidence closing the whole-block-kernel plan: there is no
primitive-level headroom for a custom call to recover.

Dedupe-proof protocol throughout (evolving input chain + two-point slope
+ carry-finiteness guard — see CLAUDE.md). RAW times are the trustworthy
cross-variant comparison; the id-chain overhead subtraction is only a
rough op-rate guide (the estimate itself swings ~2x between runs).

Usage:  python benchmarks/kernel_micro.py [--shape tpu1|faithful1|tpu2]
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# The production tile picker — the benchmark must measure the exact tiles
# the kernels='pallas' path runs with.
from fastvideotagging_tpu.ops.conv2plus1d import _pick_tile as _divisor_tile


def _sync(x):
    leaf = jax.tree.leaves(x)[0]
    float(leaf[(0,) * leaf.ndim])


def timeit_chain(step_once, warmup=2, n_short=4, n_long=16):
    def run(n):
        carry = step_once(None)
        _sync(carry)
        start = time.perf_counter()
        for _ in range(n):
            carry = step_once(carry)
        _sync(carry)
        return time.perf_counter() - start

    for _ in range(warmup):
        _sync(step_once(None))
    t_short = run(n_short)
    t_long = run(n_long)
    slope = (t_long - t_short) / (n_long - n_short)
    return slope if slope > 0 else float("nan")


# --------------------------------------------------------------------------
# Reference: XLA native conv over T (NTHWC, window on the major T dim)
# --------------------------------------------------------------------------


def xla_temporal(x, w):  # x: (B,T,S,C) w: (k,C,Co)
    p = w.shape[0] // 2
    return lax.conv_general_dilated(
        x[:, :, :, None, :], w[:, None, None],
        window_strides=(1, 1, 1), padding=((p, p), (0, 0), (0, 0)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))[:, :, :, 0, :]


# --------------------------------------------------------------------------
# Pallas v2: tap-accumulate matmuls, no (t*s, k*c) patch concat.
# Grid over (B, S-tiles); each step streams a (T+2p, tile_s, C) slab and
# does k accumulated (T*tile_s, C) @ (C, Co) matmuls.
# --------------------------------------------------------------------------


def _v2_kernel(x_ref, w_ref, out_ref, *, k: int, t: int, tile_s: int):
    slab = x_ref[0]  # (t + k - 1, tile_s, C)
    acc = jnp.zeros((t * tile_s, out_ref.shape[-1]), jnp.float32)
    for dt in range(k):
        tap = slab[dt: dt + t].reshape(t * tile_s, -1)
        acc = acc + jnp.dot(tap, w_ref[dt],
                            preferred_element_type=jnp.float32)
    out_ref[0] = acc.reshape(t, tile_s, -1).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("k", "tile_s"))
def pallas_temporal_v2(x, w, k, tile_s=512):
    b, t, s, c = x.shape
    co = w.shape[-1]
    p = k // 2
    xp = jnp.pad(x, ((0, 0), (p, p), (0, 0), (0, 0)))
    while s % tile_s:
        tile_s //= 2
    return pl.pallas_call(
        functools.partial(_v2_kernel, k=k, t=t, tile_s=tile_s),
        grid=(b, s // tile_s),
        in_specs=[
            pl.BlockSpec((1, t + 2 * p, tile_s, c), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, c, co), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t, tile_s, co), lambda i, j: (i, 0, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t, s, co), x.dtype),
        interpret=jax.default_backend() != "tpu",
    )(xp, w)


# --------------------------------------------------------------------------
# Pallas v3 (round 3, the DECISIVE attempt — VERDICT r2 item 1): the v2
# autopsy found three self-inflicted losses, none of them emitter quality:
#   1. jnp.pad before the kernel = a full read+write of the padded tensor
#      (~1.05 ms at this geometry — as large as the whole byte floor);
#   2. tile_s picked by halving (3136 -> 64) -> 1568 tiny grid steps of
#      per-step overhead instead of 224 large ones (3136 = 448 * 7);
#   3. a T-halo'd input block (T+2p rows) although the temporal conv is
#      POINTWISE in S — no inter-block halo exists at all; T boundaries
#      are handled by shifted row-slices inside the block.
# v3: no pad, no halo, divisor tiles, tap-shifted f32 accumulation. The
# T-axis shift by `off` is a row shift by off*tile_s in the (T*tile_s, C)
# flattening, so every slice is static and tile-aligned.
# --------------------------------------------------------------------------


def _v3_kernel(x_ref, w_ref, out_ref, acc_ref, *, k: int, t: int,
               tile_s: int):
    c = x_ref.shape[-1]
    co = out_ref.shape[-1]
    p = k // 2
    flat = x_ref[0].reshape(t * tile_s, c)
    # center tap covers every row: write it first (initializes acc), then
    # accumulate the shifted taps in place on the f32 VMEM scratch
    acc_ref[:] = jnp.dot(flat, w_ref[p], preferred_element_type=jnp.float32)
    for dt in range(k):
        off = dt - p  # input row t+off contributes to output row t
        if off == 0:
            continue
        lo_out = max(0, -off) * tile_s
        hi_out = (t - max(0, off)) * tile_s
        lo_in = max(0, off) * tile_s
        contrib = jnp.dot(flat[lo_in : lo_in + (hi_out - lo_out)],
                          w_ref[dt], preferred_element_type=jnp.float32)
        acc_ref[lo_out:hi_out, :] += contrib
    out_ref[0] = acc_ref[:].reshape(t, tile_s, co).astype(out_ref.dtype)




@functools.partial(jax.jit, static_argnames=("k", "max_tile"))
def pallas_temporal_v3(x, w, k, max_tile=448):
    b, t, s, c = x.shape
    co = w.shape[-1]
    tile_s = _divisor_tile(s, max_tile)
    return pl.pallas_call(
        functools.partial(_v3_kernel, k=k, t=t, tile_s=tile_s),
        grid=(b, s // tile_s),
        in_specs=[
            pl.BlockSpec((1, t, tile_s, c), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, c, co), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t, tile_s, co), lambda i, j: (i, 0, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t, s, co), x.dtype),
        scratch_shapes=[pltpu.VMEM((t * tile_s, co), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * t * s * k * c * co,
            bytes_accessed=b * t * s * (c + co) * 2,
            transcendentals=0),
        interpret=jax.default_backend() != "tpu",
    )(x, w)


def _dw_v3_kernel(x_ref, g_ref, dw_ref, *, k: int, t: int, tile_s: int):
    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _init():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    c = x_ref.shape[-1]
    p = k // 2
    xf = x_ref[0].reshape(t * tile_s, c)
    gf = g_ref[0].reshape(t * tile_s, -1)
    for dt in range(k):
        off = dt - p
        lo_out = max(0, -off) * tile_s
        hi_out = (t - max(0, off)) * tile_s
        lo_in = max(0, off) * tile_s
        dw_ref[dt] += lax.dot_general(
            xf[lo_in : lo_in + (hi_out - lo_out)], gf[lo_out:hi_out],
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("k", "max_tile"))
def pallas_temporal_dw_v3(x, g, k, max_tile=448):
    b, t, s, c = x.shape
    co = g.shape[-1]
    tile_s = _divisor_tile(s, max_tile)
    return pl.pallas_call(
        functools.partial(_dw_v3_kernel, k=k, t=t, tile_s=tile_s),
        grid=(b, s // tile_s),
        in_specs=[
            pl.BlockSpec((1, t, tile_s, c), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, tile_s, co), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k, c, co), lambda i, j: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k, c, co), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * t * s * k * c * co,
            bytes_accessed=b * t * s * (c + co) * 2,
            transcendentals=0),
        interpret=jax.default_backend() != "tpu",
    )(x, g)


def _v3p_kernel(x_ref, w_ref, out_ref, *, k: int, t: int, tile_s: int):
    """Packed-tap variant: one (t*tile_s, k*C) @ (k*C, Co) matmul — the MXU
    accumulates across taps internally, no f32 scratch RMW traffic."""
    c = x_ref.shape[-1]
    co = out_ref.shape[-1]
    p = k // 2
    flat = x_ref[0].reshape(t * tile_s, c)
    zrow = jnp.zeros((p * tile_s, c), flat.dtype)
    padded = jnp.concatenate([zrow, flat, zrow], axis=0)
    taps = [padded[dt * tile_s : (dt + t) * tile_s] for dt in range(k)]
    patches = jnp.concatenate(taps, axis=-1)  # (t*tile_s, k*C)
    acc = jnp.dot(patches, w_ref[:].reshape(k * c, co),
                  preferred_element_type=jnp.float32)
    out_ref[0] = acc.reshape(t, tile_s, co).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("k", "max_tile"))
def pallas_temporal_v3p(x, w, k, max_tile=448):
    b, t, s, c = x.shape
    co = w.shape[-1]
    tile_s = _divisor_tile(s, max_tile)
    # tap order in the packed contraction: input row t+dt-p multiplies
    # w[dt] — w already (k, C, Co), reshape keeps dt-major order
    return pl.pallas_call(
        functools.partial(_v3p_kernel, k=k, t=t, tile_s=tile_s),
        grid=(b, s // tile_s),
        in_specs=[
            pl.BlockSpec((1, t, tile_s, c), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, c, co), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t, tile_s, co), lambda i, j: (i, 0, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t, s, co), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * t * s * k * c * co,
            bytes_accessed=b * t * s * (c + co) * 2,
            transcendentals=0),
        interpret=jax.default_backend() != "tpu",
    )(x, w)


def pallas_temporal_dx_v3(g, w, k, max_tile=448):
    """dx of the stride-1 SAME temporal conv = same conv with time-flipped,
    io-transposed weights — the v3 kernel verbatim."""
    w_t = jnp.flip(w, axis=0).transpose(0, 2, 1)
    return pallas_temporal_v3(g, w_t, k, max_tile=max_tile)


# --------------------------------------------------------------------------
# Pallas dw: accumulate dw[k, C, Co] over the grid in an f32 output block
# (TPU grid is sequential -> accumulation into the same out block is safe).
# Avoids the f32 materialization of the whole activation tensor that the
# round-1 _temporal_dw paid.
# --------------------------------------------------------------------------


def _dw_kernel(x_ref, g_ref, dw_ref, *, k: int, t: int, tile_s: int):
    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _init():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    slab = x_ref[0]            # (t + k - 1, tile_s, C)
    g = g_ref[0].reshape(t * tile_s, -1)  # (t*tile_s, Co)
    for dt in range(k):
        tap = slab[dt: dt + t].reshape(t * tile_s, -1)  # (t*tile_s, C)
        dw_ref[dt] += lax.dot_general(
            tap, g, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("k", "tile_s"))
def pallas_temporal_dw(x, g, k, tile_s=512):
    b, t, s, c = x.shape
    co = g.shape[-1]
    p = k // 2
    xp = jnp.pad(x, ((0, 0), (p, p), (0, 0), (0, 0)))
    while s % tile_s:
        tile_s //= 2
    return pl.pallas_call(
        functools.partial(_dw_kernel, k=k, t=t, tile_s=tile_s),
        grid=(b, s // tile_s),
        in_specs=[
            pl.BlockSpec((1, t + 2 * p, tile_s, c), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, tile_s, co), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k, c, co), lambda i, j: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k, c, co), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(xp, g)


def xla_temporal_dw(x, w, g):
    _, vjp = jax.vjp(lambda w_: xla_temporal(x, w_), w)
    return vjp(g)[0]


def xla_temporal_dx(g, w):
    """dx expressed directly as the flipped/io-transposed forward conv.

    NOT via jax.vjp: the vjp-form conv-transpose HLO reproducibly crashes
    this runtime's remote compile service ("Broken pipe" at
    /remote_compile, 2/2 attempts 2026-08-17) — and PERF.md dead end 4
    showed XLA canonicalizes the two forms identically anyway."""
    w_t = jnp.flip(w, axis=0).transpose(0, 2, 1)
    return xla_temporal(g, w_t)


SHAPES = {
    # (B, T, S, Cin, Cout): _tpu stage1 (full lanes), faithful stage1,
    # _tpu stage2 (after stride-2: T=8, S=28*28).
    "tpu1": (32, 16, 56 * 56, 128, 128),
    "faithful1": (32, 16, 56 * 56, 144, 64),
    "tpu2": (32, 8, 28 * 28, 256, 128),
}


def bench_op(name, fn, x0, flops, extra=None, overhead=0.0):
    """Time fn(x) with an evolving-input chain; returns (sec, tf/s).

    The dependency must consume the FULL output: a single-element dep lets
    XLA slice the computation away (measured: a 'bare conv' at 496 TF/s).
    The full-sum dep costs one extra pass over the output; measure it with
    an identity rung (fn=None) and pass it as `overhead` to subtract.
    """

    extra = () if extra is None else tuple(extra)

    @jax.jit
    def chained(xi, *extra_args):
        # extra tensors ride as TRACED jit arguments — closure capture
        # would embed them as constants in the remote-compile request
        # (411 MB gradient -> HTTP 413, service crash)
        y = xi if fn is None else fn(xi, *extra_args)
        dep = sum(leaf.astype(jnp.float32).sum()
                  for leaf in jax.tree.leaves(y))
        # bounded, genuinely value-evolving perturbation (paranoia vs the
        # axon dispatch dedupe; buffer identity alone should already defeat
        # it, but bench.py's protocol evolves values and we match it)
        return xi + jnp.tanh(dep).astype(xi.dtype) * jnp.asarray(
            1e-2, xi.dtype)

    # carry-health guard: a NaN/Inf chain converges to constant content and
    # trips the runtime's CONTENT dedupe -> impossible TF/s (measured: a
    # non-finite variant "ran" at 879 TF/s, 5.6x the byte bound)
    probe = chained(chained(chained(x0, *extra), *extra), *extra)
    finite = bool(jnp.isfinite(probe.astype(jnp.float32)).all())
    slopes = [timeit_chain(
        lambda c: chained(x0 if c is None else c, *extra))
        for _ in range(3)]
    positive = [s for s in slopes if s > 0]  # NaN-safe: tunnel hiccups can
    if not positive:                         # produce negative slopes
        print(f"{name:34s} UNMEASURABLE (slopes {slopes})", flush=True)
        return float("nan"), 0.0
    raw = min(positive)
    sec = raw - overhead
    tf = flops / sec / 1e12 if flops and sec > 0 else 0.0
    flag = "" if finite else "   [NON-FINITE CARRY — number invalid]"
    # RAW is the trustworthy cross-variant comparison: the id-chain
    # overhead estimate itself swings ~2x between runs (0.9 vs 1.9 ms
    # measured same-day), and XLA fuses the chain into native ops but not
    # into custom calls, so the subtraction is only a rough op-rate guide.
    print(f"{name:34s} raw {raw * 1e3:8.3f} ms   net {sec * 1e3:8.3f} ms "
          f"  {tf:7.1f} TF/s{flag}", flush=True)
    return raw, tf


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", default="tpu1", choices=sorted(SHAPES))
    ap.add_argument("--k", type=int, default=3)
    args = ap.parse_args(argv)
    b, t, s, c, co = SHAPES[args.shape]
    k = args.k
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, t, s, c)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((k, c, co)) * 0.05, jnp.bfloat16)
    g = jnp.asarray(rng.standard_normal((b, t, s, co)), jnp.bfloat16)

    flops = 2.0 * b * t * s * k * c * co
    bytes_min = b * t * s * (c + co) * 2
    bw_cap = 819e9  # v5e HBM
    print(f"shape={args.shape} B={b} T={t} S={s} C={c}->{co} k={k}")
    print(f"flops/op = {flops / 1e9:.1f} GFLOP, min bytes = "
          f"{bytes_min / 1e6:.0f} MB, HBM-bound cap = "
          f"{flops / (bytes_min / bw_cap) / 1e12:.0f} TF/s\n")

    # parity first
    y_ref = xla_temporal(x.reshape(b, t, s, 1, c).reshape(b, t, s, c), w)
    y_v2 = pallas_temporal_v2(x, w, k)
    err = float(jnp.max(jnp.abs(y_ref.astype(jnp.float32)
                                - y_v2.astype(jnp.float32))))
    print(f"fwd parity |xla - pallas_v2| max = {err:.4f}")
    dw_ref = xla_temporal_dw(x, w, g)
    dw_p = pallas_temporal_dw(x, g, k)
    errw = float(jnp.max(jnp.abs(dw_ref.astype(jnp.float32) - dw_p))
                 / (jnp.max(jnp.abs(dw_ref)) + 1e-9))
    print(f"dw parity rel err = {errw:.4f}\n")

    # v3 parity (fwd, dx, dw) before any timing
    y_v3 = pallas_temporal_v3(x, w, k)
    err3 = float(jnp.max(jnp.abs(y_ref.astype(jnp.float32)
                                 - y_v3.astype(jnp.float32))))
    print(f"fwd parity |xla - pallas_v3| max = {err3:.4f}")
    dx_ref = xla_temporal_dx(g, w)  # direct form; vjp-form crashes the
    dx_v3 = pallas_temporal_dx_v3(g, w, k)  # remote compiler (see above)
    errdx = float(jnp.max(jnp.abs(dx_ref.astype(jnp.float32)
                                  - dx_v3.astype(jnp.float32))))
    dw_v3 = pallas_temporal_dw_v3(x, g, k)
    errw3 = float(jnp.max(jnp.abs(dw_ref.astype(jnp.float32) - dw_v3))
                  / (jnp.max(jnp.abs(dw_ref)) + 1e-9))
    print(f"dx parity |xla - pallas_v3| max = {errdx:.4f}; "
          f"dw_v3 rel err = {errw3:.4f}\n")

    ovh, _ = bench_op("id (chain+sum overhead)", None, x, 0.0)
    bench_op("xla conv fwd", lambda xi: xla_temporal(xi, w), x, flops,
             overhead=ovh)
    bench_op("pallas v2 fwd", lambda xi: pallas_temporal_v2(xi, w, k), x,
             flops, overhead=ovh)
    for mt in (448, 224):
        bench_op(f"pallas v3 fwd tile<={mt}",
                 lambda xi, mt=mt: pallas_temporal_v3(xi, w, k, max_tile=mt),
                 x, flops, overhead=ovh)
        bench_op(f"pallas v3p fwd tile<={mt}",
                 lambda xi, mt=mt: pallas_temporal_v3p(xi, w, k, max_tile=mt),
                 x, flops, overhead=ovh)
    bench_op("pallas v3 dx", lambda xi: pallas_temporal_dx_v3(xi, w, k), x,
             flops, overhead=ovh)
    bench_op("xla conv dx (direct form)",
             lambda xi: xla_temporal_dx(xi, w), x, flops, overhead=ovh)
    # dw variants: g MUST be a traced argument (extra=...), not a closure
    # capture — captured it becomes a 411 MB constant in the compile
    # request and kills the remote compile service (HTTP 413 / broken
    # pipe, reproduced 3/3 on 2026-08-17)
    bench_op("xla conv dw", lambda xi, gg: xla_temporal_dw(xi, w, gg), x,
             flops, extra=(g,), overhead=ovh)
    bench_op("pallas dw v2", lambda xi, gg: pallas_temporal_dw(xi, gg, k), x,
             flops, extra=(g,), overhead=ovh)
    bench_op("pallas dw v3", lambda xi, gg: pallas_temporal_dw_v3(xi, gg, k),
             x, flops, extra=(g,), overhead=ovh)


if __name__ == "__main__":
    main()
