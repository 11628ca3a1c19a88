"""Micro-benchmarks for the temporal (k x 1 x 1) conv — the measured worst
op class in the train step (PERF.md: fwd 36 TF/s, dx 25 TF/s under profiler
attribution, vs a ~110-157 TF/s HBM-bound roofline for these shapes).

Question this answers: is XLA's T-major conv emitter the limit (i.e. can a
Pallas kernel do materially better STANDALONE), or is the op bandwidth-bound
at ~34 TF/s for a reason no kernel can fix? Dedupe-proof protocol throughout
(evolving input chain + two-point slope — see CLAUDE.md).

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
    return (t_long - t_short) / (n_long - n_short)


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

    @jax.jit
    def chained(xi):
        y = xi if fn is None else (fn(xi) if extra is None else
                                   fn(xi, *extra))
        dep = sum(leaf.astype(jnp.float32).sum()
                  for leaf in jax.tree.leaves(y))
        # bounded, genuinely value-evolving perturbation (paranoia vs the
        # axon dispatch dedupe; buffer identity alone should already defeat
        # it, but bench.py's protocol evolves values and we match it)
        return xi + jnp.tanh(dep).astype(xi.dtype) * jnp.asarray(
            1e-2, xi.dtype)

    sec = timeit_chain(lambda c: chained(x0 if c is None else c)) - overhead
    tf = flops / sec / 1e12 if flops else 0.0
    print(f"{name:34s} {sec * 1e3:8.3f} ms   {tf:7.1f} TF/s", flush=True)
    return sec, tf


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

    ovh, _ = bench_op("id (chain+sum overhead)", None, x, 0.0)
    bench_op("xla conv fwd", lambda xi: xla_temporal(xi, w), x, flops,
             overhead=ovh)
    bench_op("pallas v2 fwd", lambda xi: pallas_temporal_v2(xi, w, k), x,
             flops, overhead=ovh)
    # dx == fwd with flipped/transposed weights: same op class; fwd numbers
    # stand in for dx. dw:
    bench_op("xla conv dw", lambda xi: xla_temporal_dw(xi, w, g), x, flops,
             overhead=ovh)
    bench_op("pallas dw", lambda xi: pallas_temporal_dw(xi, g, k), x, flops,
             overhead=ovh)


if __name__ == "__main__":
    main()
