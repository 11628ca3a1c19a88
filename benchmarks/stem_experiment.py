"""Stem conv experiment: 7x7 stride-2 conv on C=3 input as im2col matmul.

The stem spatial conv is the most lane-starved op in the network (C_in=3 on
a 128-lane MXU: PERF.md attributes 12-21 TF/s to the stem fusions). im2col
repacks the 7*7*3=147-tap window into the CONTRACTION dim of one matmul
(147 -> 115% of one 128 lane tile), trading a 49-slice patch materialization
(~12x the input bytes) for full MXU utilization. dx is never needed (input
layer), so training pays fwd + dw only.

Protocol: weight-chaining (w' = w - 1e-6 * dw) — input buffer constant,
weights evolve, so every dispatch differs and the full dw must materialize.

Usage: python benchmarks/stem_experiment.py [--stem-mid 128]
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

B, T, H, W = 32, 16, 112, 112
K, S, P = 7, 2, 3
HO = WO = 56


def conv_stem(x, w):  # x: (B,T,112,112,3); w: (K,K,3,Co)
    return lax.conv_general_dilated(
        x, w[None], window_strides=(1, S, S),
        padding=((0, 0), (P, P), (P, P)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def im2col_stem(x, w):
    """Same conv as one (N, 147) @ (147, Co) matmul over extracted patches."""
    co = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (0, 0), (P, P), (P, P), (0, 0)))
    taps = [xp[:, :, dh: dh + H: S, dw: dw + W: S, :]
            for dh in range(K) for dw in range(K)]
    patches = jnp.concatenate(taps, axis=-1)  # (B,T,56,56,147)
    w2d = w.transpose(0, 1, 2, 3).reshape(K * K * 3, co)
    y = jnp.dot(patches.reshape(-1, K * K * 3), w2d,
                preferred_element_type=jnp.float32)
    return y.reshape(B, T, HO, WO, co).astype(x.dtype)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--stem-mid", type=int, default=128)
    args = ap.parse_args(argv)
    co = args.stem_mid

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T, H, W, 3)), jnp.bfloat16)
    w0 = jnp.asarray(rng.standard_normal((K, K, 3, co)) / np.sqrt(147),
                     jnp.bfloat16)
    flops = 2.0 * B * T * HO * WO * K * K * 3 * co

    # parity
    y1 = conv_stem(x, w0)
    y2 = im2col_stem(x, w0)
    err = float(jnp.max(jnp.abs(y1.astype(jnp.float32)
                                - y2.astype(jnp.float32))))
    print(f"fwd parity max err = {err:.5f} (bf16 inputs)")

    def bench(name, f):
        def loss(w_):
            y = f(x, w_).astype(jnp.float32)
            return 0.5 * (y * y).sum()

        @jax.jit
        def step(w_):
            dw = jax.grad(loss)(w_)
            return w_ - (1e-6 * dw).astype(w_.dtype)

        def sync(w_):
            float(w_[0, 0, 0, 0])

        for _ in range(2):
            sync(step(w0))

        def run(n):
            w_ = step(w0)
            sync(w_)
            t0 = time.perf_counter()
            for _ in range(n):
                w_ = step(w_)
            sync(w_)
            return time.perf_counter() - t0

        t4, t16 = run(4), run(16)
        sec = (t16 - t4) / 12
        print(f"{name:28s} {sec * 1e3:8.3f} ms  "
              f"{2 * flops / sec / 1e12:6.1f} TF/s (fwd+dw)", flush=True)

    bench("xla conv stem fwd+dw", conv_stem)
    bench("im2col stem fwd+dw", im2col_stem)


if __name__ == "__main__":
    main()
