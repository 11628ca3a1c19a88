"""Fusion ladder: where does in-step conv time actually inflate?

Protocol (v3, carry-through): every rung is a shape-preserving function
(B,T,H,W,128) -> (B,T,H,W,128); the chain carries the rung's OWN full
output as the next input. This forces the output to materialize at each
dispatch boundary (no reduction the compiler can fuse away, no synthetic
dependency pass to mis-subtract) and defeats the axon dispatch dedupe
(fresh buffer + evolving values each step). Weights are variance-preserving
so the chain neither explodes nor denormalizes. Earlier protocol versions
measured impossible rates (a "bare conv" at 496 TF/s): a single-element
dependency lets XLA slice the conv, and a fused-sum dependency never
materializes the output — both lessons recorded here.

Rungs (the `_tpu` stage-1 geometry, the shapes PERF.md attributes worst
in-step rates to):

  t0   temporal conv, bare
  t1   + affine/relu in f32-round-trip form (flax-BN apply style)
  t1b  + affine/relu computed in bf16
  t2   + full train-time BatchNorm (f32 batch stats) + relu
  s0   spatial 1x3x3 conv, bare
  b0   half-block fwd: spatial > BN > relu > temporal  (train stats)
  b1   half-block fwd+bwd (dx carried; dw forced live as extra outputs)
  b2   b1 with frozen norm (affine only)

Usage: python benchmarks/fusion_ladder.py
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, os.path.dirname(__file__))
from kernel_micro import timeit_chain  # noqa: E402

B, T, H, W, C = 32, 16, 56, 56, 128
K = 3


def temporal(x, w):  # (B,T,H,W,C), (k,C,Co)
    p = w.shape[0] // 2
    return lax.conv_general_dilated(
        x, w[:, None, None], window_strides=(1, 1, 1),
        padding=((p, p), (0, 0), (0, 0)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def spatial(x, w):  # (B,T,H,W,C), (k,k,C,Co)
    p = w.shape[0] // 2
    return lax.conv_general_dilated(
        x, w[None], window_strides=(1, 1, 1),
        padding=((0, 0), (p, p), (p, p)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def bn_train(x, gamma, beta):
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=(0, 1, 2, 3))
    var = ((xf - mean) ** 2).mean(axis=(0, 1, 2, 3))
    y = (xf - mean) * lax.rsqrt(var + 1e-5) * gamma + beta
    return y.astype(x.dtype)


def main():
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((B, T, H, W, C)), jnp.bfloat16)
    # variance-preserving: fan-in 3*C (temporal), 9*C (spatial)
    wt = jnp.asarray(rng.standard_normal((K, C, C)) / np.sqrt(3 * C),
                     jnp.bfloat16)
    ws = jnp.asarray(rng.standard_normal((K, K, C, C)) / np.sqrt(9 * C),
                     jnp.bfloat16)
    gamma = jnp.ones((C,), jnp.float32)
    beta = jnp.zeros((C,), jnp.float32)
    gb, bb = gamma.astype(jnp.bfloat16), beta.astype(jnp.bfloat16)

    conv_t_fl = 2.0 * B * T * H * W * K * C * C
    conv_s_fl = 2.0 * B * T * H * W * K * K * C * C

    def bench(name, fn, flops):
        jfn = jax.jit(fn)

        def step_once(carry):
            y = jfn(x0 if carry is None else carry)
            return y[0] if isinstance(y, tuple) else y

        sec = timeit_chain(step_once)
        print(f"{name:46s} {sec * 1e3:8.3f} ms {flops / sec / 1e12:7.1f} TF/s",
              flush=True)
        return sec

    t0 = bench("t0 temporal bare", lambda xi: temporal(xi, wt), conv_t_fl)
    bench("t1 temporal + affine/relu (f32 round-trip)",
          lambda xi: jax.nn.relu(temporal(xi, wt).astype(jnp.float32) * gamma
                                 + beta).astype(jnp.bfloat16), conv_t_fl)
    bench("t1b temporal + affine/relu (bf16)",
          lambda xi: jax.nn.relu(temporal(xi, wt) * gb + bb), conv_t_fl)
    bench("t2 temporal + train BN + relu",
          lambda xi: jax.nn.relu(bn_train(temporal(xi, wt), gamma, beta)),
          conv_t_fl)
    s0 = bench("s0 spatial bare", lambda xi: spatial(xi, ws), conv_s_fl)

    def half_block(xi, frozen=False):
        m = spatial(xi, ws)
        m = (jax.nn.relu(m * gb + bb) if frozen
             else jax.nn.relu(bn_train(m, gamma, beta)))
        return temporal(m, wt)

    blk_fl = conv_s_fl + conv_t_fl
    b0 = bench("b0 half-block fwd (train BN)", half_block, blk_fl)
    print(f"   b0 vs s0+t0: {b0 * 1e3:.2f} vs {(s0 + t0) * 1e3:.2f} ms")

    def fwdbwd(frozen):
        def f(xi):
            def loss(z, ws_, wt_):
                m = spatial(z, ws_)
                m = (jax.nn.relu(m * gb + bb) if frozen
                     else jax.nn.relu(bn_train(m, gamma, beta)))
                # sum-of-squares so the output cotangent is the output
                # itself, not a constant-foldable all-ones tensor
                y = temporal(m, wt_).astype(jnp.float32)
                return 0.5 * (y * y).sum()

            dx, dws, dwt = jax.grad(loss, argnums=(0, 1, 2))(xi, ws, wt)
            return dx.astype(jnp.bfloat16), dws, dwt
        return f

    b1 = bench("b1 half-block fwd+bwd (train BN)", fwdbwd(False), 3 * blk_fl)
    print(f"   b1 vs 3(s0+t0): {b1 * 1e3:.2f} vs {3 * (s0 + t0) * 1e3:.2f} ms")
    b2 = bench("b2 half-block fwd+bwd (frozen)", fwdbwd(True), 3 * blk_fl)
    print(f"   b2 vs 3(s0+t0): {b2 * 1e3:.2f} vs {3 * (s0 + t0) * 1e3:.2f} ms")


if __name__ == "__main__":
    main()
