"""Temporal (sequence) sharding for long clips — SURVEY.md §6.7's stretch.

The convnet analog of ring-attention/context parallelism: split the clip's
time axis T across a mesh axis and run temporal convolutions with a
(k-1)/2-frame **halo exchange** between neighboring shards via
``lax.ppermute`` over ICI. Per-chip memory becomes O(T / n_shards); the only
communication per temporal conv is 2 * halo frames with ring neighbors.

Not required by any BASELINE config (the reference handles long-form video by
dense clip sampling, preserved in evaluation/tagger.py); provided as the
TPU-native building block for whole-clip processing of very long clips.

Usage (inside shard_map, or via ``temporal_conv_time_sharded``):

    y = halo_temporal_conv(x_local, w, axis_name="time")
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map


def halo_temporal_conv(x_local: jax.Array, w: jax.Array,
                       axis_name: str, stride: int = 1) -> jax.Array:
    """k x 1 x 1 symmetric-padded conv over a time-sharded clip, inside
    shard_map.

    x_local: (B, T_local, H, W, C) — this shard's slice of the clip.
    w: (k, C, Co), k odd. Returns (B, T_local // stride, H, W, Co).

    Strided form (stage entries): requires T_local % stride == 0, so every
    shard owns a whole number of output frames and the sampling phase is
    globally aligned — the local VALID-with-stride conv over the halo'd slab
    then reproduces the unsharded symmetric conv exactly (window m*stride ..
    m*stride+k-1 in slab coordinates == the global window centered at
    shard_start + m*stride).
    """
    k = w.shape[0]
    p = k // 2
    if stride > 1 and x_local.shape[1] % stride != 0:
        raise ValueError(
            f"stride={stride} must divide T_local={x_local.shape[1]}")
    if p == 0:
        return lax.conv_general_dilated(
            x_local, w[:, None, None], (stride, 1, 1), "VALID",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    if x_local.shape[1] < p:
        raise ValueError(
            f"T_local={x_local.shape[1]} must be >= halo {p}; use fewer shards")

    # Each shard sends its tail right and its head left (ring ppermute);
    # ring wraparound at the clip boundaries is masked to zero to reproduce
    # the symmetric zero-padding semantics exactly.
    send_right = [(j, (j + 1) % n) for j in range(n)]
    send_left = [(j, (j - 1) % n) for j in range(n)]
    from_left = lax.ppermute(x_local[:, -p:], axis_name, perm=send_right)
    from_right = lax.ppermute(x_local[:, :p], axis_name, perm=send_left)
    from_left = jnp.where(idx == 0, jnp.zeros_like(from_left), from_left)
    from_right = jnp.where(idx == n - 1, jnp.zeros_like(from_right), from_right)

    x_ext = jnp.concatenate([from_left, x_local, from_right], axis=1)
    return lax.conv_general_dilated(
        x_ext, w[:, None, None], (stride, 1, 1), "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def temporal_conv_time_sharded(x: jax.Array, w: jax.Array, mesh: Mesh,
                               time_axis: str) -> jax.Array:
    """Whole-array wrapper: shards T over ``time_axis`` and runs the halo conv.

    x: (B, T, H, W, C) with T divisible by the axis size.
    """
    spec = P(None, time_axis)
    fn = shard_map(
        functools.partial(halo_temporal_conv, axis_name=time_axis),
        mesh=mesh,
        in_specs=(spec, P()),
        out_specs=spec,
    )
    return fn(x, w)
