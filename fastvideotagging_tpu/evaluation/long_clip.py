"""Whole-clip sequence-parallel inference for very long clips (SURVEY.md
§6.7 — the convnet analog of ring attention / context parallelism).

The reference handles long-form video OUTSIDE the model (dense clip sampling
+ score aggregation, preserved in evaluation/tagger.py). This module is the
TPU-native alternative it could never have: run ONE clip of arbitrary length
through the backbone with the time axis sharded across the mesh — per-chip
activation memory is O(T / n_devices), temporal convolutions exchange
(k-1)/2-frame halos with ring neighbors over ICI (lax.ppermute), spatial
convs/norms stay local, and the pooled features are classified once.

Exactness: the result equals the unsharded forward bit-for-bit in f32 (the
halo conv reproduces symmetric padding at shard boundaries; tests assert
equality at 1e-5). Eval mode only — training-mode BN would need stats sync
over the time axis, which dense-clip training makes unnecessary.

Constraints (r2plus1d family): T divisible by n_shards, and T_local
divisible by the total temporal stride (8 for the 4-stage layout) so every
stage keeps whole frames per shard — i.e. T >= 8 * n_shards.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from fastvideotagging_tpu.models import heads

TIME_AXIS = "time"


def make_time_mesh(n_shards: int | None = None) -> Mesh:
    devices = jax.devices()
    n = n_shards or len(devices)
    return Mesh(np.asarray(devices[:n]), (TIME_AXIS,))


def score_long_clip(model_factory, variables: dict, clips: jax.Array,
                    mesh: Mesh, multilabel: bool = False,
                    time_axis: str = TIME_AXIS) -> jax.Array:
    """Scores for (B, T, H, W, 3) preprocessed clips with T sharded.

    model_factory(time_axis=...) must build the backbone (e.g. via
    zoo.get_model(..., time_axis=...)); ``variables`` are the normal trained
    variables — the sharded and unsharded models share one parameter tree.
    """
    n = mesh.shape[time_axis]
    t = clips.shape[1]
    total_stride = 8  # r2plus1d 4-stage temporal downsampling
    if t % n or (t // n) % total_stride:
        raise ValueError(
            f"T={t} must be divisible by n_shards={n} and T/n by "
            f"{total_stride} (whole frames per shard at every stage)")
    sharded = model_factory(time_axis=time_axis)

    # ``variables`` rides as a TRACED, replicated shard_map argument — a jit
    # closure would hoist the full parameter tree into the lowered program
    # as constants, which crashes the remote compile service for real-sized
    # models (CLAUDE.md round-3 trap: HTTP 413 on closure-captured tensors).
    def local_features(vs, xl):
        feats = sharded.apply(vs, xl, train=False, features_only=True)
        # local sum over (T_local', H', W') + psum over the time axis ==
        # global average pool, f32 (matches layers.global_avg_pool_3d)
        s = jnp.sum(feats.astype(jnp.float32), axis=(1, 2, 3))
        s = jax.lax.psum(s, time_axis)
        return s

    var_specs = jax.tree.map(lambda _: P(), variables)
    pooled_sum = jax.jit(shard_map(
        local_features, mesh=mesh,
        in_specs=(var_specs, P(None, time_axis)), out_specs=P(),
    ))(variables, clips)

    def halve(v, times):  # stride-2 symmetric conv: out = ceil(in / 2)
        for _ in range(times):
            v = -(-v // 2)
        return v

    t_out = t // total_stride
    h_out = halve(clips.shape[2], 4)  # stem + 3 stage entries
    w_out = halve(clips.shape[3], 4)
    pooled = (pooled_sum / (t_out * h_out * w_out)).astype(jnp.float32)

    fc = variables["params"]["fc"]
    logits = pooled @ fc["kernel"].astype(jnp.float32) + fc["bias"]
    return heads.predict_scores(logits, multilabel)
