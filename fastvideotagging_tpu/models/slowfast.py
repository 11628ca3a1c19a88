"""SlowFast-style dual-pathway video network on the R(2+1)D substrate
([B:11] "SlowFast-style dual-pathway stretch config with conv3d
channel-sharded over ICI"; pathway design after Feichtenhofer et al.
ICCV'19, re-expressed with our factorized (2+1)D blocks).

Two pathways over the same clip:
  * Slow: temporally subsampled input (stride ``alpha``), wide channels —
    spatial semantics.
  * Fast: full frame rate, ``1/beta`` channels — motion.
Lateral connections after the stem and each stage fuse Fast into Slow via a
time-strided (5x1x1, stride alpha) conv projecting to 2*C_fast channels,
concatenated on the channel dim. Head: global-pool both pathways, concat, FC.

Channel parallelism: with ``shard_axis`` set (the mesh's `model` axis), every
conv kernel's output-channel dim carries a partitioning annotation; placing
params with parallel.mesh.variables_shardings then shards the conv GEMMs
across ICI and XLA inserts the all-gathers at the concat/fusion points —
exactly the TP pattern SURVEY.md §3.3 calls for.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from fastvideotagging_tpu.models.layers import (
    BatchNorm,
    Conv3D,
    global_avg_pool_3d,
)


class SFBlock(nn.Module):
    """Basic (2+1)D residual block with optional channel sharding."""

    features: int
    spatial_stride: int = 1
    dtype: jnp.dtype = jnp.bfloat16
    shard_axis: str | None = None
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        cin = x.shape[-1]
        s = self.spatial_stride
        bn = lambda name: BatchNorm(  # noqa: E731
            use_running_average=not train, dtype=self.dtype,
            axis_name=self.bn_axis_name, name=name,
        )
        conv = lambda f, k, st, name: Conv3D(  # noqa: E731
            f, k, strides=st, dtype=self.dtype, shard_axis=self.shard_axis,
            name=name,
        )
        residual = x
        y = conv(self.features, (1, 3, 3), (1, s, s), "spatial1")(x)
        y = nn.relu(bn("bn1")(y))
        y = conv(self.features, (3, 1, 1), (1, 1, 1), "temporal1")(y)
        y = nn.relu(bn("bn2")(y))
        y = conv(self.features, (1, 3, 3), (1, 1, 1), "spatial2")(y)
        y = bn("bn3")(y)
        if s != 1 or cin != self.features:
            residual = conv(self.features, (1, 1, 1), (1, s, s), "down")(x)
            residual = bn("bn_down")(residual)
        return nn.relu(y + residual)


class SlowFastR2Plus1D(nn.Module):
    """``pack_fast=False``: the faithful dual-rate design (fast pathway at
    full frame rate, 1/beta channels). ``pack_fast=True``: the
    `slowfast_r2plus1d_tpu` variant — the fast pathway runs on a
    TIME-TO-CHANNEL packed representation: ``alpha`` consecutive frames
    fold into the channel dim ((N,T,H,W,C) -> (N,T/alpha,H,W,alpha*C)), so

      * fast convs see ``alpha * C_fast`` channels (32/64/128/256 at the
        defaults) instead of 8/16/32/64 — the faithful fast pathway's
        6-50% MXU lane occupancy is the worst perf row in the repo
        (PERF.md round-4 SlowFast attribution, BENCH_r03 0.2945);
      * both pathways share the time axis (T/alpha == slow's T), so the
        lateral connections become stride-free 3x1x1 convs;
      * temporal mixing inside a packed frame group comes free from the
        dense channel mixing; across groups from the 3-tap temporal convs
        (12-frame receptive field at alpha=4).

    Same macro-topology, stage count and lateral fusion points; NOT
    weight-compatible with the faithful model (the r2plus1d `_tpu`
    precedent). Accuracy parity: benchmarks/ACCURACY_HARD_SLOWFAST.json."""

    num_classes: int = 400
    alpha: int = 4          # temporal stride of the Slow pathway
    beta: int = 8           # Fast channel fraction: C_fast = C_slow / beta
    base_width: int = 64
    stage_blocks: Sequence[int] = (1, 1, 1, 1)
    dropout: float = 0.5
    dtype: jnp.dtype = jnp.bfloat16
    shard_axis: str | None = None  # e.g. "model" for channel parallelism
    bn_axis_name: str | None = None
    pack_fast: bool = False  # the `_tpu` time-to-channel fast pathway

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        if x.shape[1] % self.alpha != 0:
            raise ValueError(
                f"clip length {x.shape[1]} must be divisible by alpha={self.alpha}"
            )
        x = x.astype(self.dtype)
        kw = dict(dtype=self.dtype, shard_axis=self.shard_axis)
        bn = lambda name: BatchNorm(  # noqa: E731
            use_running_average=not train, dtype=self.dtype,
            axis_name=self.bn_axis_name, name=name,
        )

        slow = x[:, :: self.alpha]
        cf = max(self.base_width // self.beta, 8)
        # packed fast widths carry the alpha frames in channels
        fmul = self.alpha if self.pack_fast else 1

        slow = Conv3D(self.base_width, (1, 7, 7), strides=(1, 2, 2),
                      name="slow_stem", **kw)(slow)
        slow = nn.relu(bn("slow_stem_bn")(slow))
        if self.pack_fast:
            n, t, h, w, c = x.shape
            fast = x.reshape(n, t // self.alpha, self.alpha, h, w, c)
            fast = jnp.moveaxis(fast, 2, 4).reshape(
                n, t // self.alpha, h, w, self.alpha * c)
            # 3-tap temporal stem over packed groups spans 3*alpha frames
            # (the faithful 5x7x7 stem sees 5) — receptive field grows,
            # rate of temporal information is identical (nothing dropped)
            fast = Conv3D(cf * fmul, (3, 7, 7), strides=(1, 2, 2),
                          name="fast_stem", **kw)(fast)
        else:
            fast = Conv3D(cf, (5, 7, 7), strides=(1, 2, 2),
                          name="fast_stem", **kw)(x)
        fast = nn.relu(bn("fast_stem_bn")(fast))
        slow = self._fuse(slow, fast, cf, 0, bn)

        for stage, num_blocks in enumerate(self.stage_blocks):
            ws = self.base_width * (2 ** stage)
            wf = max(ws // self.beta, 8)
            for b in range(num_blocks):
                stride = 2 if (stage > 0 and b == 0) else 1
                slow = SFBlock(ws, spatial_stride=stride, dtype=self.dtype,
                               shard_axis=self.shard_axis,
                               bn_axis_name=self.bn_axis_name,
                               name=f"slow_s{stage}_b{b}")(slow, train)
                fast = SFBlock(wf * fmul, spatial_stride=stride,
                               dtype=self.dtype,
                               shard_axis=self.shard_axis,
                               bn_axis_name=self.bn_axis_name,
                               name=f"fast_s{stage}_b{b}")(fast, train)
            slow = self._fuse(slow, fast, wf, stage + 1, bn)

        pooled = jnp.concatenate(
            [global_avg_pool_3d(slow), global_avg_pool_3d(fast)], axis=-1
        )
        if self.dropout > 0:
            pooled = nn.Dropout(self.dropout, deterministic=not train)(pooled)
        logits = nn.Dense(self.num_classes, dtype=jnp.float32,
                          param_dtype=jnp.float32, name="fc")(pooled)
        return logits.astype(jnp.float32)

    def _fuse(self, slow, fast, cf, idx, bn):
        """Lateral fast->slow: conv to 2*cf ch, concat on C. Faithful:
        time-strided 5x1x1 (stride alpha) aligns the rates; packed: the
        rates already match, a stride-free 3x1x1 suffices."""
        if self.pack_fast:
            lat = Conv3D(2 * cf, (3, 1, 1), strides=(1, 1, 1),
                         dtype=self.dtype, shard_axis=self.shard_axis,
                         name=f"lateral{idx}")(fast)
        else:
            lat = Conv3D(2 * cf, (5, 1, 1), strides=(self.alpha, 1, 1),
                         dtype=self.dtype, shard_axis=self.shard_axis,
                         name=f"lateral{idx}")(fast)
        lat = nn.relu(bn(f"lateral{idx}_bn")(lat))
        return jnp.concatenate([slow, lat], axis=-1)
