"""P3D backbone (Qiu et al. ICCV'17 "Pseudo-3D Residual Networks"; SURVEY.md C8).

ResNet-bottleneck layout with three pseudo-3D block variants cycled A->B->C
through the network:

    reduce 1x1x1 -> { A: T(S(x)) serial
                    , B: S(x) + T(x) parallel-sum
                    , C: S(x) + T(S(x)) serial-with-skip } -> expand 1x1x1

where S = spatial 1x3x3 conv and T = temporal 3x1x1 conv (each followed by
BN + ReLU inside the block). Depths: p3d_63 [3,4,6,3], p3d_131 [3,4,23,3],
p3d_199 [3,8,36,3]. Stem: 1x7x7 s(1,2,2) conv-BN-ReLU + 2x3x3 maxpool
s(2,2,2). Spatial stride 2 at stage entries 2-4; temporal extent is reduced
only by the stem pool (paper keeps T through the stages).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from fastvideotagging_tpu.models.layers import (
    BatchNorm,
    Conv3D,
    SpatialConv,
    TemporalConv,
    global_avg_pool_3d,
    max_pool_3d,
)


class BottleneckP3D(nn.Module):
    planes: int  # bottleneck width; block output is planes * 4
    block_type: str  # 'A' | 'B' | 'C'
    spatial_stride: int = 1
    backend: str = "xla"
    dtype: jnp.dtype = jnp.bfloat16
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        cin = x.shape[-1]
        cout = self.planes * 4
        bn = lambda name: BatchNorm(  # noqa: E731
            use_running_average=not train, dtype=self.dtype,
            axis_name=self.bn_axis_name, name=name,
        )
        residual = x
        s = self.spatial_stride

        y = Conv3D(self.planes, (1, 1, 1), strides=(1, s, s), dtype=self.dtype,
                   name="reduce")(x)
        y = nn.relu(bn("bn_reduce")(y))

        spatial = SpatialConv(self.planes, 3, backend=self.backend,
                              dtype=self.dtype, name="spatial")
        temporal = TemporalConv(self.planes, 3, backend=self.backend,
                                dtype=self.dtype, name="temporal")
        if self.block_type == "A":
            y = nn.relu(bn("bn_s")(spatial(y)))
            y = nn.relu(bn("bn_t")(temporal(y)))
        elif self.block_type == "B":
            ys = nn.relu(bn("bn_s")(spatial(y)))
            yt = nn.relu(bn("bn_t")(temporal(y)))
            y = ys + yt
        elif self.block_type == "C":
            ys = nn.relu(bn("bn_s")(spatial(y)))
            y = ys + nn.relu(bn("bn_t")(temporal(ys)))
        else:
            raise ValueError(f"unknown P3D block type {self.block_type!r}")

        y = Conv3D(cout, (1, 1, 1), dtype=self.dtype, name="expand")(y)
        y = bn("bn_expand")(y)

        if s != 1 or cin != cout:
            residual = Conv3D(cout, (1, 1, 1), strides=(1, s, s),
                              dtype=self.dtype, name="downsample")(x)
            residual = bn("bn_down")(residual)
        return nn.relu(y + residual)


class P3D(nn.Module):
    stage_blocks: Sequence[int] = (3, 4, 6, 3)
    num_classes: int = 400
    backend: str = "xla"
    dropout: float = 0.5
    dtype: jnp.dtype = jnp.bfloat16
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = x.astype(self.dtype)
        x = Conv3D(64, (1, 7, 7), strides=(1, 2, 2), dtype=self.dtype,
                   name="stem_conv")(x)
        x = nn.relu(BatchNorm(use_running_average=not train, dtype=self.dtype,
                              axis_name=self.bn_axis_name, name="stem_bn")(x))
        # symmetric (0,1,1) padding = torch/MXNet maxpool semantics (XLA
        # 'SAME' would pad lo=0/hi=1, shifting window groupings one pixel
        # vs what public checkpoints were trained with — see models/c3d.py
        # pool5 note and torch_import.convert_p3d_state_dict)
        x = max_pool_3d(x, (2, 3, 3), strides=(2, 2, 2),
                        padding=((0, 0), (1, 1), (1, 1)), train=train)

        block_cycle = "ABC"
        idx = 0
        for stage, num_blocks in enumerate(self.stage_blocks):
            planes = 64 * (2 ** stage)
            for block in range(num_blocks):
                stride = 2 if (stage > 0 and block == 0) else 1
                x = BottleneckP3D(
                    planes, block_cycle[idx % 3], spatial_stride=stride,
                    backend=self.backend, dtype=self.dtype,
                    bn_axis_name=self.bn_axis_name,
                    name=f"stage{stage + 1}_block{block}",
                )(x, train)
                idx += 1

        x = global_avg_pool_3d(x)
        if self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        logits = nn.Dense(self.num_classes, dtype=jnp.float32,
                          param_dtype=jnp.float32, name="fc")(x)
        return logits.astype(jnp.float32)
