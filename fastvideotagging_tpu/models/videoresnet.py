"""R3D / MC3 backbones — the full-3D and mixed-convolution ablation
siblings of R(2+1)D from the same paper (Tran et al. CVPR'18 "A Closer
Look at Spatiotemporal Convolutions"; SURVEY.md C7's source). Layout
matches torchvision's VideoResNet (r3d_18 / mc3_18), so checkpoints in
that format import numerics-exactly (models/torch_import.py — symmetric
k//2 conv padding throughout).

* r3d_18: stem Conv3d(3x7x7, s(1,2,2)) -> 64; four BasicBlock stages of
  full 3x3x3 convs, stride (2,2,2) at stage entry.
* mc3_18: same stem and stage 1; stages 2-4 use 1x3x3 ("no-temporal")
  convs with stride (1,2,2) at entry — the paper's MC3 mixed design
  (3D early, 2D late).

TPU notes: NTHWC, bf16 compute / f32 params like every backbone here;
the 3x3x3 convs map onto the same XLA conv path whose rooflines PERF.md
pins (no factorized mid-channels, so no `_tpu` variant is needed —
stage widths 64..512 are already lane-aligned).
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


class Block3D(nn.Module):
    """VideoResNet BasicBlock with a full-3D or no-temporal conv type."""

    features: int
    stride: int = 1
    conv_type: str = "3d"  # '3d' (3x3x3) | 'no_t' (1x3x3)
    dtype: jnp.dtype = jnp.bfloat16
    bn_axis_name: str | None = None
    norm: str = "batch"

    def _conv(self, features, stride, name):
        if self.conv_type == "3d":
            kernel, strides = (3, 3, 3), (stride, stride, stride)
        elif self.conv_type == "no_t":
            kernel, strides = (1, 3, 3), (1, stride, stride)
        else:
            raise ValueError(f"conv_type {self.conv_type!r} not in "
                             f"('3d', 'no_t')")
        return Conv3D(features, kernel, strides=strides, dtype=self.dtype,
                      name=name)

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        cin = x.shape[-1]
        bn = lambda name: BatchNorm(  # noqa: E731
            kind=self.norm, use_running_average=not train, dtype=self.dtype,
            axis_name=self.bn_axis_name, name=name,
        )
        residual = x
        y = self._conv(self.features, self.stride, "conv1")(x)
        y = nn.relu(bn("bn1")(y))
        y = self._conv(self.features, 1, "conv2")(y)
        y = bn("bn2")(y)
        if self.stride != 1 or cin != self.features:
            # downsample stride follows the conv type (torchvision's
            # get_downsample_stride): (s,s,s) for 3d, (1,s,s) for no_t
            ds = ((self.stride,) * 3 if self.conv_type == "3d"
                  else (1, self.stride, self.stride))
            residual = Conv3D(self.features, (1, 1, 1), strides=ds,
                              dtype=self.dtype, name="downsample")(x)
            residual = bn("bn_down")(residual)
        return nn.relu(y + residual)


class VideoResNet3D(nn.Module):
    """r3d_18 / mc3_18 (torchvision VideoResNet layout, NTHWC)."""

    stage_blocks: Sequence[int] = (2, 2, 2, 2)
    stage_conv_types: Sequence[str] = ("3d", "3d", "3d", "3d")
    num_classes: int = 101
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.bfloat16
    bn_axis_name: str | None = None
    norm: str = "batch"

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = x.astype(self.dtype)
        # BasicStem: 3x7x7 s(1,2,2) -> 64, symmetric padding
        x = Conv3D(64, (3, 7, 7), strides=(1, 2, 2), dtype=self.dtype,
                   name="stem_conv")(x)
        x = nn.relu(BatchNorm(kind=self.norm, use_running_average=not train,
                              dtype=self.dtype, axis_name=self.bn_axis_name,
                              name="stem_bn")(x))
        for stage, (num_blocks, conv_type) in enumerate(
                zip(self.stage_blocks, self.stage_conv_types)):
            features = 64 * (2 ** stage)
            for block in range(num_blocks):
                stride = 2 if (stage > 0 and block == 0) else 1
                x = Block3D(features, stride=stride, conv_type=conv_type,
                            dtype=self.dtype, bn_axis_name=self.bn_axis_name,
                            norm=self.norm,
                            name=f"stage{stage + 1}_block{block}")(x, train)
        x = global_avg_pool_3d(x)
        if self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        logits = nn.Dense(self.num_classes, dtype=jnp.float32,
                          param_dtype=jnp.float32, name="fc")(x)
        return logits.astype(jnp.float32)
