"""Tiny 3D-CNN debug backbone — not part of the reference surface.

Used by integration tests (overfit-one-batch, pipeline smoke) and CPU-mesh
distributed tests where the full backbones would dominate wall-clock.
Exercises the same structural elements: conv3d, BN, striding, global pool.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from fastvideotagging_tpu.models.layers import BatchNorm, Conv3D, global_avg_pool_3d


class Tiny3D(nn.Module):
    num_classes: int = 10
    width: int = 16
    dtype: jnp.dtype = jnp.bfloat16
    bn_axis_name: str | None = None
    norm: str = "batch"

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        bn = lambda name: BatchNorm(  # noqa: E731
            kind=self.norm, use_running_average=not train, dtype=self.dtype,
            axis_name=self.bn_axis_name, name=name,
        )
        ws = self.norm == "scaleonly"
        x = x.astype(self.dtype)
        x = Conv3D(self.width, (3, 3, 3), strides=(1, 2, 2), dtype=self.dtype,
                   ws=ws, name="conv1")(x)
        x = nn.relu(bn("bn1")(x))
        x = Conv3D(self.width * 2, (3, 3, 3), strides=(2, 2, 2),
                   dtype=self.dtype, ws=ws, name="conv2")(x)
        x = nn.relu(bn("bn2")(x))
        x = global_avg_pool_3d(x)
        return nn.Dense(self.num_classes, dtype=jnp.float32,
                        param_dtype=jnp.float32, name="fc")(x).astype(jnp.float32)
