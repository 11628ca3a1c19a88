"""C3D backbone (Tran et al. ICCV'15; SURVEY.md C6).

8x conv3d(3x3x3)+ReLU, 5x maxpool3d (first pool spatial-only), 2x FC-4096 with
dropout, classifier head. Canonical input 16x112x112x3 (NTHWC) -> pool5 output
1x4x4x512 -> fc6 input 8192, exactly the paper's geometry.

No batch norm (paper-faithful); weights he_normal, f32 params, bf16 compute.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from fastvideotagging_tpu.models.layers import Conv3D, max_pool_3d


class C3D(nn.Module):
    num_classes: int = 101
    dropout: float = 0.5
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        conv = lambda f, name: Conv3D(  # noqa: E731
            f, (3, 3, 3), use_bias=True, dtype=self.dtype, name=name
        )
        x = x.astype(self.dtype)
        x = nn.relu(conv(64, "conv1")(x))
        x = max_pool_3d(x, (1, 2, 2), train=train)
        x = nn.relu(conv(128, "conv2")(x))
        x = max_pool_3d(x, (2, 2, 2), train=train)
        x = nn.relu(conv(256, "conv3a")(x))
        x = nn.relu(conv(256, "conv3b")(x))
        x = max_pool_3d(x, (2, 2, 2), train=train)
        x = nn.relu(conv(512, "conv4a")(x))
        x = nn.relu(conv(512, "conv4b")(x))
        x = max_pool_3d(x, (2, 2, 2), train=train)
        x = nn.relu(conv(512, "conv5a")(x))
        x = nn.relu(conv(512, "conv5b")(x))
        # pool5 pads spatially (7 -> 4 at 112 input). Torch/MXNet pad
        # SYMMETRICALLY (pad=(0,1,1) both sides, window groupings [p,x0],
        # [x1,x2],...) while XLA 'SAME' pads lo=0/hi=1 ([x0,x1],...,[x6,p])
        # — same geometry, one-pixel-shifted groupings. Explicit symmetric
        # padding keeps the classic-C3D checkpoint import numerically exact
        # (models/torch_import.convert_c3d_state_dict).
        x = max_pool_3d(x, (2, 2, 2), padding=((0, 0), (1, 1), (1, 1)),
                        train=train)
        x = x.reshape((x.shape[0], -1))
        x = nn.relu(nn.Dense(4096, dtype=self.dtype, param_dtype=jnp.float32,
                             name="fc6")(x))
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.relu(nn.Dense(4096, dtype=self.dtype, param_dtype=jnp.float32,
                             name="fc7")(x))
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        logits = nn.Dense(self.num_classes, dtype=jnp.float32,
                          param_dtype=jnp.float32, name="fc8")(x)
        return logits.astype(jnp.float32)
