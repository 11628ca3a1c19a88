"""S3D — separable-3D Inception video network (Xie et al. ECCV'18
"Rethinking Spatiotemporal Feature Learning: Speed-Accuracy Trade-offs in
Video Classification", PAPERS.md:7; SURVEY.md §7 cites it as a baseline
anchor). The paper's move is exactly this repo's (2+1)D factorization
applied to the I3D/BN-Inception backbone: every 3x3x3 conv becomes a
spatial 1xkxk conv + BN + ReLU followed by a temporal kx1x1 conv + BN +
ReLU ("temporal-separable conv"), cutting params/FLOPs below I3D at higher
accuracy. ``gating=True`` adds the paper's self-gating (S3D-G): each
separable conv output is scaled per-channel by sigmoid(W · spatiotemporal
average of itself).

Layer geometry follows the documented torchvision ``models.video.s3d``
layout (stem sep-conv 7, 1x1x1 conv, sep-conv 3, nine SepInception blocks
named mixed3b..mixed5c, BN eps 1e-3) so public checkpoints in that format
import numerics-exactly (models/torch_import.py). Head note: torchvision
ends with AvgPool3d((2,7,7), stride 1) -> 1x1x1 conv classifier -> mean
over positions. Because the classifier is linear and position-independent
it commutes with the averaging, and at the canonical 224px eval geometry
the (·,7,7) window IS the full spatial extent — so the exact equivalent
implemented here is: f32 spatial global mean -> temporal window-2 stride-1
mean -> temporal mean -> Dense. At geometries whose final spatial extent
differs from 7 (e.g. 112px inputs, where torchvision's fixed window would
not even run) the spatial pool is the global mean.

TPU notes: NTHWC, bf16 compute / f32 params like every backbone here. The
separable convs reuse SpatialConv/TemporalConv, so the ``backend='pallas'``
opt-in applies; the concat channel widths (256/480/512/528/832/1024) are
all lane-friendly multiples of 16 and the big FLOP carriers sit in
128-multiple branches.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from fastvideotagging_tpu.models.layers import (
    BatchNorm,
    Conv3D,
    SpatialConv,
    TemporalConv,
    max_pool_3d,
)


class SepConv(nn.Module):
    """Temporal-separable conv: spatial(1xkxk)+BN+ReLU -> temporal(kx1x1)
    +BN+ReLU, stride applied inside the matching factor. With ``gating``,
    the output is scaled per-channel by a sigmoid gate computed from its
    own spatiotemporal average (the S3D-G feature gate)."""

    features: int
    kernel: int = 3
    stride: int = 1
    gating: bool = False
    backend: str = "xla"
    dtype: jnp.dtype = jnp.bfloat16
    bn_axis_name: str | None = None
    norm: str = "batch"
    bn_eps: float = 1e-3

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        bn = lambda name: BatchNorm(  # noqa: E731
            kind=self.norm, use_running_average=not train, dtype=self.dtype,
            axis_name=self.bn_axis_name, epsilon=self.bn_eps, name=name,
        )
        y = SpatialConv(self.features, self.kernel, stride=self.stride,
                        backend=self.backend, dtype=self.dtype,
                        name="spatial")(x)
        y = nn.relu(bn("bn_s")(y))
        y = TemporalConv(self.features, self.kernel, stride=self.stride,
                         backend=self.backend, dtype=self.dtype,
                         name="temporal")(y)
        y = nn.relu(bn("bn_t")(y))
        if self.gating:
            pooled = jnp.mean(y.astype(jnp.float32), axis=(1, 2, 3))
            gate = nn.Dense(self.features, dtype=jnp.float32,
                            param_dtype=jnp.float32, name="gate")(pooled)
            gate = jax.nn.sigmoid(gate).astype(y.dtype)
            y = y * gate[:, None, None, None, :]
        return y


class SepInception(nn.Module):
    """Inception block with temporal-separable 3x3 branches:

    b0: 1x1x1 -> c0;   b1: 1x1x1 -> c1a, sep-conv3 -> c1b;
    b2: 1x1x1 -> c2a, sep-conv3 -> c2b;   b3: maxpool3 s1, 1x1x1 -> c3;
    concat on channels (b0 | b1 | b2 | b3).
    """

    c0: int
    c1a: int
    c1b: int
    c2a: int
    c2b: int
    c3: int
    gating: bool = False
    backend: str = "xla"
    dtype: jnp.dtype = jnp.bfloat16
    bn_axis_name: str | None = None
    norm: str = "batch"
    bn_eps: float = 1e-3

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        bn = lambda name: BatchNorm(  # noqa: E731
            kind=self.norm, use_running_average=not train, dtype=self.dtype,
            axis_name=self.bn_axis_name, epsilon=self.bn_eps, name=name,
        )
        conv1 = lambda f, name: Conv3D(  # noqa: E731
            f, (1, 1, 1), dtype=self.dtype, name=name)
        sep = lambda f, name: SepConv(  # noqa: E731
            f, 3, gating=self.gating, backend=self.backend, dtype=self.dtype,
            bn_axis_name=self.bn_axis_name, norm=self.norm,
            bn_eps=self.bn_eps, name=name)

        b0 = nn.relu(bn("b0_bn")(conv1(self.c0, "b0")(x)))
        b1 = nn.relu(bn("b1_bn")(conv1(self.c1a, "b1_reduce")(x)))
        b1 = sep(self.c1b, "b1_sep")(b1, train)
        b2 = nn.relu(bn("b2_bn")(conv1(self.c2a, "b2_reduce")(x)))
        b2 = sep(self.c2b, "b2_sep")(b2, train)
        b3 = max_pool_3d(x, (3, 3, 3), strides=(1, 1, 1),
                         padding=((1, 1), (1, 1), (1, 1)), train=train)
        b3 = nn.relu(bn("b3_bn")(conv1(self.c3, "b3_conv")(b3)))
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


# (name, branch widths) for the nine blocks — BN-Inception geometry
# (torchvision features indices 5,6,8,9,10,11,12,14,15).
_INCEPTION_BLOCKS = (
    ("mixed3b", (64, 96, 128, 16, 32, 32)),     # 192 -> 256
    ("mixed3c", (128, 128, 192, 32, 96, 64)),   # 256 -> 480
    ("pool3", None),                            # (3,3,3) s2 p1
    ("mixed4b", (192, 96, 208, 16, 48, 64)),    # 480 -> 512
    ("mixed4c", (160, 112, 224, 24, 64, 64)),   # 512 -> 512
    ("mixed4d", (128, 128, 256, 24, 64, 64)),   # 512 -> 512
    ("mixed4e", (112, 144, 288, 32, 64, 64)),   # 512 -> 528
    ("mixed4f", (256, 160, 320, 32, 128, 128)),  # 528 -> 832
    ("pool4", None),                            # (2,2,2) s2 p0
    ("mixed5b", (256, 160, 320, 32, 128, 128)),  # 832 -> 832
    ("mixed5c", (384, 192, 384, 48, 128, 128)),  # 832 -> 1024
)


class S3D(nn.Module):
    """S3D / S3D-G (``gating``) on NTHWC input."""

    num_classes: int = 400
    gating: bool = False
    dropout: float = 0.2
    backend: str = "xla"
    dtype: jnp.dtype = jnp.bfloat16
    bn_axis_name: str | None = None
    norm: str = "batch"
    bn_eps: float = 1e-3  # torchvision/TF-port S3D BN epsilon

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        kw = dict(gating=self.gating, backend=self.backend, dtype=self.dtype,
                  bn_axis_name=self.bn_axis_name, norm=self.norm,
                  bn_eps=self.bn_eps)
        x = x.astype(self.dtype)
        x = SepConv(64, kernel=7, stride=2, name="stem", **kw)(x, train)
        x = max_pool_3d(x, (1, 3, 3), strides=(1, 2, 2),
                        padding=((0, 0), (1, 1), (1, 1)), train=train)
        x = Conv3D(64, (1, 1, 1), dtype=self.dtype, name="conv2")(x)
        x = nn.relu(BatchNorm(kind=self.norm, use_running_average=not train,
                              dtype=self.dtype, axis_name=self.bn_axis_name,
                              epsilon=self.bn_eps, name="conv2_bn")(x))
        x = SepConv(192, kernel=3, name="conv3", **kw)(x, train)
        x = max_pool_3d(x, (1, 3, 3), strides=(1, 2, 2),
                        padding=((0, 0), (1, 1), (1, 1)), train=train)
        for name, widths in _INCEPTION_BLOCKS:
            if widths is None:
                window = (3, 3, 3) if name == "pool3" else (2, 2, 2)
                pad = (((1, 1),) * 3 if name == "pool3" else "VALID")
                x = max_pool_3d(x, window, strides=(2, 2, 2), padding=pad,
                                train=train)
            else:
                x = SepInception(*widths, name=name, **kw)(x, train)

        # Head (see module docstring): f32 spatial global mean, temporal
        # window-2 stride-1 mean, temporal mean — exact torchvision
        # numerics at the 224px geometry, global mean elsewhere.
        m = jnp.mean(x.astype(jnp.float32), axis=(2, 3))  # (N, T', C)
        if m.shape[1] > 1:
            m = (m[:, :-1] + m[:, 1:]) * 0.5
        m = jnp.mean(m, axis=1)
        if self.dropout > 0:
            m = nn.Dropout(self.dropout, deterministic=not train)(m)
        logits = nn.Dense(self.num_classes, dtype=jnp.float32,
                          param_dtype=jnp.float32, name="fc")(m)
        return logits.astype(jnp.float32)
