"""Channel-major transposed-conv prototype: parity vs lax (CPU interpret).

Kept tested although it measured slower than XLA on-chip (negative result,
see module docstring) — it documents the layout trade-off with evidence.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from fastvideotagging_tpu.ops.cmajor_conv import spatial_conv_cmajor


@pytest.mark.parametrize("n,c,h,wd,co,k", [
    (2, 32, 8, 8, 48, 3),
    (1, 64, 12, 16, 40, 3),
    (1, 32, 8, 8, 32, 5),
])
def test_parity_vs_lax(n, c, h, wd, co, k):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (n, h, wd, c), jnp.float32)
    w = jax.random.normal(key, (k, k, c, co)) / np.sqrt(k * k * c)
    ref = lax.conv_general_dilated(
        x[:, None], w[None], (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))[:, 0]
    x_cm = x.transpose(0, 3, 1, 2).reshape(n, c, h * wd)
    got = spatial_conv_cmajor(x_cm, w, h, wd)
    got_nhwc = got.reshape(n, co, h, wd).transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(got_nhwc), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
