"""Fused inference engine parity vs model.apply (serving path)."""

import jax
import jax.numpy as jnp
import numpy as np

from fastvideotagging_tpu.models.r2plus1d import R2Plus1D
from fastvideotagging_tpu.ops.fused_infer import r2plus1d_fused_infer


def test_matches_model_apply():
    model = R2Plus1D(stage_blocks=(1, 1), num_classes=7, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 32, 32, 3))
    variables = jax.jit(model.init, static_argnames="train")(
        jax.random.PRNGKey(0), x, train=False)
    # perturb BN stats so folding is non-trivially exercised
    variables = jax.tree.map(lambda a: a + 0.05 if a.ndim == 1 else a,
                             variables)
    ref = jax.jit(lambda v, x: model.apply(v, x, train=False))(variables, x)
    got = r2plus1d_fused_infer(variables, x, stage_blocks=(1, 1))
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=5e-2, atol=5e-2)
    # scores must agree to a much tighter degree in relative ranking
    assert (np.argmax(got, -1) == np.argmax(ref, -1)).all()


def test_deterministic():
    model = R2Plus1D(stage_blocks=(1,), num_classes=3, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 16, 16, 3))
    variables = jax.jit(model.init, static_argnames="train")(
        jax.random.PRNGKey(0), x, train=False)
    a = np.asarray(r2plus1d_fused_infer(variables, x, stage_blocks=(1,)))
    b = np.asarray(r2plus1d_fused_infer(variables, x, stage_blocks=(1,)))
    np.testing.assert_array_equal(a, b)
