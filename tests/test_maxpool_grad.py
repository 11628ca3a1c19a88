"""Parity tests for the TPU-fast max-pool VJP (ops/maxpool_grad.py).

The stencil backward must match XLA's select_and_scatter VJP exactly on
tie-free inputs for every pooling geometry the models use, and must split
the cotangent evenly among tied elements (documented semantics) while
conserving its total mass.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastvideotagging_tpu.ops.maxpool_grad import max_pool_nthwc

# Every geometry used by the zoo: c3d stage pools, c3d's padded last pool,
# p3d's (2,3,3), s3d's strided TF-SAME stage pools and 3x3x3 s1 branch
# pool, i3d's (1,3,3) s(1,2,2) and (2,2,2) stage pools, plus stride>window.
GEOMETRIES = [
    ((1, 2, 2), (1, 2, 2), "VALID"),
    ((2, 2, 2), (2, 2, 2), "VALID"),
    ((2, 2, 2), (2, 2, 2), ((0, 0), (1, 1), (1, 1))),
    ((2, 3, 3), (2, 2, 2), ((0, 1), (1, 1), (1, 1))),
    ((3, 3, 3), (1, 1, 1), ((1, 1), (1, 1), (1, 1))),
    ((1, 3, 3), (1, 2, 2), "SAME"),
    ((3, 3, 3), (2, 2, 2), "SAME"),
    ((1, 2, 2), (1, 3, 3), "VALID"),  # stride > window: uncovered inputs
]


def _tie_free(shape, seed):
    """Distinct values everywhere -> both VJPs are the same exact map."""
    rng = np.random.default_rng(seed)
    flat = rng.permutation(np.prod(shape)).astype(np.float32)
    return jnp.asarray((flat / flat.size - 0.5).reshape(shape))


MODES = ["mask", "sep", "sepmask"]


@pytest.mark.parametrize("mode", MODES)
@pytest.mark.parametrize("window,strides,padding", GEOMETRIES)
def test_grad_matches_select_and_scatter(window, strides, padding, mode):
    x = _tie_free((2, 5, 9, 9, 3), seed=hash((window, strides)) % 2**31)

    def loss(x, grad):
        y = max_pool_nthwc(x, window, strides, padding, grad=grad)
        return jnp.sum(y * jnp.cos(jnp.arange(y.size, dtype=jnp.float32)
                                   .reshape(y.shape)))

    g_mode = jax.grad(lambda x: loss(x, mode))(x)
    g_sas = jax.grad(lambda x: loss(x, "sas"))(x)
    # Overlapping windows accumulate multi-win cotangents in a different
    # order than select_and_scatter's scan -> f32 non-associativity only.
    np.testing.assert_allclose(np.asarray(g_mode), np.asarray(g_sas),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("mode", MODES)
@pytest.mark.parametrize("window,strides,padding", GEOMETRIES)
def test_forward_identical(window, strides, padding, mode):
    x = _tie_free((2, 5, 9, 9, 3), seed=7)
    y_mode = max_pool_nthwc(x, window, strides, padding, grad=mode)
    y_sas = max_pool_nthwc(x, window, strides, padding, grad="sas")
    np.testing.assert_array_equal(np.asarray(y_mode), np.asarray(y_sas))


def test_ties_split_evenly_in_mask_mode():
    # One window (2,2,2) over a 2x2x2 input with two tied maxima: the
    # 'mask' VJP splits the cotangent evenly (documented semantics).
    x = jnp.zeros((1, 2, 2, 2, 1), jnp.float32)
    x = x.at[0, 0, 0, 0, 0].set(5.0).at[0, 1, 1, 1, 0].set(5.0)
    g = jax.grad(lambda x: jnp.sum(
        max_pool_nthwc(x, (2, 2, 2), (2, 2, 2), "VALID", grad="mask")))(x)
    assert float(g[0, 0, 0, 0, 0]) == pytest.approx(0.5)
    assert float(g[0, 1, 1, 1, 0]) == pytest.approx(0.5)
    assert float(jnp.sum(g)) == pytest.approx(1.0)


def test_phase_dependent_default_lowering():
    # grad=None: train lowers separably ('sep'), eval to one 3D window
    # ('sas') — count reduce_window ops in the jaxpr of each.
    x = _tie_free((1, 4, 8, 8, 2), seed=5)

    def pool(x, train):
        return max_pool_nthwc(x, (3, 3, 3), (2, 2, 2), "SAME", train=train)

    n_train = str(jax.make_jaxpr(lambda x: pool(x, True))(x)).count(
        "reduce_window")
    n_eval = str(jax.make_jaxpr(lambda x: pool(x, False))(x)).count(
        "reduce_window")
    assert n_train == 3
    assert n_eval == 1


@pytest.mark.parametrize("window,strides,padding", GEOMETRIES)
def test_cotangent_mass_conserved_with_ties(window, strides, padding):
    # Coarse integer grid -> ties everywhere, incl. post-ReLU-style zeros.
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.integers(0, 3, (2, 5, 9, 9, 3)).astype(np.float32))
    ct = jnp.asarray(
        rng.standard_normal(
            max_pool_nthwc(x, window, strides, padding).shape
        ).astype(np.float32))
    _, vjp = jax.vjp(lambda x: max_pool_nthwc(x, window, strides, padding), x)
    (g,) = vjp(ct)
    np.testing.assert_allclose(float(jnp.sum(g)), float(jnp.sum(ct)),
                               rtol=1e-5)


def test_bf16_tie_free_exact_and_jit():
    x = _tie_free((2, 4, 8, 8, 4), seed=11).astype(jnp.bfloat16)

    import functools

    @functools.partial(jax.jit, static_argnums=1)
    def g(x, mode):
        return jax.grad(lambda x: jnp.sum(
            max_pool_nthwc(x, (1, 3, 3), (1, 2, 2), "SAME", grad=mode)
        ).astype(jnp.float32))(x)

    np.testing.assert_allclose(
        np.asarray(g(x, "mask").astype(jnp.float32)),
        np.asarray(g(x, "sas").astype(jnp.float32)), rtol=1e-2)


def test_models_use_fast_path_and_grads_finite():
    # The model-layer wrappers route here; a jitted grad through a pool
    # stack must be finite and mass-conserving.
    from fastvideotagging_tpu.models.layers import max_pool_3d

    x = _tie_free((1, 4, 12, 12, 8), seed=23)

    @jax.jit
    def f(x):
        y = max_pool_3d(x, (1, 2, 2))
        y = max_pool_3d(y, (2, 2, 2))
        return jnp.sum(y)

    g = jax.grad(f)(x)
    assert bool(jnp.all(jnp.isfinite(g)))
    assert float(jnp.sum(g)) == pytest.approx(float(jnp.sum(jnp.ones((1, 2, 3, 3, 8)))), rel=1e-5)
