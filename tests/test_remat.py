"""Activation-rematerialization (ModelConfig.remat) parity tests.

remat is a pure scheduling knob: every policy must produce numerics
IDENTICAL to remat='none' — same forward logits, same gradients, same
batch_stats updates — because the recomputed math is the same math.
(The throughput A/B lives in benchmarks/remat_step.py -> REMAT_STEP.json;
these tests pin that the knob cannot change training semantics.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastvideotagging_tpu.models.r2plus1d import R2Plus1D, remat_policy

POLICIES = ("full", "dots", "mid", "conv")


def _tiny(remat: str, norm: str = "batch") -> R2Plus1D:
    # two stages / one block each: covers the downsample branch and the
    # stage loop's block-class wrapping without CPU-conv3d test cost
    return R2Plus1D(stage_blocks=(1, 1), num_classes=5, dtype=jnp.float32,
                    norm=norm, remat=remat)


def _grads_and_stats(model, variables, x, labels):
    def loss_fn(params):
        logits, mut = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, True, mutable=["batch_stats"])
        onehot = jax.nn.one_hot(labels, logits.shape[-1])
        loss = -jnp.mean(jnp.sum(jax.nn.log_softmax(logits) * onehot, -1))
        return loss, mut["batch_stats"]

    (loss, stats), grads = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True))(variables["params"])
    return loss, grads, stats


class TestRematParity:
    @pytest.fixture(scope="class")
    def data(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((2, 8, 16, 16, 3)), jnp.float32)
        labels = jnp.asarray(rng.integers(0, 5, (2,)), jnp.int32)
        return x, labels

    @pytest.fixture(scope="class")
    def baseline(self, data):
        x, labels = data
        model = _tiny("none")
        variables = model.init(jax.random.PRNGKey(0), x[:1], train=False)
        return model, variables, _grads_and_stats(model, variables, x, labels)

    @pytest.mark.parametrize("policy", POLICIES)
    def test_train_step_identical(self, data, baseline, policy):
        x, labels = data
        _, variables, (loss0, grads0, stats0) = baseline
        model = _tiny(policy)
        # identical init tree: remat wrapping must not change param structure
        loss, grads, stats = _grads_and_stats(model, variables, x, labels)
        assert float(loss) == pytest.approx(float(loss0), rel=1e-6)
        for a, b in zip(jax.tree.leaves(grads0), jax.tree.leaves(grads)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)
        for a, b in zip(jax.tree.leaves(stats0), jax.tree.leaves(stats)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-7)

    @pytest.mark.parametrize("policy", POLICIES)
    def test_eval_forward_identical(self, data, baseline, policy):
        x, _ = data
        _, variables, _ = baseline
        ref = jax.jit(lambda v, xi: _tiny("none").apply(v, xi, train=False))(
            variables, x)
        got = jax.jit(lambda v, xi: _tiny(policy).apply(v, xi, train=False))(
            variables, x)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))

    def test_param_tree_unchanged(self, data):
        x, _ = data
        v_none = jax.eval_shape(
            lambda: _tiny("none").init(jax.random.PRNGKey(0), x[:1],
                                       train=False))
        v_full = jax.eval_shape(
            lambda: _tiny("full").init(jax.random.PRNGKey(0), x[:1],
                                       train=False))
        assert jax.tree.map(lambda a: a.shape, v_none) == jax.tree.map(
            lambda a: a.shape, v_full)

    def test_unknown_policy_raises(self):
        with pytest.raises(ValueError, match="unknown remat policy"):
            remat_policy("bogus")


def test_model_config_threads_remat():
    """model_from_config forwards remat to the r2plus1d family and fails
    loudly for models without the knob."""
    from fastvideotagging_tpu.config import ModelConfig
    from fastvideotagging_tpu.models import model_from_config

    m = model_from_config(ModelConfig(name="r2plus1d_18", remat="full"))
    assert m.remat == "full"
    m = model_from_config(ModelConfig(name="r2plus1d_18_tpu", remat="mid"))
    assert m.remat == "mid"
    # default: not forwarded, module default applies
    assert model_from_config(ModelConfig(name="r2plus1d_18")).remat == "none"
    with pytest.raises(TypeError):
        model_from_config(ModelConfig(name="c3d", remat="full"))


def test_scaleonly_remat_compatible():
    """remat composes with the stats-free norm (no batch_stats collection)."""
    x = jnp.ones((1, 4, 8, 8, 3), jnp.float32)
    model = _tiny("full", norm="scaleonly")
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    def loss_fn(params):
        logits = model.apply({"params": params}, x, True)
        return jnp.sum(logits ** 2)

    grads = jax.jit(jax.grad(loss_fn))(variables["params"])
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree.leaves(grads))
