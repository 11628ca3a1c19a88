"""Model-shape and parameter-count checksum tests (SURVEY.md §5.3).

Shape and param-count checks run under ``jax.eval_shape`` (no FLOPs — big
backbones at Kinetics shapes are checked structurally without computing);
real numerics are exercised on tiny shapes and in the integration tier.
Param counts are strong architecture checksums: the (2+1)D mid-channel
formula and the P3D block cycle both show up directly in the totals.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastvideotagging_tpu.models import get_model, list_models
from fastvideotagging_tpu.models.layers import r2plus1d_mid_channels


def _init_shapes(model, shape):
    """Shape-only init: returns a pytree of ShapeDtypeStructs."""
    x = jnp.zeros(shape, jnp.float32)
    return jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), x, train=False)
    )


def _apply_shape(model, variables, shape):
    x = jnp.zeros(shape, jnp.float32)
    out = jax.eval_shape(
        lambda v: model.apply(v, x, train=False, mutable=["batch_stats"]),
        variables,
    )
    return out[0] if isinstance(out, tuple) else out


def _param_count(variables):
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"]))


def test_registry():
    names = list_models()
    for expected in ["c3d", "r2plus1d_18", "r2plus1d_34", "p3d_63", "p3d_131",
                     "p3d_199"]:
        assert expected in names
    with pytest.raises(ValueError):
        get_model("not_a_model")


def test_mid_channel_formula_golden():
    # Tran'18: factorized conv matches full-3D param count.
    assert r2plus1d_mid_channels(64, 64) == 144
    assert r2plus1d_mid_channels(64, 128) == 230
    assert r2plus1d_mid_channels(128, 128) == 288
    assert r2plus1d_mid_channels(128, 256) == 460
    assert r2plus1d_mid_channels(256, 256) == 576
    assert r2plus1d_mid_channels(256, 512) == 921
    assert r2plus1d_mid_channels(512, 512) == 1152
    # Parameter matching property: |factorized - full3d| / full3d < 1%.
    for cin, cout in [(64, 64), (64, 128), (256, 512)]:
        m = r2plus1d_mid_channels(cin, cout)
        full = 27 * cin * cout
        fact = 9 * cin * m + 3 * m * cout
        assert abs(fact - full) / full < 0.01


class TestC3D:
    def test_shapes_and_params(self):
        model = get_model("c3d", num_classes=101)
        variables = _init_shapes(model, (2, 16, 112, 112, 3))
        logits = _apply_shape(model, variables, (2, 16, 112, 112, 3))
        assert logits.shape == (2, 101)
        assert logits.dtype == jnp.float32
        # fc6 must see the paper-exact 8192 = 512 * 1 * 4 * 4 flatten.
        assert variables["params"]["fc6"]["kernel"].shape == (8192, 4096)
        # Paper-exact total (with biases): ~78M for 101 classes.
        n = _param_count(variables)
        assert 77_000_000 < n < 80_000_000, n


class TestR2Plus1D:
    def test_r2plus1d18_shapes(self):
        model = get_model("r2plus1d_18", num_classes=101)
        variables = _init_shapes(model, (2, 16, 112, 112, 3))
        logits = _apply_shape(model, variables, (2, 16, 112, 112, 3))
        assert logits.shape == (2, 101)
        n = _param_count(variables)
        assert 31_000_000 < n < 34_000_000, n

    def test_r2plus1d18_param_count_golden_400(self):
        model = get_model("r2plus1d_18", num_classes=400)
        variables = _init_shapes(model, (1, 4, 32, 32, 3))
        n = _param_count(variables)
        # Analytic golden from the per-conv mid-channel spec (SURVEY.md C7):
        # each factorized conv gets its own M = f(Nin, Nout). Note torchvision
        # instead computes M once per block and reuses it for conv2, giving
        # 31,505,325; our spec matches the paper's per-conv parameter budget.
        assert n == 33_370_839, n

    def test_kinetics_shape(self):
        model = get_model("r2plus1d_34", num_classes=400)
        variables = _init_shapes(model, (1, 32, 224, 224, 3))
        logits = _apply_shape(model, variables, (1, 32, 224, 224, 3))
        assert logits.shape == (1, 400)

    def test_tpu_variant_mxu_aligned_and_param_neutral(self):
        from fastvideotagging_tpu.models.layers import mxu_aligned_mid_channels

        for cin, cout in [(64, 64), (64, 128), (256, 512), (512, 512)]:
            assert mxu_aligned_mid_channels(cin, cout) % 128 == 0
        model = get_model("r2plus1d_18_tpu", num_classes=101)
        variables = _init_shapes(model, (1, 4, 32, 32, 3))
        logits = _apply_shape(model, variables, (1, 4, 32, 32, 3))
        assert logits.shape == (1, 101)
        n_tpu = _param_count(variables)
        n_ref = _param_count(_init_shapes(
            get_model("r2plus1d_18", num_classes=101), (1, 4, 32, 32, 3)))
        # param-neutral within 5%
        assert abs(n_tpu - n_ref) / n_ref < 0.05, (n_tpu, n_ref)
        assert variables["params"]["stem_spatial"]["kernel"].shape[-1] == 128
        mid = variables["params"]["stage1_block0"]["conv1"]["spatial"]["kernel"]
        assert mid.shape[-1] % 128 == 0

    def test_forward_runs_and_train_updates_batch_stats(self):
        # Shallow (1,1,1,1) variant: same block code, fraction of the CPU
        # compile time; full-depth numerics run in the slow/TPU tiers.
        from fastvideotagging_tpu.models.r2plus1d import R2Plus1D

        model = R2Plus1D(stage_blocks=(1, 1), num_classes=5)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 32, 32, 3))
        # Always jit whole-model calls: eager op-by-op conv3d on the CPU
        # backend costs seconds of compile per op; whole-graph jit is fast.
        variables = jax.jit(model.init, static_argnames="train")(
            jax.random.PRNGKey(0), x, train=False
        )
        logits, mutated = jax.jit(
            lambda v, x: model.apply(v, x, train=True, mutable=["batch_stats"])
        )(variables, x)
        assert logits.shape == (2, 5)
        assert np.isfinite(np.asarray(logits)).all()
        before = jax.tree.leaves(variables["batch_stats"])
        after = jax.tree.leaves(mutated["batch_stats"])
        assert any(not np.allclose(b, a) for b, a in zip(before, after))


class TestP3D:
    @pytest.mark.parametrize("name,min_m,max_m", [
        ("p3d_63", 25_000_000, 35_000_000),
        ("p3d_131", 45_000_000, 60_000_000),
        ("p3d_199", 60_000_000, 90_000_000),
    ])
    def test_shapes_and_scale(self, name, min_m, max_m):
        model = get_model(name, num_classes=400)
        variables = _init_shapes(model, (1, 8, 64, 64, 3))
        logits = _apply_shape(model, variables, (1, 8, 64, 64, 3))
        assert logits.shape == (1, 400)
        assert min_m < _param_count(variables) < max_m

    def test_kinetics_shape(self):
        model = get_model("p3d_63", num_classes=400)
        variables = _init_shapes(model, (1, 32, 224, 224, 3))
        logits = _apply_shape(model, variables, (1, 32, 224, 224, 3))
        assert logits.shape == (1, 400)

    def test_forward_runs(self):
        # Shallow variant covering all three block types (A, B, C) once.
        from fastvideotagging_tpu.models.p3d import P3D

        model = P3D(stage_blocks=(3, 1), num_classes=4)
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 32, 32, 3))
        variables = jax.jit(model.init, static_argnames="train")(
            jax.random.PRNGKey(0), x, train=False
        )
        logits, _ = jax.jit(
            lambda v, x: model.apply(v, x, train=True, mutable=["batch_stats"],
                                     rngs={"dropout": jax.random.PRNGKey(2)})
        )(variables, x)
        assert logits.shape == (1, 4)
        assert np.isfinite(np.asarray(logits)).all()

    def test_every_block_has_both_factors(self):
        model = get_model("p3d_63", num_classes=10)
        variables = _init_shapes(model, (1, 4, 32, 32, 3))
        params = variables["params"]
        for key in params:
            if "block" in key:
                assert "spatial" in params[key] and "temporal" in params[key]


class TestVideoResNet3D:
    """r3d_18 / mc3_18 (Tran'18 ablation siblings; torchvision layout)."""

    def test_r3d18_shapes_and_params(self):
        model = get_model("r3d_18", num_classes=400)
        variables = _init_shapes(model, (1, 4, 32, 32, 3))
        logits = _apply_shape(model, variables, (2, 4, 32, 32, 3))
        assert logits.shape == (2, 400)
        # torchvision r3d_18 @ 400 classes: 33,371,472 params
        assert _param_count(variables) == 33_371_472

    def test_mc3_18_shapes_and_params(self):
        model = get_model("mc3_18", num_classes=400)
        variables = _init_shapes(model, (1, 4, 32, 32, 3))
        logits = _apply_shape(model, variables, (2, 4, 32, 32, 3))
        assert logits.shape == (2, 400)
        # torchvision mc3_18 @ 400 classes: 11,695,440 params
        assert _param_count(variables) == 11_695_440

    def test_mc3_preserves_time_after_stage1(self):
        # MC3's stages 2-4 are 1x3x3 with stride (1,s,s): the temporal
        # extent survives to the pool (only spatial downsampling)
        model = get_model("mc3_18", num_classes=5)
        variables = _init_shapes(model, (1, 8, 32, 32, 3))
        logits = _apply_shape(model, variables, (1, 8, 32, 32, 3))
        assert logits.shape == (1, 5)


class TestS3D:
    """S3D / S3D-G (Xie'18 separable-3D Inception; torchvision layout)."""

    def test_s3d_shapes_and_params(self):
        model = get_model("s3d", num_classes=400)
        variables = _init_shapes(model, (1, 16, 224, 224, 3))
        logits = _apply_shape(model, variables, (2, 16, 224, 224, 3))
        assert logits.shape == (2, 400)
        assert logits.dtype == jnp.float32
        # torchvision s3d @ 400 classes: 8.32M published params, exactly
        assert _param_count(variables) == 8_320_048
        # final Inception concat width (mixed5c): 384+384+128+128 = 1024
        assert variables["params"]["fc"]["kernel"].shape == (1024, 400)

    def test_s3d_small_geometry(self):
        # 112px inputs (final spatial extent != 7) run via the global-mean
        # head; T=8 -> T'=1 exercises the window-skip branch
        model = get_model("s3d", num_classes=11)
        variables = _init_shapes(model, (1, 8, 112, 112, 3))
        logits = _apply_shape(model, variables, (1, 8, 112, 112, 3))
        assert logits.shape == (1, 11)

    def test_s3d_g_gating_params(self):
        model = get_model("s3d_g", num_classes=400)
        variables = _init_shapes(model, (1, 16, 112, 112, 3))
        params = variables["params"]
        # every separable conv carries a CxC+C gate; spot-check stem + one
        # inception branch
        assert params["stem"]["gate"]["kernel"].shape == (64, 64)
        assert params["mixed5c"]["b1_sep"]["gate"]["kernel"].shape == (384, 384)
        n_gate = _param_count(variables)
        n_plain = _param_count(_init_shapes(
            get_model("s3d", num_classes=400), (1, 16, 112, 112, 3)))
        assert n_gate > n_plain

    def test_s3d_has_no_gate_params(self):
        variables = _init_shapes(get_model("s3d", num_classes=5),
                                 (1, 8, 64, 64, 3))
        flat = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
        assert not any("gate" in jax.tree_util.keystr(p) for p, _ in flat)


class TestI3D:
    """I3D (Carreira'17 inflated Inception; pytorch-i3d layout)."""

    def test_i3d_shapes_and_params(self):
        model = get_model("i3d", num_classes=400)
        variables = _init_shapes(model, (1, 16, 224, 224, 3))
        logits = _apply_shape(model, variables, (2, 16, 224, 224, 3))
        assert logits.shape == (2, 400)
        assert logits.dtype == jnp.float32
        # pytorch-i3d RGB @ 400 classes: 12.70M published params, exactly
        assert _param_count(variables) == 12_697_264
        assert variables["params"]["fc"]["kernel"].shape == (1024, 400)

    def test_i3d_small_geometry(self):
        # 64px inputs run via the global-mean head; T=8 -> T'=1 exercises
        # the window-skip branch
        model = get_model("i3d", num_classes=5)
        variables = _init_shapes(model, (1, 8, 64, 64, 3))
        logits = _apply_shape(model, variables, (1, 8, 64, 64, 3))
        assert logits.shape == (1, 5)

    def test_tf_same_padding_is_asymmetric(self):
        # k=7 s=2 on an even dim: TF pads (2, 3) — a symmetric (3, 3) pad
        # would shift the output grid by one pixel vs the DeepMind port
        from fastvideotagging_tpu.models.i3d import _same_pads

        assert _same_pads(224, 7, 2) == (2, 3)
        assert _same_pads(223, 7, 2) == (3, 3)
        assert _same_pads(8, 2, 2) == (0, 0)
        assert _same_pads(56, 3, 2) == (0, 1)
