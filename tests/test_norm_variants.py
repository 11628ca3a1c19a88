"""Norm-variant acceptance (VERDICT r1 item 3: BN-lite / GroupNorm option).

'frozen' removes the batch-stats passes from the train step (+15% measured on
v5e — the BN-lite lever from ROADMAP); 'group' is the batch-independent
alternative. Both must (a) keep the stats semantics they claim and (b) still
converge on the synthetic acceptance task; 'batch' keeps the exact variable
tree it always had (checkpoint/torch-import compat).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastvideotagging_tpu.config import (
    ClipSamplerConfig,
    DataConfig,
    ExperimentConfig,
    ModelConfig,
    ParallelConfig,
    TrainConfig,
)
from fastvideotagging_tpu.data.ucf101 import load_video_list
from fastvideotagging_tpu.models import get_model
from fastvideotagging_tpu.train.fit import fit
from fastvideotagging_tpu.train.loop import make_sample_batch, make_train_step
from fastvideotagging_tpu.train.state import create_train_state
from fastvideotagging_tpu.train import lr as lr_lib


def _cfg(norm, ckpt_dir, epochs=25, base_lr=0.03, resume=False):
    return ExperimentConfig(
        model=ModelConfig(name="tiny3d", num_classes=3,
                          compute_dtype="float32", norm=norm),
        data=DataConfig(source_hw=(48, 64), resize_hw=(40, 56),
                        crop_hw=(32, 32),
                        sampler=ClipSamplerConfig(clip_len=8, stride=2),
                        num_workers=2, random_flip=False),
        train=TrainConfig(batch_size=6, num_epochs=epochs, base_lr=base_lr,
                          weight_decay=0.0, log_every=100,
                          checkpoint_dir=str(ckpt_dir), resume=resume),
        parallel=ParallelConfig(data_parallel=1, model_parallel=1),
    )


def _one_step(norm):
    cfg = ExperimentConfig(
        model=ModelConfig(name="tiny3d", num_classes=3, norm=norm,
                          compute_dtype="float32"),
        data=DataConfig(source_hw=(32, 44), resize_hw=(32, 44),
                        crop_hw=(32, 32),
                        sampler=ClipSamplerConfig(clip_len=4)),
        train=TrainConfig(batch_size=2),
    )
    model = get_model("tiny3d", num_classes=3, norm=norm, dtype=jnp.float32)
    tx = lr_lib.make_optimizer(cfg.train, steps_per_epoch=10)
    sample = jnp.zeros((1, 4, 32, 32, 3), jnp.float32)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), sample)
    step = make_train_step(model, cfg, donate=False)
    batch = jax.tree.map(np.asarray, make_sample_batch(cfg))
    batch["frames"] = np.random.default_rng(0).integers(
        0, 255, batch["frames"].shape).astype(np.uint8)
    new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
    return state, new_state, metrics


def test_frozen_keeps_running_stats_fixed():
    state, new_state, metrics = _one_step("frozen")
    assert np.isfinite(float(metrics["loss"]))
    # Same batch_stats tree as 'batch' (checkpoint-compatible) ...
    assert jax.tree_util.tree_structure(
        state.batch_stats) == jax.tree_util.tree_structure(
        get_model("tiny3d", num_classes=3, dtype=jnp.float32).init(
            jax.random.PRNGKey(0), jnp.zeros((1, 4, 32, 32, 3)), train=False
        )["batch_stats"])
    # ... but the train step must NOT move the running statistics.
    for old, new in zip(jax.tree.leaves(state.batch_stats),
                        jax.tree.leaves(new_state.batch_stats)):
        np.testing.assert_array_equal(np.asarray(old), np.asarray(new))
    # Params did train.
    moved = [not np.allclose(np.asarray(a), np.asarray(b))
             for a, b in zip(jax.tree.leaves(state.params),
                             jax.tree.leaves(new_state.params))]
    assert any(moved)


def test_batch_updates_running_stats():
    state, new_state, _ = _one_step("batch")
    changed = [not np.array_equal(np.asarray(a), np.asarray(b))
               for a, b in zip(jax.tree.leaves(state.batch_stats),
                               jax.tree.leaves(new_state.batch_stats))]
    assert any(changed)


def test_group_has_no_batch_stats_and_is_batch_independent():
    state, new_state, metrics = _one_step("group")
    assert np.isfinite(float(metrics["loss"]))
    assert not jax.tree.leaves(state.batch_stats)  # empty collection

    # train == eval numerics (no stats), and per-sample results don't depend
    # on the rest of the batch.
    model = get_model("tiny3d", num_classes=3, norm="group", dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(1).normal(
        size=(4, 4, 16, 16, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    full = np.asarray(model.apply(variables, x, train=False))
    half = np.asarray(model.apply(variables, x[:2], train=False))
    np.testing.assert_allclose(full[:2], half, rtol=1e-5, atol=1e-6)


def _eval_top1(cfg, state, records):
    from fastvideotagging_tpu.data.pipeline import ClipDataset
    from fastvideotagging_tpu.evaluation.evaluate import evaluate
    from fastvideotagging_tpu.models import model_from_config

    model = model_from_config(cfg.model)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    ds = ClipDataset(records, cfg.data, mode="eval")
    return evaluate(model, variables, ds, cfg, clip_batch=4)["top1"]


def test_group_converges_from_scratch(synthetic_dataset, tmp_path):
    root, list_path = synthetic_dataset
    records = load_video_list(list_path, root=root)
    # GroupNorm trains from scratch (needs a hotter lr than BN at this scale).
    cfg = _cfg("group", tmp_path / "ckpt_group", epochs=25, base_lr=0.1)
    state = fit(cfg, records)
    assert _eval_top1(cfg, state, records) >= 0.8


def test_frozen_converges_as_finetune(synthetic_dataset, tmp_path):
    """Frozen BN is a fine-tuning device (it presumes trained statistics):
    from-scratch it stalls (measured: <=0.67 top-1 at any lr in {0.03..0.3}),
    so the acceptance is the real usage — train 'batch', continue 'frozen'
    via checkpoint resume (same variable tree), and require accuracy to hold
    >= the acceptance bar."""
    root, list_path = synthetic_dataset
    records = load_video_list(list_path, root=root)
    ckpt_dir = tmp_path / "ckpt_two_phase"
    fit(_cfg("batch", ckpt_dir, epochs=12), records)
    cfg2 = _cfg("frozen", ckpt_dir, epochs=25, resume=True)
    state = fit(cfg2, records)
    assert int(state.step) == 25  # 12 batch epochs + 13 frozen epochs
    assert _eval_top1(cfg2, state, records) >= 0.8


def test_scaleonly_has_no_stats_and_trains_one_step():
    state, new_state, metrics = _one_step("scaleonly")
    assert np.isfinite(float(metrics["loss"]))
    assert not jax.tree.leaves(state.batch_stats)  # stats-free by design
    moved = [not np.allclose(np.asarray(a), np.asarray(b))
             for a, b in zip(jax.tree.leaves(state.params),
                             jax.tree.leaves(new_state.params))]
    assert any(moved)


def test_scaleonly_train_equals_eval():
    # no statistics anywhere -> train-mode and eval-mode forward agree
    model = get_model("r2plus1d_18", num_classes=5, norm="scaleonly",
                      dtype=jnp.float32, dropout=0.0)
    x = jnp.asarray(np.random.default_rng(2).normal(
        size=(2, 4, 32, 32, 3)).astype(np.float32))
    variables = jax.jit(model.init, static_argnames="train")(
        jax.random.PRNGKey(0), x, train=False)
    yt = np.asarray(jax.jit(
        lambda v, x: model.apply(v, x, train=True),
    )(variables, x))
    ye = np.asarray(jax.jit(
        lambda v, x: model.apply(v, x, train=False),
    )(variables, x))
    np.testing.assert_allclose(yt, ye, rtol=1e-6, atol=1e-6)


def test_scaleonly_blocks_start_as_identity():
    """SkipInit: at init every residual branch's final scale is zero, so the
    stats-free deep net starts as a shallow stack — the property that makes
    from-scratch training work where frozen-BN stalls."""
    model = get_model("r2plus1d_18", num_classes=5, norm="scaleonly",
                      dtype=jnp.float32, dropout=0.0)
    x = jnp.zeros((1, 4, 32, 32, 3), jnp.float32)
    params = jax.jit(model.init, static_argnames="train")(
        jax.random.PRNGKey(0), x, train=False)["params"]
    for block in ("stage1_block0", "stage3_block1"):
        assert float(np.abs(params[block]["bn2"]["scale"]).max()) == 0.0
        assert float(np.abs(params[block]["bn1"]["scale"]).min()) == 1.0


def test_scaleonly_converges_from_scratch(synthetic_dataset, tmp_path):
    """The acceptance frozen-BN cannot pass (from-scratch it stalls at any
    lr — see test_frozen_converges_as_finetune): scaleonly + WS + SkipInit
    must train from scratch like 'batch'/'group' do. The full-model parity
    artifact is benchmarks/ACCURACY_HARD_SCALEONLY.json (real r2plus1d_18_tpu
    on the 50-class hard benchmark)."""
    root, list_path = synthetic_dataset
    records = load_video_list(list_path, root=root)
    cfg = _cfg("scaleonly", tmp_path / "ckpt_so", epochs=25, base_lr=0.1)
    state = fit(cfg, records)
    assert _eval_top1(cfg, state, records) >= 0.8


def test_unsupported_models_reject_norm_variants():
    for name in ("c3d", "p3d_63", "slowfast_r2plus1d"):
        with pytest.raises(ValueError, match="norm='batch'"):
            get_model(name, num_classes=5, norm="group")
    # default 'batch' still constructs
    assert get_model("c3d", num_classes=5, norm="batch") is not None


def test_r2plus1d_supports_all_norms():
    for norm in ("batch", "frozen", "group", "scaleonly"):
        model = get_model("r2plus1d_18", num_classes=5, norm=norm,
                          dtype=jnp.float32, dropout=0.0)
        x = jnp.zeros((1, 4, 32, 32, 3), jnp.float32)
        variables = jax.jit(model.init, static_argnames="train")(
            jax.random.PRNGKey(0), x, train=False)
        y = jax.jit(lambda v, x: model.apply(v, x, train=False))(variables, x)
        assert y.shape == (1, 5)
        has_stats = bool(jax.tree.leaves(variables.get("batch_stats", {})))
        assert has_stats == (norm not in ("group", "scaleonly"))


def test_recorded_scaleonly_benchmark_meets_threshold():
    """The checked-in full-scale scaleonly result: r2plus1d_18_tpu with
    norm='scaleonly' (WS + SkipInit, stats-free) trains from scratch to
    parity with batch norm on the 50-class hard benchmark — measured
    0.975 top-1 / 0.986 mAP vs batch's 0.98 (ACCURACY_HARD_TPU_VARIANT).
    Step-time it is NEUTRAL (SCALEONLY_STEP.json, PERF.md ROUND-4b)."""
    import json
    import os

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "benchmarks",
        "ACCURACY_HARD_SCALEONLY.json")
    if not os.path.exists(path):
        pytest.skip("ACCURACY_HARD_SCALEONLY.json not recorded yet")
    with open(path) as f:
        r = json.load(f)
    assert r["model"] == "r2plus1d_18_tpu" and r["norm"] == "scaleonly"
    assert r["top1"] >= 0.9, r
    assert r["mAP"] >= 0.9, r
