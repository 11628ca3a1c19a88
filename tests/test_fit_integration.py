"""End-to-end integration: fit() on the synthetic dataset, resume, eval hook.

This is the rebuild of the reference's de-facto acceptance test (the train
script converging) as a real test (SURVEY.md §5.4).
"""

import os

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
from fastvideotagging_tpu.train.fit import fit


def fit_cfg(tmp_path, epochs=2, resume=False):
    return ExperimentConfig(
        model=ModelConfig(name="tiny3d", num_classes=3, compute_dtype="float32"),
        data=DataConfig(source_hw=(48, 64), resize_hw=(40, 56), crop_hw=(32, 32),
                        sampler=ClipSamplerConfig(clip_len=4, stride=2),
                        num_workers=2, random_flip=False),
        train=TrainConfig(batch_size=3, num_epochs=epochs, base_lr=0.05,
                          weight_decay=0.0, log_every=1,
                          checkpoint_dir=str(tmp_path / "ckpt"), resume=resume),
        # batch 3 does not divide the 8-device test mesh; run single-device
        # (DP fit coverage lives in tests/test_distributed.py)
        parallel=ParallelConfig(data_parallel=1, model_parallel=1),
    )


@pytest.fixture()
def records(synthetic_dataset):
    root, list_path = synthetic_dataset
    return load_video_list(list_path, root=root)


def test_fit_runs_and_checkpoints(synthetic_dataset, records, tmp_path):
    cfg = fit_cfg(tmp_path, epochs=2)
    metrics_path = str(tmp_path / "metrics.jsonl")

    eval_calls = []

    def eval_fn(state, epoch):
        eval_calls.append(epoch)
        return {"top1": 0.0}

    state = fit(cfg, records, metrics_path=metrics_path, eval_fn=eval_fn)
    # 6 videos / batch 3 = 2 steps/epoch * 2 epochs
    assert int(state.step) == 4
    assert eval_calls == [0, 1]
    assert os.path.exists(metrics_path)
    with open(metrics_path) as f:
        lines = [line for line in f if line.strip()]
    assert len(lines) >= 4
    # checkpoint exists
    assert any(os.scandir(str(tmp_path / "ckpt")))


def test_fit_rejects_dataset_smaller_than_batch(synthetic_dataset, records,
                                                tmp_path):
    import dataclasses

    cfg = fit_cfg(tmp_path, epochs=1)
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, batch_size=len(records) + 1))
    with pytest.raises(ValueError, match="batch_size"):
        fit(cfg, records)


def test_fit_from_pretrained_variables(synthetic_dataset, records, tmp_path):
    """fit(init_variables=...) — the reference's pretrained= fine-tune path."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fastvideotagging_tpu.models import model_from_config

    cfg = fit_cfg(tmp_path, epochs=1)
    model = model_from_config(cfg.model)
    variables = jax.jit(model.init, static_argnames="train")(
        jax.random.PRNGKey(123), jnp.zeros((1, 4, 32, 32, 3), jnp.float32),
        train=False)
    variables = jax.tree.map(np.asarray, variables)

    # num_epochs=0: returns the initialized state untouched -> must equal
    # the provided pretrained tree exactly.
    import dataclasses

    cfg0 = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, num_epochs=0))
    state = fit(cfg0, records, init_variables=variables)
    for a, b in zip(jax.tree.leaves(variables["params"]),
                    jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # and a real epoch trains FROM it without error
    state = fit(cfg, records, init_variables=variables)
    assert int(state.step) == 2

    # structure mismatch raises
    bad = {"params": {"nope": variables["params"]}, "batch_stats": {}}
    with pytest.raises(ValueError, match="tree mismatch"):
        fit(cfg0, records, init_variables=bad)


def test_fit_resume_continues(synthetic_dataset, records, tmp_path):
    cfg = fit_cfg(tmp_path, epochs=1)
    state1 = fit(cfg, records)
    assert int(state1.step) == 2

    cfg2 = fit_cfg(tmp_path, epochs=3, resume=True)
    state2 = fit(cfg2, records)
    # resumed from epoch 1, ran epochs 1..2 -> 4 more steps
    assert int(state2.step) == 6
