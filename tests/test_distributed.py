"""Distributed tier on the 8-device CPU mesh (SURVEY.md §5.5).

The data-parallel contract: the SAME jitted step, fed a batch sharded over
the mesh's `data` axis, produces the same math as the single-device run —
XLA inserts the gradient psum and the global BatchNorm reductions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastvideotagging_tpu.parallel import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    make_mesh,
    replicated,
    shard_batch,
)
from tests.test_train import make_state, synth_batch, tiny_cfg
from fastvideotagging_tpu.train.loop import make_train_step



pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device CPU mesh")

def test_mesh_construction():
    mesh = make_mesh()
    assert mesh.axis_names == (DATA_AXIS, MODEL_AXIS)
    assert mesh.devices.size == len(jax.devices()) == 8

    mesh2 = make_mesh(4, 2)
    assert mesh2.devices.shape == (4, 2)

    mesh3 = make_mesh(3, 2)  # explicit subset: 6 of 8 devices
    assert mesh3.devices.shape == (3, 2)

    with pytest.raises(ValueError):
        make_mesh(16, 1)  # more than available
    with pytest.raises(ValueError):
        make_mesh(-1, 3)  # 3 does not divide 8


def test_dp_step_matches_single_device():
    cfg = tiny_cfg()
    model, state0 = make_state(cfg)
    batch = synth_batch(cfg)
    step = make_train_step(model, cfg, donate=False)

    # Single device (first CPU device).
    dev = jax.devices()[0]
    state_1 = jax.device_put(state0, dev)
    batch_1 = jax.tree.map(lambda x: jax.device_put(x, dev), batch)
    out_1, metrics_1 = step(state_1, batch_1, jax.random.PRNGKey(0))

    # 8-way data parallel over the mesh.
    mesh = make_mesh(8, 1)
    state_8 = jax.device_put(state0, replicated(mesh))
    batch_8 = shard_batch(mesh, batch)
    out_8, metrics_8 = step(state_8, batch_8, jax.random.PRNGKey(0))

    assert float(metrics_1["loss"]) == pytest.approx(
        float(metrics_8["loss"]), rel=1e-5)
    for a, b in zip(jax.tree.leaves(out_1.params), jax.tree.leaves(out_8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    # BatchNorm stats must also be global-batch (SyncBN) in both cases.
    for a, b in zip(jax.tree.leaves(out_1.batch_stats),
                    jax.tree.leaves(out_8.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_dp_multi_step_training_progresses():
    cfg = tiny_cfg()
    model, state = make_state(cfg)
    mesh = make_mesh(8, 1)
    state = jax.device_put(state, replicated(mesh))
    step = make_train_step(model, cfg)
    batch = shard_batch(mesh, synth_batch(cfg))
    losses = []
    for i in range(10):
        state, metrics = step(state, batch, jax.random.PRNGKey(0))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]


def test_data_model_mesh_step_runs():
    """Step executes on a (data=4, model=2) mesh (params replicated on model
    axis for now; channel sharding arrives with the dual-pathway config)."""
    cfg = tiny_cfg()
    model, state = make_state(cfg)
    mesh = make_mesh(4, 2)
    state = jax.device_put(state, replicated(mesh))
    step = make_train_step(model, cfg, donate=False)
    batch = shard_batch(mesh, synth_batch(cfg))
    out, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))

def test_dp_eval_matches_single_device(synthetic_dataset):
    """Multi-clip evaluation sharded over the data axis must reproduce the
    single-device video scores to float tolerance: eval has no cross-clip
    math (frozen BN stats), so only executable-level reassociation (the
    sharded program compiles separately) can move the last bits. Each
    spelling is itself bitwise-deterministic across reruns."""
    from fastvideotagging_tpu.data.pipeline import ClipDataset
    from fastvideotagging_tpu.data.ucf101 import load_video_list
    from fastvideotagging_tpu.evaluation.evaluate import evaluate_video_scores

    root, list_path = synthetic_dataset
    records = load_video_list(list_path, root=root)
    cfg = tiny_cfg()
    model, state = make_state(cfg)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    dataset = ClipDataset(records[:3], cfg.data, mode="eval")

    ref, _ = evaluate_video_scores(model, variables, dataset, cfg,
                                   clip_batch=8)
    mesh = make_mesh(8, 1)
    got, _ = evaluate_video_scores(model, variables, dataset, cfg,
                                   clip_batch=8, mesh=mesh)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)
    got2, _ = evaluate_video_scores(model, variables, dataset, cfg,
                                    clip_batch=8, mesh=mesh)
    np.testing.assert_array_equal(got2, got)  # sharded rerun IS bitwise


def test_dp_eval_falls_back_when_indivisible(synthetic_dataset, caplog):
    from fastvideotagging_tpu.data.pipeline import ClipDataset
    from fastvideotagging_tpu.data.ucf101 import load_video_list
    from fastvideotagging_tpu.evaluation.evaluate import evaluate_video_scores

    root, list_path = synthetic_dataset
    records = load_video_list(list_path, root=root)
    cfg = tiny_cfg()
    model, state = make_state(cfg)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    dataset = ClipDataset(records[:1], cfg.data, mode="eval")
    mesh = make_mesh(8, 1)
    ref, _ = evaluate_video_scores(model, variables, dataset, cfg,
                                   clip_batch=8)
    got, _ = evaluate_video_scores(model, variables, dataset, cfg,
                                   clip_batch=3, mesh=mesh)  # 3 % 8 != 0
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-7)


def test_local_batch_rows_and_global_put_match_device_put():
    """Single-process: local_batch_rows covers every row and global_batch_put
    builds arrays equal (values + sharding) to the plain shard_batch path —
    the multi-host loader assembly degenerates to device_put correctly."""
    from fastvideotagging_tpu.parallel.mesh import (
        global_batch_put, local_batch_rows,
    )

    mesh = make_mesh(4, 2)
    sh = batch_sharding(mesh)
    rows = local_batch_rows(sh, 8)
    assert rows == list(range(8))

    batch = {
        "frames": np.arange(8 * 6, dtype=np.uint8).reshape(8, 2, 3),
        "labels": np.arange(8, dtype=np.int32),
        "flips": np.asarray([i % 2 == 0 for i in range(8)]),
    }
    got = global_batch_put(batch, sh, 8, rows)
    ref = shard_batch(mesh, batch)
    for k in batch:
        np.testing.assert_array_equal(np.asarray(got[k]), np.asarray(ref[k]))
        assert got[k].sharding.is_equivalent_to(ref[k].sharding, got[k].ndim)


def test_global_batch_put_row_mapping_per_shard():
    """Row->shard mapping: every data shard of the assembled array holds the
    global rows its mesh position owns (the invariant the per-host loaders
    rely on when each host supplies a different row subset)."""
    from fastvideotagging_tpu.parallel.mesh import global_batch_put

    mesh = make_mesh(8, 1)
    sh = batch_sharding(mesh)
    rows = list(range(8))
    # local buffer value == 10 * global row index
    local = {"labels": (10 * np.arange(8)).astype(np.int32)}
    got = global_batch_put(local, sh, 8, rows)["labels"]
    for shard in got.addressable_shards:
        row = shard.index[0].start or 0
        np.testing.assert_array_equal(np.asarray(shard.data),
                                      [10 * row])
