"""Explicit shard_map DP step == declarative GSPMD step (SURVEY.md N4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastvideotagging_tpu.models import get_model
from fastvideotagging_tpu.parallel import make_mesh, replicated, shard_batch
from fastvideotagging_tpu.train import lr as lr_lib
from fastvideotagging_tpu.train.loop import make_train_step
from fastvideotagging_tpu.train.shardmap_step import make_train_step_shardmap
from fastvideotagging_tpu.train.state import create_train_state
from tests.test_train import synth_batch, tiny_cfg

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device CPU mesh")


def test_shardmap_step_matches_gspmd_step():
    cfg = tiny_cfg()
    mesh = make_mesh(8, 1)

    # shard_map path: BN psyncs stats over the data axis explicitly.
    model_sm = get_model("tiny3d", num_classes=3, dtype=jnp.float32,
                         bn_axis_name="data")
    # GSPMD path: plain BN — global stats emerge from the partitioner.
    model_gs = get_model("tiny3d", num_classes=3, dtype=jnp.float32)

    tx = lr_lib.make_optimizer(cfg.train, steps_per_epoch=10)
    sample = jnp.zeros((1, 4, 32, 32, 3), jnp.float32)
    state = create_train_state(model_gs, tx, jax.random.PRNGKey(0), sample)
    batch = synth_batch(cfg)

    state_gs = jax.device_put(state, replicated(mesh))
    batch_sh = shard_batch(mesh, batch)
    gspmd_step = make_train_step(model_gs, cfg, donate=False)
    out_gs, m_gs = gspmd_step(state_gs, batch_sh, jax.random.PRNGKey(1))

    sm_step = make_train_step_shardmap(model_sm, cfg, mesh)
    state_sm = jax.device_put(state, replicated(mesh))
    out_sm, m_sm = sm_step(state_sm, batch_sh, jax.random.PRNGKey(1))

    assert float(m_sm["loss"]) == pytest.approx(float(m_gs["loss"]), rel=1e-5)
    assert float(m_sm["top1"]) == pytest.approx(float(m_gs["top1"]), rel=1e-6)
    for a, b in zip(jax.tree.leaves(out_sm.params),
                    jax.tree.leaves(out_gs.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree.leaves(out_sm.batch_stats),
                    jax.tree.leaves(out_gs.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_shardmap_step_trains():
    cfg = tiny_cfg()
    mesh = make_mesh(8, 1)
    model = get_model("tiny3d", num_classes=3, dtype=jnp.float32,
                      bn_axis_name="data")
    tx = lr_lib.make_optimizer(cfg.train, steps_per_epoch=10)
    sample = jnp.zeros((1, 4, 32, 32, 3), jnp.float32)
    state = jax.device_put(
        create_train_state(model, tx, jax.random.PRNGKey(0), sample),
        replicated(mesh))
    step = make_train_step_shardmap(model, cfg, mesh)
    batch = shard_batch(mesh, synth_batch(cfg))
    losses = []
    for _ in range(8):
        state, metrics = step(state, batch, jax.random.PRNGKey(0))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]
