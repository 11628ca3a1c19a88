"""Literal BASELINE.json config checks (the driver's five configs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastvideotagging_tpu.config import PRESETS
from fastvideotagging_tpu.models import get_model, heads


def test_b7_c3d_batch1_forward_sigmoid_loss():
    """[B:7] 'C3D on one UCF101 clip: 16x112x112, batch 1, CPU forward +
    sigmoid loss' — executed literally."""
    cfg = PRESETS["c3d_ucf101_smoke"]
    assert cfg.model.name == "c3d" and cfg.model.multilabel
    assert cfg.train.batch_size == 1
    t = cfg.data.sampler.clip_len
    ch, cw = cfg.data.crop_hw
    assert (t, ch, cw) == (16, 112, 112)

    model = get_model(cfg.model.name, num_classes=cfg.model.num_classes,
                      dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, t, ch, cw, 3)) * 0.1
    variables = jax.jit(model.init, static_argnames="train")(
        jax.random.PRNGKey(0), x, train=False)
    logits = jax.jit(lambda v, x: model.apply(v, x, train=False))(variables, x)
    assert logits.shape == (1, 101)
    multihot = jnp.zeros((1, 101)).at[0, 7].set(1.0)
    loss = heads.sigmoid_bce(logits, multihot)
    assert np.isfinite(float(loss)) and float(loss) > 0


@pytest.mark.parametrize("preset", sorted(PRESETS))
def test_all_presets_constructible(preset):
    """Every BASELINE preset builds its model and has consistent geometry."""
    cfg = PRESETS[preset]
    model = get_model(cfg.model.name, num_classes=cfg.model.num_classes)
    t = cfg.data.sampler.clip_len
    ch, cw = cfg.data.crop_hw
    x = jnp.zeros((1, t, ch, cw, 3), jnp.float32)
    out = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), x, train=False))
    logits = jax.eval_shape(
        lambda v: model.apply(v, x, train=False, mutable=["batch_stats"]),
        out)
    shape = (logits[0] if isinstance(logits, tuple) else logits).shape
    assert shape == (1, cfg.model.num_classes)
