"""Utility coverage: layout adapters, StepTimer, metrics logger."""

import json

import jax.numpy as jnp
import numpy as np

from fastvideotagging_tpu.train.metrics import RunningMean
from fastvideotagging_tpu.utils.layout import ncthw_to_nthwc, nthwc_to_ncthw
from fastvideotagging_tpu.utils.logging import MetricsLogger
from fastvideotagging_tpu.utils.profiling import StepTimer


def test_layout_roundtrip():
    x = jnp.arange(2 * 3 * 4 * 5 * 6).reshape(2, 3, 4, 5, 6)
    y = ncthw_to_nthwc(x)
    assert y.shape == (2, 4, 5, 6, 3)
    np.testing.assert_array_equal(np.asarray(nthwc_to_ncthw(y)), np.asarray(x))


def test_running_mean():
    m = RunningMean()
    assert np.isnan(m.value)
    m.update(1.0, 1.0)
    m.update(3.0, 3.0)
    assert m.value == 2.5
    m.reset()
    assert np.isnan(m.value)


def test_step_timer_counts():
    t = StepTimer(warmup=2, sync_every=3)
    x = jnp.ones((2,))
    for _ in range(11):
        t.step(x)
    assert t.timed_steps == 9
    assert t.seconds_per_step >= 0.0


def test_metrics_logger_jsonl(tmp_path):
    path = str(tmp_path / "m.jsonl")
    log = MetricsLogger(path)
    log.log(1, loss=0.5, top1=0.25)
    log.log(2, loss=0.4)
    log.close()
    rows = [json.loads(line) for line in open(path)]
    assert rows[0]["step"] == 1 and rows[0]["loss"] == 0.5
    assert rows[1]["step"] == 2
