"""Test harness config.

Tests run hermetically on the CPU backend with a forced 8-device mesh — the
JAX-idiomatic fake backend for multi-device testing (SURVEY.md §5.5). The
experimental axon TPU backend is exercised separately by bench.py and the
driver's compile checks; set FVT_TEST_PLATFORM=tpu to run tests on the chip.
"""

import os

_platform = os.environ.get("FVT_TEST_PLATFORM", "cpu")
if _platform == "tpu":
    _platform = "axon"  # this box's TPU PJRT plugin is named 'axon'
os.environ["JAX_PLATFORMS"] = _platform  # for any subprocesses

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# jax.config, not os.environ: the jaxtyping pytest plugin imports jax before
# this conftest runs, and JAX_PLATFORMS is captured at import time — env-var
# edits here are silently ignored and the suite would run through the axon
# TPU tunnel (minutes per compile). The shell exports JAX_PLATFORMS=axon;
# FVT_TEST_PLATFORM=tpu restores on-chip testing deliberately.
jax.config.update("jax_platforms", _platform)
if _platform == "cpu":
    # 8 virtual CPU devices — the JAX-idiomatic fake backend for multi-chip
    # tests. (--xla_force_host_platform_device_count is dead in jax 0.9; the
    # supported knob is this config.)
    jax.config.update("jax_num_cpu_devices", 8)

# Persistent compilation cache: XLA CPU conv3d compiles are seconds each and
# dominate test wall-clock; cache them across runs.
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


@pytest.fixture(scope="session")
def synthetic_dataset(tmp_path_factory):
    """A tiny on-disk video dataset shared across the session."""
    from fastvideotagging_tpu.data import synthetic

    root = tmp_path_factory.mktemp("synth")
    list_path = synthetic.make_dataset(
        str(root), num_classes=3, videos_per_class=2, num_frames=24,
        height=48, width=64,
    )
    return str(root), list_path


@pytest.fixture()
def rng():
    return np.random.Generator(np.random.Philox(key=np.uint64(1234)))
