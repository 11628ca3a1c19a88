"""Native C++ PJRT serving runner (SURVEY.md L1 native tier).

Hermetic tier: the runner builds from source against the PJRT C API header
and handles argument/error paths cleanly. The full execute path needs a PJRT
plugin .so; the only one on this box is the TPU tunnel plugin and the tunnel
allows ONE client at a time, so the end-to-end parity test (export StableHLO
from a CPU-backend parent -> compile+run in the native process on the TPU ->
bitwise-close to the in-process jax scores) is opt-in:

    FVT_NATIVE_SERVING=1 python -m pytest tests/test_native_pjrt.py -q

(verified on v5e: max abs diff 6e-4 on f32 scores).
"""

import os
import subprocess

import numpy as np
import pytest

from fastvideotagging_tpu.native import pjrt


@pytest.fixture(scope="module")
def runner():
    try:
        return pjrt.build_runner()
    except FileNotFoundError as e:  # no PJRT header on this box
        pytest.skip(str(e))
    except subprocess.CalledProcessError as e:
        pytest.fail(f"pjrt_runner failed to compile:\n{e.stderr.decode()}")


def test_builds_and_reports_usage(runner):
    out = subprocess.run([runner, "--help"], capture_output=True, text=True)
    assert out.returncode == 0
    assert "--plugin" in out.stdout and "--module" in out.stdout


def test_clean_errors(runner, tmp_path):
    # missing required args
    r = subprocess.run([runner], capture_output=True, text=True)
    assert r.returncode != 0 and "--plugin" in r.stderr
    # nonexistent plugin
    r = subprocess.run(
        [runner, "--plugin", "/no/such.so", "--module", "/no/mod"],
        capture_output=True, text=True)
    assert r.returncode != 0 and "dlopen" in r.stderr
    # bad input spec
    mod = tmp_path / "m.mlir"
    mod.write_text("module {}")
    r = subprocess.run(
        [runner, "--plugin", "/no/such.so", "--module", str(mod),
         "--input", "garbage"],
        capture_output=True, text=True)
    assert r.returncode != 0


def test_plugin_client_options_shape():
    opts = pjrt.plugin_client_options("axon")
    # On this machine the axon registration carries pool metadata; elsewhere
    # an empty dict is valid (plugins that need no options).
    assert isinstance(opts, dict)
    for k, v in opts.items():
        assert isinstance(k, str) and isinstance(v, (str, int))


@pytest.mark.skipif(not os.environ.get("FVT_NATIVE_SERVING"),
                    reason="needs exclusive TPU tunnel access (one client)")
def test_native_runner_matches_jax_scores(runner, tmp_path):
    import jax
    import jax.numpy as jnp

    from fastvideotagging_tpu.config import (
        ClipSamplerConfig, DataConfig, ExperimentConfig, ModelConfig,
    )
    from fastvideotagging_tpu.evaluation.serving import (
        export_serving_stablehlo, make_serving_fn,
    )
    from fastvideotagging_tpu.models import model_from_config

    cfg = ExperimentConfig(
        model=ModelConfig(name="tiny3d", num_classes=5, multilabel=True,
                          compute_dtype="float32"),
        data=DataConfig(source_hw=(40, 52), resize_hw=(36, 44),
                        crop_hw=(32, 32),
                        sampler=ClipSamplerConfig(clip_len=4)))
    model = model_from_config(cfg.model)
    x0 = jnp.zeros((1, 4, 32, 32, 3), jnp.float32)
    variables = jax.jit(model.init, static_argnames="train")(
        jax.random.PRNGKey(0), x0, train=False)
    mod_path = str(tmp_path / "serve.stablehlo")
    export_serving_stablehlo(cfg, variables, clip_batch=2, path=mod_path,
                             platforms=("tpu",))
    clips = np.random.default_rng(0).integers(
        0, 255, (2, 4, 40, 52, 3)).astype(np.uint8)
    ref = np.asarray(jax.jit(make_serving_fn(cfg, variables))(
        jnp.asarray(clips)))
    outs = pjrt.run_serving(mod_path, [clips], str(tmp_path))
    np.testing.assert_allclose(outs[0], ref, rtol=3e-2, atol=3e-2)
