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


def test_serve_mode_arg_validation(runner, tmp_path):
    mod = tmp_path / "m.mlir"
    mod.write_text("module {}")
    base = [runner, "--plugin", "/no/such.so", "--module", str(mod)]
    # --serve without input specs
    r = subprocess.run(base + ["--serve"], capture_output=True, text=True)
    assert r.returncode != 0 and "--serve-input" in r.stderr
    # --serve is exclusive with --input/--bench
    r = subprocess.run(
        base + ["--serve", "--serve-input", "u8:1,2", "--bench", "8"],
        capture_output=True, text=True)
    assert r.returncode != 0 and "--serve" in r.stderr
    # --help documents the daemon protocol
    h = subprocess.run([runner, "--help"], capture_output=True, text=True)
    assert "--serve" in h.stdout and "stdin" in h.stdout


def test_native_tagger_needs_artifact_dir(tmp_path):
    from fastvideotagging_tpu.evaluation.native_tagger import NativeTagger

    with pytest.raises(FileNotFoundError, match="cli.export"):
        NativeTagger(str(tmp_path))


def test_serve_cli_native_flag_validation(tmp_path):
    from fastvideotagging_tpu.cli import serve as cli_serve

    with pytest.raises(SystemExit, match="--artifacts"):
        cli_serve.main(["--engine", "native"])
    with pytest.raises(SystemExit, match="export"):
        cli_serve.main(["--engine", "native", "--artifacts", str(tmp_path),
                        "--int8"])
    with pytest.raises(SystemExit, match="--weights"):
        cli_serve.main(["--engine", "jax"])


@pytest.mark.skipif(not os.environ.get("FVT_NATIVE_SERVING"),
                    reason="needs exclusive TPU tunnel access (one client)")
def test_native_daemon_tagger_matches_inprocess(runner, tmp_path,
                                                synthetic_dataset):
    """The full native serving chain: export-CLI artifacts -> pjrt_runner
    --serve daemon on the TPU -> NativeTagger front-end; video scores match
    the in-process (CPU-jax) Tagger to cross-platform tolerance, across
    multiple requests through ONE compiled daemon."""
    import jax
    import jax.numpy as jnp

    from fastvideotagging_tpu.cli.export import export_artifacts
    from fastvideotagging_tpu.config import (
        ClipSamplerConfig, DataConfig, ExperimentConfig, ModelConfig,
    )
    from fastvideotagging_tpu.data.ucf101 import load_video_list
    from fastvideotagging_tpu.evaluation.native_tagger import NativeTagger
    from fastvideotagging_tpu.evaluation.tagger import Tagger
    from fastvideotagging_tpu.models import model_from_config

    root, list_path = synthetic_dataset
    records = load_video_list(list_path, root=root)
    cfg = ExperimentConfig(
        model=ModelConfig(name="tiny3d", num_classes=3, multilabel=True,
                          dropout=0.0, compute_dtype="float32"),
        data=DataConfig(resize_hw=(40, 56), crop_hw=(32, 32),
                        sampler=ClipSamplerConfig(clip_len=4, stride=2,
                                                  eval_mode="dense")))
    model = model_from_config(cfg.model)
    variables = jax.jit(model.init, static_argnames="train")(
        jax.random.PRNGKey(0), jnp.zeros((1, 4, 32, 32, 3), jnp.float32),
        train=False)

    art = str(tmp_path / "art")
    export_artifacts(cfg, variables, art, clip_batch=2, fmt="stablehlo",
                     platforms=("tpu",), tag_names=["a", "b", "c"])

    ref_tagger = Tagger(cfg, variables, ["a", "b", "c"], clip_batch=2)
    with NativeTagger(art) as nt:
        assert nt.tag_names == ["a", "b", "c"]
        for rec in records[:3]:  # several videos through ONE daemon
            ref = ref_tagger.video_scores(rec.path)
            got = nt.video_scores(rec.path)
            np.testing.assert_allclose(got, ref, rtol=3e-2, atol=3e-2)
        # client-side shape validation
        with pytest.raises(ValueError, match="shape"):
            nt.server.request([np.zeros((1, 1), np.uint8)])
        # daemon-side fault isolation: a bad request line answers an error
        # JSON and the daemon still serves the next real request
        import json as _json
        nt.server._proc.stdin.write("/no/such/file.bin\n")
        nt.server._proc.stdin.flush()
        reply = _json.loads(nt.server._proc.stdout.readline())
        assert "error" in reply
        got = nt.video_scores(records[0].path)
        assert got.shape == (3,)
