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

import json
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
        # the raw line above consumed a daemon-side request id the client
        # never issued — resync the client's counter with it
        nt.server._req_id += 1
        got = nt.video_scores(records[0].path)
        assert got.shape == (3,)


# ---------------------------------------------------------------------------
# Pipelined client protocol (hermetic): NativeServer.request_many against a
# FAKE daemon speaking the exact line protocol — ordering, file cleanup, and
# desync protection are client-side logic that needs no PJRT plugin.

_FAKE_DAEMON = r'''
import json, os, sys
args = sys.argv[1:]
out_prefix = args[args.index("--output") + 1] if "--output" in args else "out"
sys.stderr.write("ready\n"); sys.stderr.flush()
rid = 0
import numpy as np
for line in sys.stdin:
    paths = line.split()
    if not paths:
        continue
    i = rid; rid += 1
    try:
        arr = np.fromfile(paths[0], np.uint8)
    except OSError:
        print(json.dumps({"request": i, "error": "cannot read input 0"}),
              flush=True)
        continue
    if arr.size and arr[0] == 255:  # poison value -> soft error reply
        print(json.dumps({"request": i, "error": "poisoned request"}),
              flush=True)
        continue
    out = arr.astype(np.float32) * 2.0
    f = f"{out_prefix}.req{i}.0"
    out.tofile(f)
    print(json.dumps({"request": i, "outputs": [
        {"file": f, "dtype": "f32", "shape": [int(arr.size)],
         "bytes": int(out.nbytes)}]}), flush=True)
'''


def _install_fake_runner(tmp_path, monkeypatch, script) -> None:
    """Point build_runner at a shell wrapper around a fake-daemon script."""
    import sys

    fake = tmp_path / "fake_daemon.py"
    fake.write_text(script)
    wrapper = tmp_path / "fake_runner"
    wrapper.write_text(f"#!/bin/sh\nexec {sys.executable} {fake} \"$@\"\n")
    wrapper.chmod(0o755)
    monkeypatch.setattr(pjrt, "build_runner", lambda force=False: str(wrapper))


_SCORER_SAMPLER = {"clip_len": 4, "stride": 2, "eval_mode": "dense",
                   "num_eval_clips": 10}


def _write_scorer_artifacts(tmp_path) -> str:
    """An export-CLI-shaped artifact dir matching _FAKE_SCORER's contract."""
    art = tmp_path / "art"
    art.mkdir()
    (art / "meta.json").write_text(json.dumps({
        "model": "fake", "num_classes": 3, "int8": False,
        "input": {"shape": [2, 4, 40, 56, 3]}, "sampler": _SCORER_SAMPLER,
        "tag_names": ["a", "b", "c"]}))
    (art / "serving.stablehlo").write_text("module {}")
    return str(art)


def _scorer_math(clips_u8, nclips):
    """_FAKE_SCORER's scoring function, in-process (the parity reference)."""
    flat = clips_u8.reshape(clips_u8.shape[0], -1)
    out = np.stack([flat.mean(1) / 255.0, flat.min(1) / 255.0,
                    flat.max(1) / 255.0], 1).astype(np.float32)
    return out[:nclips]


@pytest.fixture
def fake_server(tmp_path, monkeypatch):
    _install_fake_runner(tmp_path, monkeypatch, _FAKE_DAEMON)
    server = pjrt.NativeServer(
        "unused.mlir", [((4,), np.uint8)], str(tmp_path / "wd"),
        plugin="fake.so", client_options={}, pipeline=2)
    yield server
    server.close()


def test_request_many_ordered_and_cleans_up(fake_server):
    batches = [[np.arange(4, dtype=np.uint8) + i] for i in range(7)]
    outs = list(fake_server.request_many(iter(batches), depth=3))
    assert len(outs) == 7
    for i, (out,) in enumerate(outs):
        np.testing.assert_array_equal(
            out, (np.arange(4) + i).astype(np.float32) * 2.0)
    leftovers = [f for f in os.listdir(fake_server.workdir)
                 if f.startswith(("req", "out"))]
    assert leftovers == []  # all input and output files consumed


def test_request_many_matches_sequential(fake_server):
    batches = [[np.full((4,), i, np.uint8)] for i in range(5)]
    seq = [fake_server.request(b)[0] for b in batches]
    piped = [o[0] for o in fake_server.request_many(iter(batches))]
    for a, b in zip(seq, piped):
        np.testing.assert_array_equal(a, b)


def test_abandoned_request_many_drains_and_stays_usable(fake_server):
    batches = [[np.full((4,), i, np.uint8)] for i in range(6)]
    gen = fake_server.request_many(iter(batches), depth=3)
    next(gen)   # one reply consumed, two+ still in flight
    gen.close()  # abandon: in-flight replies are drained, protocol intact
    out, = fake_server.request([np.full((4,), 9, np.uint8)])
    np.testing.assert_array_equal(out, np.full((4,), 18.0, np.float32))
    leftovers = [f for f in os.listdir(fake_server.workdir)
                 if f.startswith(("req", "out"))]
    assert leftovers == []


def test_client_validation_error_leaves_protocol_intact(fake_server):
    # a shape mismatch raises BEFORE a request id is consumed or any
    # stdin line is written, so the server keeps working afterwards
    with pytest.raises(ValueError, match="shape"):
        fake_server.request([np.zeros((3,), np.uint8)])
    out, = fake_server.request([np.full((4,), 2, np.uint8)])
    np.testing.assert_array_equal(out, np.full((4,), 4.0, np.float32))


def test_soft_error_mid_pipeline_keeps_server_usable(fake_server):
    """One daemon-side per-request error must not cost the whole warm
    server: the generator raises for that request, drains the rest, and
    further requests work — fault isolation survives pipelining."""
    batches = [[np.full((4,), i, np.uint8)] for i in (1, 2, 255, 4, 5)]
    got = []
    with pytest.raises(ValueError, match="poisoned"):
        for out, in fake_server.request_many(iter(batches), depth=3):
            got.append(out)
    assert len(got) == 2  # the two requests before the poisoned one
    out, = fake_server.request([np.full((4,), 7, np.uint8)])
    np.testing.assert_array_equal(out, np.full((4,), 14.0, np.float32))


def test_reply_id_mismatch_detected(fake_server):
    # A stale reply (e.g. from a reply the client failed to read) answers
    # an id behind the expected one — the client flags the desync instead
    # of silently returning another request's data.
    fake_server._req_id = 5  # client believes 5 requests were answered
    with pytest.raises(pjrt.NativeServerDied, match="out of sync"):
        fake_server.request([np.zeros((4,), np.uint8)])


def test_pipeline_flag_reaches_command_line(tmp_path, monkeypatch):
    _install_fake_runner(
        tmp_path, monkeypatch,
        "import json, sys\n"
        "open(sys.argv[sys.argv.index('--output') + 1] + '.args', 'w')"
        ".write(json.dumps(sys.argv[1:]))\n"
        "sys.stderr.write('ready\\n'); sys.stderr.flush()\n"
        "sys.stdin.read()\n")
    with pjrt.NativeServer("m.mlir", [((4,), np.uint8)],
                           str(tmp_path / "wd"), plugin="p.so",
                           client_options={}, pipeline=3) as s:
        args = json.loads(open(os.path.join(s.workdir, "out.args")).read())
    assert args[args.index("--pipeline") + 1] == "3"


_FAKE_SCORER = r'''
import json, sys
import numpy as np
args = sys.argv[1:]
out_prefix = args[args.index("--output") + 1]
spec = args[args.index("--serve-input") + 1]      # e.g. u8:2,4,40,56,3
dims = [int(d) for d in spec.split(":")[1].split(",")]
sys.stderr.write("ready\n"); sys.stderr.flush()
rid = 0
for line in sys.stdin:
    paths = line.split()
    if not paths:
        continue
    i = rid; rid += 1
    clips = np.fromfile(paths[0], np.uint8).reshape(dims)
    flat = clips.reshape(dims[0], -1)
    out = np.stack([flat.mean(1) / 255.0, flat.min(1) / 255.0,
                    flat.max(1) / 255.0], 1).astype(np.float32)
    f = f"{out_prefix}.req{i}.0"
    out.tofile(f)
    print(json.dumps({"request": i, "outputs": [
        {"file": f, "dtype": "f32", "shape": [dims[0], 3],
         "bytes": int(out.nbytes)}]}), flush=True)
'''


def test_pipelined_pack_scores_bit_match_sequential(tmp_path, monkeypatch,
                                                    synthetic_dataset):
    """NativeTagger.iter_pack_scores (requests kept in flight across video
    boundaries) must be BIT-identical to the sequential scores_from_frames
    aggregation — same chunks, same order, same f64 accumulation. A fake
    daemon computing a deterministic score lets this run hermetically."""
    from fastvideotagging_tpu.config import ClipSamplerConfig
    from fastvideotagging_tpu.data.packed import Pack, write_pack
    from fastvideotagging_tpu.data.ucf101 import load_video_list
    from fastvideotagging_tpu.evaluation.native_tagger import NativeTagger
    from fastvideotagging_tpu.evaluation.tagger import (
        iter_pack_tags, rank_tags, scores_from_frames)

    root, list_path = synthetic_dataset
    records = load_video_list(list_path, root=root)
    pack_path = str(tmp_path / "lib.fvtpack")
    write_pack(records, pack_path, (40, 56), root=root)
    art = _write_scorer_artifacts(tmp_path)
    _install_fake_runner(tmp_path, monkeypatch, _FAKE_SCORER)

    pack = Pack(pack_path)
    scfg = ClipSamplerConfig(**_SCORER_SAMPLER)
    refs = {}
    for i, rec in enumerate(pack.records(root)):
        refs[rec.path] = scores_from_frames(
            lambda idx, _i=i: pack.gather(_i, idx),
            pack.entries[i]["probe_frames"], scfg, (40, 56), 3, 2,
            _scorer_math)

    with NativeTagger(str(art), workdir=str(tmp_path / "wd"),
                      plugin="fake.so", client_options={},
                      pipeline=2) as nt:
        piped = dict(nt.iter_pack_scores(pack_path, root=root))
        assert list(piped) == [r.path for r in pack.records(root)]
        for path, scores in piped.items():
            np.testing.assert_array_equal(scores, refs[path])
        # and the public entry dispatches to the pipelined hook
        tagged = list(iter_pack_tags(nt, pack_path, threshold=0.0,
                                     root=root))
    for path, results in tagged:
        want = rank_tags(refs[path], ["a", "b", "c"], threshold=0.0)
        assert [(r.tag, r.score) for r in results] == \
            [(w.tag, w.score) for w in want]


@pytest.mark.skipif(not os.environ.get("FVT_NATIVE_SERVING"),
                    reason="needs exclusive TPU tunnel access (one client)")
def test_native_pipelined_daemon_on_chip(runner, tmp_path, synthetic_dataset):
    """The REAL pjrt_runner with --pipeline 2: bulk pack tagging through
    the pipelined daemon matches the same daemon driven strictly
    sequentially (scores_from) — exercises the stager-thread H2D path and
    ordered replies on actual hardware."""
    import jax
    import jax.numpy as jnp

    from fastvideotagging_tpu.cli.export import export_artifacts
    from fastvideotagging_tpu.config import (
        ClipSamplerConfig, DataConfig, ExperimentConfig, ModelConfig,
    )
    from fastvideotagging_tpu.data.packed import Pack, write_pack
    from fastvideotagging_tpu.data.ucf101 import load_video_list
    from fastvideotagging_tpu.evaluation.native_tagger import NativeTagger

    root, list_path = synthetic_dataset
    records = load_video_list(list_path, root=root)
    cfg = ExperimentConfig(
        model=ModelConfig(name="tiny3d", num_classes=3, multilabel=True,
                          dropout=0.0, compute_dtype="float32"),
        data=DataConfig(resize_hw=(40, 56), crop_hw=(32, 32),
                        sampler=ClipSamplerConfig(clip_len=4, stride=2,
                                                  eval_mode="dense")))
    from fastvideotagging_tpu.models import model_from_config

    net = model_from_config(cfg.model)
    variables = jax.jit(net.init, static_argnames="train")(
        jax.random.PRNGKey(0), jnp.zeros((1, 4, 32, 32, 3), jnp.float32),
        train=False)
    art = str(tmp_path / "art")
    export_artifacts(cfg, variables, art, clip_batch=2, fmt="stablehlo",
                     platforms=("tpu",), tag_names=["a", "b", "c"])
    pack_path = str(tmp_path / "lib.fvtpack")
    write_pack(records, pack_path, (40, 56), root=root)
    pack = Pack(pack_path)

    with NativeTagger(art, pipeline=2) as nt:
        piped = dict(nt.iter_pack_scores(pack_path, root=root))
        seq = {}
        for i, rec in enumerate(pack.records(root)):
            seq[rec.path] = nt.scores_from(
                lambda idx, _i=i: pack.gather(_i, idx),
                pack.entries[i]["probe_frames"])
    assert list(piped) == [r.path for r in pack.records(root)]
    for path in piped:
        # same daemon, same chunks -> identical device programs; replies
        # must be the same arrays regardless of pipelining
        np.testing.assert_array_equal(piped[path], seq[path])


def test_cli_tag_native_engine_hermetic(tmp_path, monkeypatch, capsys,
                                        synthetic_dataset):
    """cli.tag --engine native end to end against the fake scoring daemon:
    argument wiring, pack bulk path, JSON output shape, engine cleanup."""
    from fastvideotagging_tpu.cli import tag as cli_tag
    from fastvideotagging_tpu.data.packed import write_pack
    from fastvideotagging_tpu.data.ucf101 import load_video_list

    root, list_path = synthetic_dataset
    records = load_video_list(list_path, root=root)
    pack_path = str(tmp_path / "lib.fvtpack")
    write_pack(records, pack_path, (40, 56), root=root)
    art = _write_scorer_artifacts(tmp_path)
    _install_fake_runner(tmp_path, monkeypatch, _FAKE_SCORER)
    monkeypatch.setattr(pjrt, "default_plugin", lambda: "fake.so")
    monkeypatch.setattr(pjrt, "plugin_client_options_for", lambda p: {})

    cli_tag.main([pack_path, "--engine", "native", "--artifacts", str(art),
                  "--data-root", root, "--model", "tiny3d",
                  "--num-classes", "3", "--multilabel",
                  "--threshold", "0.0"])
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines() if l]
    assert len(lines) == len(records)
    assert [l["video"] for l in lines] == [r.path for r in records]
    for l in lines:
        assert {t["tag"] for t in l["tags"]} == {"a", "b", "c"}
        assert all(0.0 <= t["score"] <= 1.0 for t in l["tags"])

    # sampler-affecting flags are refused, not silently ignored
    with pytest.raises(SystemExit, match="fixed at export time"):
        cli_tag.main([pack_path, "--engine", "native",
                      "--artifacts", str(art), "--model", "tiny3d",
                      "--num-classes", "3", "--eval-mode", "uniform"])


def test_pipelined_streaming_video_scores_bit_match(tmp_path, monkeypatch,
                                                    synthetic_dataset):
    """NativeTagger.video_scores with pipeline>0 (decode overlapping the
    daemon) must be bit-identical to the sequential streaming path — same
    one-pass reader, same chunks, same f64 accumulation."""
    from fastvideotagging_tpu.config import ClipSamplerConfig
    from fastvideotagging_tpu.data.ucf101 import load_video_list
    from fastvideotagging_tpu.evaluation.native_tagger import NativeTagger
    from fastvideotagging_tpu.evaluation.tagger import stream_video_scores

    root, list_path = synthetic_dataset
    records = load_video_list(list_path, root=root)
    art = _write_scorer_artifacts(tmp_path)
    _install_fake_runner(tmp_path, monkeypatch, _FAKE_SCORER)

    scfg = ClipSamplerConfig(**_SCORER_SAMPLER)
    with NativeTagger(str(art), workdir=str(tmp_path / "wd"),
                      plugin="fake.so", client_options={},
                      pipeline=2) as nt:
        for rec in records[:2]:
            ref = stream_video_scores(rec.path, scfg, (40, 56), 3, 2,
                                      _scorer_math)
            got = nt.video_scores(rec.path)
            np.testing.assert_array_equal(got, ref)


def test_daemon_death_mid_pipeline_flags_desync(fake_server):
    """If the daemon dies with requests in flight, the client raises
    NativeServerDied, marks the protocol desynced, and leaves no request
    files behind."""
    batches = [[np.full((4,), i, np.uint8)] for i in range(8)]
    gen = fake_server.request_many(iter(batches), depth=4)
    next(gen)  # several requests now in flight
    fake_server._proc.kill()
    fake_server._proc.wait()
    with pytest.raises(pjrt.NativeServerDied):
        list(gen)
    assert fake_server._desync
    with pytest.raises(pjrt.NativeServerDied):
        fake_server.request([np.zeros((4,), np.uint8)])
    leftovers = [f for f in os.listdir(fake_server.workdir)
                 if f.startswith("req")]
    assert leftovers == []


def test_request_after_close_fails_fast_and_leaks_nothing(fake_server):
    """Writing to a CLOSED daemon stdin raises ValueError from the file
    object — the same type _read_reply uses for soft per-request errors; it
    must surface as NativeServerDied (fail fast) and unlink the request's
    input files."""
    out, = fake_server.request([np.zeros((4,), np.uint8)])  # healthy first
    fake_server.close()
    with pytest.raises(pjrt.NativeServerDied):
        fake_server.request([np.zeros((4,), np.uint8)])
    leftovers = [f for f in os.listdir(fake_server.workdir)
                 if f.startswith("req")]
    assert leftovers == []


def test_input_write_failure_does_not_desync_id_counter(fake_server,
                                                        monkeypatch):
    """An IO failure while writing the input files consumes NO request id:
    the daemon never saw the request, so the next healthy request must
    still line up with the daemon's reply counter."""
    before = fake_server._req_id
    good_workdir = fake_server.workdir
    # tofile into a nonexistent directory raises OSError mid-submit
    monkeypatch.setattr(fake_server, "workdir",
                        os.path.join(good_workdir, "nope", "nope"))
    with pytest.raises(OSError):
        fake_server.request([np.zeros((4,), np.uint8)])
    monkeypatch.setattr(fake_server, "workdir", good_workdir)
    assert fake_server._req_id == before
    # next request matches the daemon's line counter: succeeds, no desync
    out, = fake_server.request([np.arange(4, dtype=np.uint8)])
    np.testing.assert_array_equal(out, np.arange(4, dtype=np.float32) * 2.0)
    assert not fake_server._desync
