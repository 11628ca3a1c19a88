"""Measured artifact for the native C++ PJRT serving tier (VERDICT r2
item 6): runs the FVT_NATIVE_SERVING-class parity check AND a native-tier
throughput measurement on the real chip, recording both to
benchmarks/NATIVE_SERVING.json (the way int8 has INT8_SERVING.json).

The parent process forces the CPU backend (the tunnel allows ONE client;
the native runner must own it), exports StableHLO for platform 'tpu', and
compares the runner's scores against the in-process jax CPU reference:

  * parity row: r2plus1d_18, compute_dtype float32, B=2 — max abs diff of
    the (B, 101) softmax scores (f32 end to end, so CPU-vs-TPU noise is
    the only source);
  * throughput row: r2plus1d_18, bf16, B=8 uint8 source clips — the
    runner's --bench mode (21 distinct-content instances, disjoint
    short/long batches, two-point slope; see pjrt_runner.cc) -> clips/s
    with zero Python in the serving process.

    python benchmarks/native_serving.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from fastvideotagging_tpu.config import (  # noqa: E402
    ClipSamplerConfig, DataConfig, ExperimentConfig, ModelConfig,
)
from fastvideotagging_tpu.evaluation.serving import (  # noqa: E402
    export_serving_stablehlo, make_serving_fn,
)
from fastvideotagging_tpu.models import model_from_config  # noqa: E402
from fastvideotagging_tpu.native import pjrt  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), "NATIVE_SERVING.json")


def _cfg(compute_dtype: str) -> ExperimentConfig:
    return ExperimentConfig(
        model=ModelConfig(name="r2plus1d_18", num_classes=101,
                          compute_dtype=compute_dtype),
        data=DataConfig(source_hw=(128, 171)))


def _variables(cfg):
    model = model_from_config(cfg.model)
    x0 = jnp.zeros((1, 16, 112, 112, 3), jnp.float32)
    return model, jax.jit(model.init, static_argnames="train")(
        jax.random.PRNGKey(0), x0, train=False)


def parity_row(workdir: str) -> dict:
    cfg = _cfg("float32")
    _, variables = _variables(cfg)
    mod = os.path.join(workdir, "serve_f32.stablehlo")
    export_serving_stablehlo(cfg, variables, clip_batch=2, path=mod,
                             platforms=("tpu",))
    clips = np.random.default_rng(0).integers(
        0, 255, (2, 16, 128, 171, 3)).astype(np.uint8)
    ref = np.asarray(jax.jit(make_serving_fn(cfg, variables))(
        jnp.asarray(clips)))
    outs = pjrt.run_serving(mod, [clips], workdir)
    diff = float(np.max(np.abs(outs[0] - ref)))
    print(f"parity (f32 scores, B=2): max abs diff = {diff:.2e}", flush=True)
    return {"model": "r2plus1d_18", "compute_dtype": "float32",
            "clip_batch": 2, "max_abs_diff": diff}


def throughput_row(workdir: str, batch: int = 8, n: int = 21) -> dict:
    cfg = _cfg("bfloat16")
    _, variables = _variables(cfg)
    mod = os.path.join(workdir, "serve_bf16.stablehlo")
    export_serving_stablehlo(cfg, variables, clip_batch=batch, path=mod,
                             platforms=("tpu",))
    rng = np.random.default_rng(1)
    clips = rng.integers(0, 255, (n, batch, 16, 128, 171, 3)).astype(np.uint8)
    _outs, bench = pjrt.run_serving(mod, [clips], workdir, bench=n,
                                    timeout=1800)
    sec = bench["sec_per_exec"]
    row = {"model": "r2plus1d_18", "compute_dtype": "bfloat16",
           "clip_batch": batch, "bench_instances": n,
           "sec_per_exec": round(sec, 6),
           "clips_per_sec": round(batch / sec, 2), **bench}
    print(f"native throughput: {row['clips_per_sec']} clips/s "
          f"({sec * 1e3:.2f} ms/exec at B={batch})", flush=True)
    return row


def _daemon_setup(workdir: str, batch: int, n: int, name: str):
    """Shared prep for the daemon rows: export the bf16 module and draw
    n+2 DISTINCT-content requests (the axon runtime dedupes identical
    dispatches, CLAUDE.md — same-clip requests would measure the cache)."""
    cfg = _cfg("bfloat16")
    _, variables = _variables(cfg)
    mod = os.path.join(workdir, f"{name}.stablehlo")
    export_serving_stablehlo(cfg, variables, clip_batch=batch, path=mod,
                             platforms=("tpu",))
    rng = np.random.default_rng(2)
    reqs = [rng.integers(0, 255, (batch, 16, 128, 171, 3)).astype(np.uint8)
            for _ in range(n + 2)]
    return mod, reqs


def daemon_row(workdir: str, batch: int = 8, n: int = 12) -> dict:
    """Round-3 daemon tier (pjrt_runner --serve): per-request latency
    through a WARM compiled daemon, including the full request framing
    (input file write -> stdin line -> stage+execute+readback in C++ ->
    output file read)."""
    import time

    mod, reqs = _daemon_setup(workdir, batch, n, "serve_daemon")
    with pjrt.NativeServer(mod, [((batch, 16, 128, 171, 3), np.uint8)],
                           os.path.join(workdir, "daemon")) as srv:
        for clips in reqs[:2]:  # warmup (layout/cache effects)
            srv.request([clips])
        t0 = time.monotonic()
        for clips in reqs[2:]:
            out, = srv.request([clips])
            assert out.shape == (batch, 101)
        sec = (time.monotonic() - t0) / n
    mb = batch * 16 * 128 * 171 * 3 / 1e6
    row = {"model": "r2plus1d_18", "compute_dtype": "bfloat16",
           "clip_batch": batch, "requests": n,
           "sec_per_request": round(sec, 6),
           "clips_per_sec": round(batch / sec, 2),
           "note": (f"per-request wall time is dominated by the dev "
                    f"tunnel's H2D staging of the {mb:.1f} MB uint8 input "
                    f"(device exec is the throughput row's sec_per_exec, "
                    f"whose --bench mode pre-stages inputs); on a real TPU "
                    f"host H2D is PCIe-DMA-fast and this gap vanishes")}
    print(f"daemon: {row['clips_per_sec']} clips/s "
          f"({sec * 1e3:.2f} ms/request at B={batch}, warm; "
          f"tunnel-H2D bound)", flush=True)
    return row


def daemon_pipelined_row(workdir: str, batch: int = 8, n: int = 12) -> dict:
    """Round-3b: the SAME warm-daemon workload as daemon_row, but through
    --pipeline 2 + request_many — the stager thread H2D-stages request
    N+k while N executes, and the client keeps 3 requests in flight.
    Upper bound here is the dev tunnel: staging (~0.77 s/req through the
    ~11 MB/s tunnel) utterly dominates execute (~9 ms), so overlap can
    hide only the execute+readback slice; on a real host (H2D ~ execute)
    the same mechanism approaches 2x. Scores are asserted equal to the
    sequential daemon's on the same inputs."""
    import time

    mod, reqs = _daemon_setup(workdir, batch, n, "serve_daemon_p")
    with pjrt.NativeServer(mod, [((batch, 16, 128, 171, 3), np.uint8)],
                           os.path.join(workdir, "daemon_p"),
                           pipeline=2) as srv:
        for clips in reqs[:2]:  # warmup (layout/cache effects)
            srv.request([clips])
        t0 = time.monotonic()
        outs = [o for o, in srv.request_many([c] for c in reqs[2:])]
        sec = (time.monotonic() - t0) / n
        # pipelined replies equal the sequential daemon on repeat inputs
        re_seq = [srv.request([clips])[0] for clips in reqs[2:4]]
    for a, b in zip(outs[:2], re_seq):
        np.testing.assert_array_equal(a, b)
    row = {"model": "r2plus1d_18", "compute_dtype": "bfloat16",
           "clip_batch": batch, "requests": n, "pipeline": 2,
           "sec_per_request": round(sec, 6),
           "clips_per_sec": round(batch / sec, 2),
           "note": ("same workload as the daemon row with --pipeline 2 + "
                    "request_many; on this box the tunnel's H2D staging "
                    "serializes in the stager thread, so the saving is "
                    "only the execute+readback slice — the mechanism's "
                    "real headroom needs host-grade H2D")}
    print(f"daemon pipelined: {row['clips_per_sec']} clips/s "
          f"({sec * 1e3:.2f} ms/request at B={batch}, pipeline=2)",
          flush=True)
    return row


def int8_row(workdir: str, batch: int = 8, n: int = 21) -> dict:
    """Round-3b: the int8 PTQ engine THROUGH the native runner — the
    quantized program (int8 weights + requant epilogues baked as
    constants) exported and executed with zero Python, same dedupe-proof
    --bench protocol as the bf16 throughput row. Calibration clips are
    random uint8 (a perf row; accuracy parity is the int8 test suite's
    job)."""
    from fastvideotagging_tpu.evaluation.serving import quantize_for_serving

    cfg = _cfg("bfloat16")
    _, variables = _variables(cfg)
    rng = np.random.default_rng(3)
    calib = [rng.integers(0, 255, (batch, 16, 128, 171, 3)).astype(np.uint8)]
    qpack = quantize_for_serving(cfg, variables, calib)
    mod = os.path.join(workdir, "serve_int8.stablehlo")
    export_serving_stablehlo(cfg, variables, clip_batch=batch, path=mod,
                             platforms=("tpu",), qpack=qpack)
    clips = rng.integers(0, 255, (n, batch, 16, 128, 171, 3)).astype(np.uint8)
    _outs, bench = pjrt.run_serving(mod, [clips], workdir, bench=n,
                                    timeout=1800)
    sec = bench["sec_per_exec"]
    row = {"model": "r2plus1d_18", "engine": "int8",
           "clip_batch": batch, "bench_instances": n,
           "sec_per_exec": round(sec, 6),
           "clips_per_sec": round(batch / sec, 2), **bench,
           "note": ("int8 ties bf16 at B=8 (the engine's measured gains "
                    "are batch-dependent: 1.28x at B=32, +43% at B=128 "
                    "in-process, INT8_SERVING.json); B=8 here bounds the "
                    "tunnel staging time of the 21 bench instances")}
    print(f"native int8 throughput: {row['clips_per_sec']} clips/s "
          f"({sec * 1e3:.2f} ms/exec at B={batch})", flush=True)
    return row


ROWS = {"parity": parity_row, "throughput": throughput_row,
        "daemon": daemon_row, "daemon_pipelined": daemon_pipelined_row,
        "int8": int8_row}


def main(argv=None):
    """Run all rows, or only the named ones (merged into the existing
    record): python benchmarks/native_serving.py [parity|throughput|
    daemon|int8 ...]"""
    names = (argv if argv is not None else sys.argv[1:]) or list(ROWS)
    record = {}
    if os.path.exists(OUT) and set(names) != set(ROWS):
        with open(OUT) as f:
            record = json.load(f)
    record.update(date="2026-08-17", plugin=pjrt.default_plugin())
    with tempfile.TemporaryDirectory() as workdir:
        for name in names:
            record[name] = ROWS[name](workdir)
    with open(OUT, "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
