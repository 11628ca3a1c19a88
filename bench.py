"""Benchmark harness (SURVEY.md §5.6): prints ONE JSON line for the driver.

Headline metric [BASELINE.json:2]: R(2+1)D-18 training clips/sec/chip
(fwd+bwd+update, uint8 in, fused on-device preprocess) at the [B:8] config —
16x112x112 clips. vs_baseline is measured / (0.90 * conv-roofline), where the
roofline is peak bf16 FLOP/s over the XLA-reported FLOPs of the step
(BASELINE target: >=90% of TPU conv3d roofline => vs_baseline 1.0 == target).

Also measured (reported in the detail dict): fused preprocess frames/sec and
pure fwd clips/sec. Runs on whatever backend JAX selects (the driver runs it
on the real chip).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

# Peak dense bf16 TFLOP/s and HBM GB/s per chip, by TPU generation
# (public spec sheets).
PEAK_BF16_TFLOPS = {
    "v5 lite": 197.0,  # v5e
    "v5e": 197.0,
    "v4": 275.0,
    "v5p": 459.0,
    "v6e": 918.0,
}
HBM_GBPS = {
    "v5 lite": 819.0,
    "v5e": 819.0,
    "v4": 1228.0,
    "v5p": 2765.0,
    "v6e": 1640.0,
}


def _detect_peak_tflops() -> float:
    kind = jax.devices()[0].device_kind.lower()
    for key, val in PEAK_BF16_TFLOPS.items():
        if key in kind:
            return val
    return 197.0  # assume v5e-class


def _detect_hbm_gbps() -> float:
    kind = jax.devices()[0].device_kind.lower()
    for key, val in HBM_GBPS.items():
        if key in kind:
            return val
    return 819.0


def _sync(x):
    """Force execution. jax.block_until_ready is a NO-OP through the axon
    tunnel (verified: 8k matmul 'finished' in 0.03 ms); only an actual
    readback synchronizes. Read back a SINGLE element — device_get of a whole
    array ships it over the tunnel."""
    leaf = jax.tree.leaves(x)[0]
    float(leaf[(0,) * leaf.ndim])


def _timeit_chain(step_once, warmup=2, n_short=4, n_long=16, repeats=3):
    """Per-iteration time via two-point slope: run a dependency chain of N
    iterations with one readback at the end, for N=n_short and N=n_long;
    slope removes the ~27 ms tunnel sync overhead. The slope is estimated
    `repeats` times and the MINIMUM taken: single estimates show up to
    ~15% run-to-run spread on the shared tunnel (measured 2026-08-16,
    benchmarks/flag_sweep.py baseline vs same-code bench.py run), and the
    fastest observation is the one closest to the device's true rate."""
    def run(n):
        carry = step_once(None)
        _sync(carry)
        start = time.perf_counter()
        for _ in range(n):
            carry = step_once(carry)
        _sync(carry)
        return time.perf_counter() - start

    for _ in range(warmup):
        _sync(step_once(None))
    slopes = []
    for _ in range(repeats):
        t_short = run(n_short)
        t_long = run(n_long)
        slopes.append((t_long - t_short) / (n_long - n_short))
    # noise on short chains can produce non-positive slopes; the fastest
    # PLAUSIBLE observation is the estimate. If EVERY repeat is
    # non-positive the measurement is garbage — fail loudly (secondary
    # benches surface it as the -1 sentinel via _safe) rather than publish
    # a fabricated number.
    positive = [s for s in slopes if s > 0]
    if not positive:
        raise RuntimeError(
            f"all timing slopes non-positive ({slopes}); tunnel noise "
            f"swamped the chain — rerun or lengthen n_long")
    return min(positive)


def bench_train_step(batch_size=32, clip_len=16, crop=112, source_hw=(128, 171),
                     model_name="r2plus1d_18", norm="batch", remat="none"):
    from fastvideotagging_tpu.config import (
        ClipSamplerConfig, DataConfig, ExperimentConfig, ModelConfig, TrainConfig,
    )
    from fastvideotagging_tpu.train import lr as lr_lib
    from fastvideotagging_tpu.train.loop import make_sample_batch, make_train_step
    from fastvideotagging_tpu.train.state import create_train_state

    cfg = ExperimentConfig(
        model=ModelConfig(name=model_name, num_classes=101, norm=norm,
                          remat=remat),
        data=DataConfig(source_hw=source_hw, resize_hw=source_hw,
                        crop_hw=(crop, crop),
                        sampler=ClipSamplerConfig(clip_len=clip_len)),
        train=TrainConfig(batch_size=batch_size),
    )
    from fastvideotagging_tpu.models import model_from_config

    model = model_from_config(cfg.model, dropout=0.0)
    tx = lr_lib.make_optimizer(cfg.train, steps_per_epoch=100)
    sample = jnp.zeros((1, clip_len, crop, crop, 3), jnp.float32)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), sample)

    step = make_train_step(model, cfg, donate=False)
    batch = jax.tree.map(
        lambda x: jnp.asarray(np.random.default_rng(0).integers(
            0, 255, x.shape).astype(x.dtype)) if x.dtype == jnp.uint8 else x,
        make_sample_batch(cfg),
    )
    rng = jax.random.PRNGKey(1)

    # XLA-reported FLOPs for the whole step -> peak-FLOPs denominator; the
    # optimized HLO's conv inventory -> op-level conv roofline (per-conv
    # max(FLOP-time, byte-time) — the temporal kx1x1 factors are HBM-bound,
    # so peak FLOP/s alone is not an achievable bound for this program).
    from fastvideotagging_tpu.utils.step_profiler import conv_roofline_seconds

    lowered = jax.jit(lambda s, b, r: step(s, b, r)).lower(state, batch, rng)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    flops = float((cost or {}).get("flops", 0.0))
    roofline_sec, _conv_fl, _n = conv_roofline_seconds(
        compiled.as_text(), _detect_peak_tflops() * 1e12,
        _detect_hbm_gbps() * 1e9)

    def step_once(carry):
        s = state if carry is None else carry
        new_state, _metrics = step(s, batch, rng)
        return new_state

    sec = _timeit_chain(step_once)
    clips_per_sec = batch_size / sec
    achieved_tflops = flops / sec / 1e12 if flops else 0.0
    return clips_per_sec, achieved_tflops, flops, sec, roofline_sec


def bench_inference(batch_size=32, clip_len=16, crop=112,
                    model_name="r2plus1d_18"):
    """Serving path: eval-mode forward clips/s (the tag()/evaluate hot loop)."""
    from fastvideotagging_tpu.models import get_model

    model = get_model(model_name, num_classes=101)
    x0 = jnp.zeros((batch_size, clip_len, crop, crop, 3), jnp.bfloat16)
    variables = jax.jit(model.init, static_argnames="train")(
        jax.random.PRNGKey(0), x0[:1], train=False)

    @jax.jit
    def step(xi):
        y = model.apply(variables, xi, train=False)
        # numerically-evolving chain: the axon runtime dedupes identical
        # dispatches, so the next input must genuinely differ
        return y, xi + (y[0, 0] * 1e-6).astype(xi.dtype).mean()

    def step_once(carry):
        _, xn = step(x0 if carry is None else carry)
        return xn

    sec = _timeit_chain(step_once)
    return batch_size / sec


def bench_int8_inference(batch_size=32, clip_len=16, crop=112,
                         model_name="r2plus1d_18"):
    """int8 PTQ serving engine (ops/int8_infer) clips/s, same geometry as
    bench_inference. Throughput is weight-independent: random weights,
    calibration on one random batch."""
    from fastvideotagging_tpu.models import get_model
    from fastvideotagging_tpu.ops.int8_infer import (
        calibrate, quantize_variables, r2plus1d_int8_infer,
    )

    model = get_model(model_name, num_classes=101)
    x0 = jnp.asarray(np.random.default_rng(0).standard_normal(
        (batch_size, clip_len, crop, crop, 3)), jnp.bfloat16)
    variables = jax.jit(model.init, static_argnames="train")(
        jax.random.PRNGKey(0), x0[:1], train=False)
    qpack = quantize_variables(variables, calibrate(variables, [x0[:4]]))

    @jax.jit
    def step(xi):
        y = r2plus1d_int8_infer(qpack, xi)
        # evolving input (content-identical buffers are deduped)
        return xi + (jnp.tanh(y.sum()) * 1e-2).astype(xi.dtype)

    def step_once(carry):
        return step(x0 if carry is None else carry)

    sec = _timeit_chain(step_once)
    return batch_size / sec


def bench_preprocess(batch_size=32, clip_len=16, source_hw=(128, 171)):
    from fastvideotagging_tpu.ops.preprocess_kernel import preprocess_batch

    h, w = source_hw
    frames = jnp.asarray(
        np.random.default_rng(0).integers(0, 255, (batch_size, clip_len, h, w, 3),
                                          dtype=np.int64).astype(np.uint8))
    tops = jnp.zeros((batch_size,), jnp.int32)
    lefts = jnp.zeros((batch_size,), jnp.int32)
    flips = jnp.zeros((batch_size,), bool)
    mean = jnp.asarray((0.43216, 0.394666, 0.37645), jnp.float32)
    std = jnp.asarray((0.22803, 0.22145, 0.216989), jnp.float32)

    @jax.jit
    def chained(f):
        out = preprocess_batch(f, tops, lefts, flips, mean, std,
                               resize_hw=source_hw, crop_hw=(112, 112))
        # numerically-evolving dependency (u8 wraps around) so the axon
        # runtime cannot dedupe the next iteration's dispatch
        dep = (out[0, 0, 0, 0, 0] * 0 + 1).astype(jnp.uint8)
        return f + dep

    def step_once(carry):
        return chained(frames if carry is None else carry)

    sec = _timeit_chain(step_once, n_short=16, n_long=64)
    return batch_size * clip_len / sec


def _safe(fn, default, label="secondary bench"):
    """Secondary benches must never kill the headline metric — but a failure
    must be visible: traceback goes to stderr, the sentinel to the JSON."""
    try:
        return fn()
    except Exception:
        import sys
        import traceback

        print(f"[bench] {label} failed (reporting {default!r}):",
              file=sys.stderr)
        traceback.print_exc()
        return default


def _physical_floor_fractions():
    """floor/measured ratios from the checked-in per-fusion closure
    artifacts (benchmarks/TPU_STEP_CLOSURE*.json) — the DEFENDED perf
    numbers (PERF.md ROUND-4c: physical floors = tile-padded bytes +
    lane-aware MXU + VMEM staging; the textbook roofline_fraction above
    undercounts stage-1's C=64 tile padding 2x). Republished here so the
    driver artifact carries them next to the textbook fraction."""
    import os

    here = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "benchmarks")
    out = {}
    for key, fname in (
            ("r2plus1d_18", "TPU_STEP_CLOSURE_FAITHFUL.json"),
            ("r2plus1d_18_tpu", "TPU_STEP_CLOSURE.json"),
            ("slowfast_r2plus1d_tpu", "TPU_STEP_CLOSURE_SLOWFAST_TPU.json"),
            ("s3d", "TPU_STEP_CLOSURE_S3D.json"),
            ("i3d", "TPU_STEP_CLOSURE_I3D.json")):
        try:
            with open(os.path.join(here, fname)) as f:
                out[key] = json.load(f)["floor_over_measured"]
        except Exception:
            pass  # artifact not recorded (yet) — omit rather than fake
    return out


def main():
    batch_size = 32
    (clips_per_sec, achieved_tflops, flops, sec,
     roofline_sec) = bench_train_step(batch_size)

    # e2e fit() + device-cache rows run FIRST among the secondary benches:
    # this box has ONE host core, and in BENCH_r04 these rows ran last,
    # after the loader/packed rows had saturated it — the device-cache row
    # silently read 0.892 e2e/bare against the uncontended 0.925 of
    # E2E_TRAIN.json (VERDICT r4 weak #5a). Order is the fix; the loader
    # row keeps its own contended-host caveat below.
    def _e2e_row():
        # user-visible fit() throughput: packed loader + prefetch + jitted
        # step + logging, epoch boundaries included (benchmarks/e2e_train.py)
        import os
        import sys

        sys.path.insert(0, os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "benchmarks"))
        import contextlib

        from e2e_train import run

        # the driver reads EXACTLY one JSON line from stdout — the bench's
        # progress prints must ride stderr
        with contextlib.redirect_stdout(sys.stderr):
            row = run(num_videos=256, frames_per_video=20, epochs=3,
                      log_every=4, smoke=False)
            # host_crop=True: crop host-side, ship 1.75x fewer bytes —
            # bit-identical pixels (tests/test_host_crop.py)
            row_hc = run(num_videos=256, frames_per_video=20, epochs=3,
                         log_every=4, smoke=False, host_crop=True)
            # device_cache=True: the whole pack staged into HBM once,
            # per-step H2D = KBs of indices — e2e == bare step even behind
            # this tunnel (measured 0.925, E2E_TRAIN.json device_cache row)
            row_dc = run(num_videos=256, frames_per_video=20, epochs=3,
                         log_every=4, smoke=False, device_cache=True)
        # h2d_bound: the transport ceiling for this batch geometry. On a
        # dev tunnel (~30 MiB/s) it, not the framework, caps e2e; e2e at or
        # above the bound means the pipeline fully overlaps H2D with compute.
        return (row["e2e_clips_per_sec_median"],
                row["first_window_clips_per_sec"],
                row.get("h2d_bound_clips_per_sec", -1.0),
                row_hc["e2e_clips_per_sec_median"],
                row_dc["e2e_clips_per_sec_median"])

    e2e_clips, e2e_first, e2e_h2d, e2e_hc, e2e_dc = _safe(
        _e2e_row, (-1.0, -1.0, -1.0, -1.0, -1.0), "e2e fit")

    # MXU-aligned variant (same macro-architecture, 128-multiple channels).
    tpu_clips, tpu_tflops, _, tpu_sec, tpu_roof = _safe(
        lambda: bench_train_step(batch_size, model_name="r2plus1d_18_tpu"),
        (-1.0, -1.0, 0.0, -1.0, 0.0), "r2plus1d_18_tpu train step")
    infer_clips = _safe(lambda: bench_inference(batch_size), -1.0, "inference")
    int8_clips = _safe(lambda: bench_int8_inference(batch_size), -1.0,
                       "int8 inference")
    # bulk-serving sweet spot: inference (fwd-only) keeps scaling past the
    # training-saturating batch; measured B=128 optimal (B=256 regresses)
    infer128 = _safe(lambda: bench_inference(128), -1.0, "inference B=128")
    int8_128 = _safe(lambda: bench_int8_inference(128), -1.0,
                     "int8 inference B=128")
    frames_per_sec = _safe(lambda: bench_preprocess(batch_size), -1.0,
                           "preprocess")
    # [B:9] Kinetics config: R(2+1)D-34 AND P3D-63 at 32x224x224 (both named
    # in BASELINE.json:9). Batch sized to fit v5e HBM (16 GB); full detail
    # kept (clips/s + roofline fraction) per VERDICT r2 items 2/6.
    def _kinetics_row(model_name):
        clips, _tf, _fl, sec, roof = bench_train_step(
            batch_size=8, clip_len=32, crop=224, source_hw=(256, 342),
            model_name=model_name)
        return clips, (roof / sec if sec > 0 else -1.0)

    kinetics_clips, kinetics_roof = _safe(
        lambda: _kinetics_row("r2plus1d_34"), (-1.0, -1.0),
        "kinetics r2plus1d_34 train step")
    p3d_clips, p3d_roof = _safe(
        lambda: _kinetics_row("p3d_63"), (-1.0, -1.0),
        "kinetics p3d_63 train step")
    # BN-lite (norm='frozen') fine-tune variant of the headline config.
    frozen_clips = _safe(
        lambda: bench_train_step(batch_size, norm="frozen")[0],
        -1.0, "frozen-BN train step")

    # [B:11] SlowFast dual-pathway stretch config, single-chip train step at
    # the UCF geometry (the channel-sharded multi-chip form is validated by
    # the driver's dryrun_multichip; no second chip exists to measure it).
    def _slowfast_row():
        clips, _tf, _fl, sec, roof = bench_train_step(
            batch_size, model_name="slowfast_r2plus1d")
        return clips, (roof / sec if sec > 0 else -1.0)

    sf_clips, sf_roof = _safe(_slowfast_row, (-1.0, -1.0),
                              "slowfast train step")

    # slowfast_r2plus1d_tpu: time-to-channel packed fast pathway (round 4)
    # — the faithful fast path's C=8..64 convs idle 50-94% of the MXU's
    # result lanes; packing alpha frames into channels is the lane fix.
    def _slowfast_tpu_row():
        clips, _tf, _fl, sec, roof = bench_train_step(
            batch_size, model_name="slowfast_r2plus1d_tpu")
        return clips, (roof / sec if sec > 0 else -1.0)

    sft_clips, sft_roof = _safe(_slowfast_tpu_row, (-1.0, -1.0),
                                "slowfast_tpu train step")

    # S3D (Xie'18 separable-3D Inception, round 3f) at the UCF geometry —
    # the efficiency-family anchor (8.3M params vs r2plus1d's 33M). Trained
    # with grad clipping in practice (train/lr.py clip_grad_norm; the
    # no-residual backbone explodes at init on tiny BN groups).
    def _s3d_row():
        clips, _tf, _fl, sec, roof = bench_train_step(
            batch_size, model_name="s3d")
        return clips, (roof / sec if sec > 0 else -1.0)

    s3d_clips, s3d_roof = _safe(_s3d_row, (-1.0, -1.0), "s3d train step")

    # I3D (Carreira'17, round 3f) — dense full-3D convs + stem temporal
    # downsampling. ~1030 clips/s / 0.32 roofline under this protocol
    # (BENCH_r03/r04 + round-5 remeasure); PERF.md's old 2079/0.64 row was
    # the 1-of-N trace-normalization artifact, corrected round 5.
    def _i3d_row():
        clips, _tf, _fl, sec, roof = bench_train_step(
            batch_size, model_name="i3d")
        return clips, (roof / sec if sec > 0 else -1.0)

    i3d_clips, i3d_roof = _safe(_i3d_row, (-1.0, -1.0), "i3d train step")

    # C3D (Tran'15, BASELINE config 1) at its canonical 16x112x112 —
    # the reference's ORIGINAL backbone. Five 3D max-pools: the round-5
    # separable train-mode pool lowering applies throughout (its VJP was
    # the select_and_scatter class measured at up to 33x byte floor on
    # s3d). Accuracy artifact: ACCURACY_HARD_C3D.json (0.985 top-1).
    def _c3d_row():
        clips, _tf, _fl, sec, roof = bench_train_step(
            batch_size, model_name="c3d")
        return clips, (roof / sec if sec > 0 else -1.0)

    c3d_clips, c3d_roof = _safe(_c3d_row, (-1.0, -1.0), "c3d train step")

    def _loader_row():
        from fastvideotagging_tpu.cli.bench_loader import measure

        m = measure(videos=8, epochs=2)
        return m["decode_clips_per_sec"], m["packed_clips_per_sec"]

    loader_clips, packed_clips = _safe(_loader_row, (-1.0, -1.0),
                                       "host loader")

    peak = _detect_peak_tflops()
    peak_frac = achieved_tflops / peak if peak else 0.0
    # Target [B:2]: >=90% of the TPU conv3d ROOFLINE. The roofline of this
    # program is the op-level one (per-conv max(FLOP-time, byte-time) summed
    # over the step's conv inventory — see utils/step_profiler.
    # conv_roofline_seconds and PERF.md): the temporal kx1x1 convs are
    # HBM-bandwidth-bound, so peak FLOP/s is not an achievable bound for any
    # schedule of this program. Both fractions are reported; vs_baseline
    # tracks the roofline one, peak_fraction stays for continuity with r1.
    roofline_frac = roofline_sec / sec if sec else 0.0
    vs_baseline = roofline_frac / 0.90

    result = {
        "metric": "r2plus1d18_train_clips_per_sec_per_chip",
        "value": round(clips_per_sec, 2),
        "unit": "clips/s",
        "vs_baseline": round(vs_baseline, 4),
        "detail": {
            "step_time_s": round(sec, 5),
            "achieved_tflops": round(achieved_tflops, 2),
            "peak_bf16_tflops": peak,
            "conv_roofline_step_s": round(roofline_sec, 5),
            "roofline_fraction": round(roofline_frac, 4),
            "peak_flops_fraction": round(peak_frac, 4),
            "xla_flops_per_step": flops,
            "preprocess_frames_per_sec": round(frames_per_sec, 1),
            "inference_clips_per_sec": round(infer_clips, 2),
            "int8_inference_clips_per_sec": round(int8_clips, 2),
            "inference_b128_clips_per_sec": round(infer128, 2),
            "int8_inference_b128_clips_per_sec": round(int8_128, 2),
            "r2plus1d18_tpu_variant_clips_per_sec": round(tpu_clips, 2),
            "r2plus1d18_tpu_variant_tflops": round(tpu_tflops, 2),
            "r2plus1d18_tpu_variant_roofline_fraction": round(
                tpu_roof / tpu_sec, 4) if tpu_sec > 0 else -1.0,
            "kinetics_r2plus1d34_clips_per_sec": round(kinetics_clips, 2),
            "kinetics_r2plus1d34_roofline_fraction": round(kinetics_roof, 4),
            "p3d63_kinetics_clips_per_sec": round(p3d_clips, 2),
            "p3d63_kinetics_roofline_fraction": round(p3d_roof, 4),
            "frozen_bn_clips_per_sec": round(frozen_clips, 2),
            "slowfast_clips_per_sec": round(sf_clips, 2),
            "slowfast_roofline_fraction": round(sf_roof, 4),
            "slowfast_tpu_clips_per_sec": round(sft_clips, 2),
            "slowfast_tpu_roofline_fraction": round(sft_roof, 4),
            "s3d_clips_per_sec": round(s3d_clips, 2),
            "s3d_roofline_fraction": round(s3d_roof, 4),
            "i3d_clips_per_sec": round(i3d_clips, 2),
            "i3d_roofline_fraction": round(i3d_roof, 4),
            "c3d_clips_per_sec": round(c3d_clips, 2),
            "c3d_roofline_fraction": round(c3d_roof, 4),
            "host_decode_clips_per_sec": round(loader_clips, 2),
            "host_decode_row_caveat": (
                "measured near the END of the bench run on a 1-core host "
                "sharing the harness — reads leftover CPU, not the loader; "
                "the standalone cli.bench_loader number (~90 clips/s/core) "
                "and the packed tier row are the loader's real rates "
                "(PERF.md round-4a)"),
            "e2e_fit_clips_per_sec": round(e2e_clips, 2),
            "e2e_fit_first_window_clips_per_sec": round(e2e_first, 2),
            "e2e_h2d_bound_clips_per_sec": round(e2e_h2d, 2),
            "e2e_fit_host_crop_clips_per_sec": round(e2e_hc, 2),
            "e2e_fit_device_cache_clips_per_sec": round(e2e_dc, 2),
            "e2e_rows_order": (
                "e2e/device-cache rows measured FIRST among secondary "
                "benches (uncontended host) — VERDICT r4 weak #5a"),
            # the DEFENDED perf numbers, from the per-fusion closure
            # artifacts (PERF.md ROUND-4c): floor/measured per model, where
            # floors are physical (tile-padded bytes, lane-aware MXU, VMEM
            # staging). The textbook roofline_fraction above keeps baseline
            # continuity; these say how close each program is to ITS OWN
            # layout-level byte roofline.
            "physical_floor_fraction": _safe(
                _physical_floor_fractions, {}, "physical floor fractions"),
            "batch_size": batch_size,
            "device": jax.devices()[0].device_kind,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
