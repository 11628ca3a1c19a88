"""int8 at the Kinetics geometry (VERDICT r2 item 5): measure, attribute,
and test the quantize-in-producer-epilogue hypothesis.

Round-2 finding (PERF.md): at r2plus1d_34 32x224x224 B=8 the int8 engine is
NEUTRAL (74.6 vs 75.9 clips/s) — hypothesis: the per-site quantize passes
scale with tensor size and cancel the MXU gain. This script:

  1. re-measures bf16 vs int8 clips/s at the Kinetics geometry (dedupe-proof
     chained timing, min-of-3 slopes via bench._timeit_chain);
  2. dumps the compiled int8 HLO and counts/sizes the fusions whose output
     is an s8 tensor (the quantize passes) — are they standalone passes or
     fused into the producer convolution's epilogue?;
  3. measures ablations that isolate the quantize-pass cost: the engine with
     static scales (default; requant epilogue-fusible), dynamic scales (an
     unfusible amax pass per site), and a float_blocks=() full-int8 variant.

    python benchmarks/int8_kinetics.py            # clips/s sweep (slow)
    python benchmarks/int8_kinetics.py --profile  # device-time attribution

--profile traces the compiled int8 and bf16 engines (jax.profiler device
events joined with the optimized HLO, same machinery as
utils/step_profiler) and buckets fusion time into: convs by input dtype
(s8 vs bf16), conv-free s8-OUTPUT fusions (the standalone quantize passes
the epilogue-fuse idea would remove), and everything else. The
"epilogue-fused upper bound" = int8 total minus the standalone quantize
bucket — if that still does not beat the bf16 total, fusing the quantize
into producer epilogues cannot rescue int8 at this geometry and the
VERDICT r2 item 5 negative is closed with attribution.
"""

from __future__ import annotations

import json
import re
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from bench import _timeit_chain  # noqa: E402
from fastvideotagging_tpu.models import get_model  # noqa: E402
from fastvideotagging_tpu.ops.arch_spec import spec_for  # noqa: E402
from fastvideotagging_tpu.ops.int8_infer import (  # noqa: E402
    calibrate, int8_infer, quantize_variables,
)

MODEL = "r2plus1d_34"
B, T, CROP = 8, 32, 224


def hlo_quantize_report(compiled_text: str) -> dict:
    """Count s8-producing fusions and their output bytes in the optimized
    HLO — each standalone one is a full extra read+write pass."""
    fusions = re.findall(r"fusion[^=]*= (s8\[[0-9,]+\])", compiled_text)
    convs = len(re.findall(r"convolution", compiled_text))
    total_bytes = 0
    for shape in fusions:
        dims = [int(d) for d in shape[3:-1].split(",") if d]
        total_bytes += int(np.prod(dims))
    return {"s8_fusion_outputs": len(fusions),
            "s8_fusion_output_mbytes": round(total_bytes / 1e6, 1),
            "convolutions": convs}


def _trace_attribute(step, x0, n_steps: int = 3,
                     trace_dir: str = "/tmp/fvt_int8_trace") -> dict:
    """Trace a jitted carry-through step and bucket device time.

    Buckets (us/step): conv fusions split by the convolution's OUTPUT dtype
    in the optimized HLO (s32 = the s8xs8 int8 conv, bf16/f32 = float conv),
    conv-free fusions whose output is s8 (standalone quantize passes — the
    bytes the epilogue-fuse formulation would eliminate), and other."""
    import os

    from fastvideotagging_tpu.utils.step_profiler import (
        load_trace_durations, parse_hlo,
    )

    compiled = step.lower(x0).compile()
    txt = compiled.as_text()
    fus, comp_convs = parse_hlo(txt)
    out_dtype = {m.group(1): m.group(2) for m in re.finditer(
        r"%([\w\.\-]+) = ([a-z0-9]+)[\[(].*? fusion\(", txt)}

    def sync(x):
        float(jnp.asarray(x.reshape(-1)[0], jnp.float32))

    c = step(x0)
    sync(c)
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        for _ in range(n_steps):
            c = step(c)
        sync(c)
    dur, _steps, _dev_us = load_trace_durations(trace_dir, n_steps)

    cat: dict[str, float] = {"conv_s8": 0.0, "conv_float": 0.0,
                             "quantize_pass_s8out": 0.0, "other": 0.0}
    quant_rows = []
    for name, d in dur.items():
        if name.startswith("jit_"):
            continue
        calls, _op = fus.get(name, (None, None))
        convs = comp_convs.get(calls, []) if calls else []
        if convs:
            if any(s.startswith("s32[") for s, *_ in convs):
                cat["conv_s8"] += d
            else:
                cat["conv_float"] += d
        elif out_dtype.get(name) == "s8":
            cat["quantize_pass_s8out"] += d
            quant_rows.append((d, name))
        else:
            cat["other"] += d
    quant_rows.sort(reverse=True)
    total = sum(cat.values())
    return {"total_ms": round(total / 1e3, 2),
            "ms": {k: round(v / 1e3, 2) for k, v in cat.items()},
            "top_quantize_passes_us": [
                (round(d), n) for d, n in quant_rows[:8]]}


def _setup():
    """Shared model/engine/carry-step construction — --profile and the
    clips/s sweep MUST measure the same graphs (same carry protocol)."""
    model = get_model(MODEL, num_classes=101)
    spec = spec_for(MODEL)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((B, T, CROP, CROP, 3)),
                     jnp.bfloat16)
    variables = jax.jit(model.init, static_argnames="train")(
        jax.random.PRNGKey(0), x0[:1], train=False)
    qpack = quantize_variables(
        variables, calibrate(variables, [x0[:2]], spec=spec), spec=spec)

    @jax.jit
    def bf16_step(xi):
        y = model.apply(variables, xi, train=False)
        return xi + (jnp.tanh(y.sum()) * 1e-2).astype(xi.dtype)

    def int8_step_fn(**kw):
        @jax.jit
        def step(xi):
            y = int8_infer(qpack, xi, spec, **kw)
            return xi + (jnp.tanh(y.sum()) * 1e-2).astype(xi.dtype)
        return step

    return x0, qpack, spec, bf16_step, int8_step_fn


def profile_mode():
    x0, _qpack, _spec, bf16_step, int8_step_fn = _setup()
    int8_step = int8_step_fn()

    report = {"geometry": f"{MODEL} B={B} {T}x{CROP}x{CROP}"}
    report["int8"] = _trace_attribute(int8_step, x0,
                                      trace_dir="/tmp/fvt_i8k_trace")
    print("int8:", json.dumps(report["int8"]), flush=True)
    report["bf16"] = _trace_attribute(bf16_step, x0,
                                      trace_dir="/tmp/fvt_bf16k_trace")
    print("bf16:", json.dumps(report["bf16"]), flush=True)
    ub = report["int8"]["total_ms"] - report["int8"]["ms"][
        "quantize_pass_s8out"]
    report["epilogue_fused_upper_bound_ms"] = round(ub, 2)
    report["bf16_total_ms"] = report["bf16"]["total_ms"]
    report["upper_bound_speedup_vs_bf16"] = round(
        report["bf16"]["total_ms"] / ub, 3) if ub > 0 else None
    print(json.dumps(report))


def main():
    x0, qpack, spec, bf16_step, int8_step_fn = _setup()

    report = {"geometry": f"{MODEL} B={B} {T}x{CROP}x{CROP}"}
    # HLO analysis of the default engine
    lowered = jax.jit(lambda xi: int8_infer(qpack, xi, spec)).lower(x0)
    report["hlo"] = hlo_quantize_report(lowered.compile().as_text())
    print("hlo:", report["hlo"], flush=True)

    def cps(step):
        return round(B / _timeit_chain(
            lambda c: step(x0 if c is None else c)), 2)

    report["bf16_clips_per_sec"] = cps(bf16_step)
    print("bf16:", report["bf16_clips_per_sec"], flush=True)
    report["int8_clips_per_sec"] = cps(int8_step_fn())
    print("int8 default:", report["int8_clips_per_sec"], flush=True)
    report["int8_full_clips_per_sec"] = cps(int8_step_fn(float_blocks=()))
    print("int8 full (no bf16 tail):", report["int8_full_clips_per_sec"],
          flush=True)
    report["int8_dynamic_clips_per_sec"] = cps(int8_step_fn(dynamic=True))
    print("int8 dynamic:", report["int8_dynamic_clips_per_sec"], flush=True)
    report["int8_exact_residual_clips_per_sec"] = cps(
        int8_step_fn(residual="exact"))
    print("int8 exact-residual:", report["int8_exact_residual_clips_per_sec"],
          flush=True)
    report["speedup_default"] = round(
        report["int8_clips_per_sec"] / report["bf16_clips_per_sec"], 3)
    print(json.dumps(report))


if __name__ == "__main__":
    if "--profile" in sys.argv:
        profile_mode()
    else:
        main()
