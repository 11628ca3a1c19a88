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

    python benchmarks/int8_kinetics.py
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


def main():
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
    main()
