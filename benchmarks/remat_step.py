"""Remat/materialization A/B on the train step (VERDICT r4 item 1).

The round-4c closure proved the CURRENT train program sits at its own
per-fusion physical floors (TPU_STEP_CLOSURE.json: 0.878, byte-bound 2:1,
~48 ms/step of idle MXU) — but nothing had ever told XLA it may trade
recompute FLOPs for activation HBM round-trips in the backward. This A/B
measures jax.checkpoint policies on the residual blocks
(models.r2plus1d.remat_policy: 'full' save-nothing, 'dots' conv-outputs-
saveable, 'mid' recompute-only-the-(2+1)D-mid) against the materializing
baseline, at STEP level with the dedupe-proof two-point-slope protocol —
the round-4e lesson: never ship a graph edit off a per-fusion delta.

Each arm runs in its OWN process (fresh compile, no cross-arm cache or
allocator state) and is repeated; the JSON records every observation.

    python benchmarks/remat_step.py --out benchmarks/REMAT_STEP.json
    python benchmarks/remat_step.py --arm r2plus1d_18_tpu,mid   # one arm
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MODELS = ("r2plus1d_18", "r2plus1d_18_tpu")
POLICIES = ("none", "full", "dots", "mid", "conv")


def run_arm(model: str, policy: str, batch: int) -> dict:
    from bench import bench_train_step

    clips, tflops, flops, sec, roofline_sec = bench_train_step(
        batch_size=batch, model_name=model, remat=policy)
    row = {
        "model": model,
        "remat": policy,
        "batch": batch,
        "step_ms": round(sec * 1e3, 2),
        "clips_per_sec": round(clips, 1),
        "achieved_tflops": round(tflops, 1),
        "roofline_fraction": round(roofline_sec / sec, 4) if sec else None,
    }
    # Activation-memory side of the trade: XLA's own temp-buffer estimate
    # for the compiled step (remat's classic win is memory, not time).
    try:
        import jax
        import jax.numpy as jnp
        import numpy as np

        from fastvideotagging_tpu.config import (
            ClipSamplerConfig, DataConfig, ExperimentConfig, ModelConfig,
            TrainConfig,
        )
        from fastvideotagging_tpu.models import model_from_config
        from fastvideotagging_tpu.train import lr as lr_lib
        from fastvideotagging_tpu.train.loop import (
            make_sample_batch, make_train_step,
        )
        from fastvideotagging_tpu.train.state import create_train_state

        cfg = ExperimentConfig(
            model=ModelConfig(name=model, num_classes=101, remat=policy),
            data=DataConfig(source_hw=(128, 171), resize_hw=(128, 171),
                            sampler=ClipSamplerConfig(clip_len=16)),
            train=TrainConfig(batch_size=batch))
        mdl = model_from_config(cfg.model, dropout=0.0)
        tx = lr_lib.make_optimizer(cfg.train, steps_per_epoch=100)
        state = create_train_state(
            mdl, tx, jax.random.PRNGKey(0),
            jnp.zeros((1, 16, 112, 112, 3), jnp.float32))
        step = make_train_step(mdl, cfg, donate=False)
        compiled = jax.jit(step).lower(
            state, make_sample_batch(cfg), jax.random.PRNGKey(1)).compile()
        mem = compiled.memory_analysis()
        if mem is not None:
            row["temp_bytes_mib"] = round(
                float(mem.temp_size_in_bytes) / 2**20, 1)
    except Exception as e:  # memory analysis is best-effort on this runtime
        row["temp_bytes_mib_error"] = f"{type(e).__name__}: {e}"
    return row


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--arm", default=None, help="model,policy (child mode)")
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--repeats", type=int, default=2,
                   help="fresh processes per arm")
    p.add_argument("--models", default=",".join(MODELS))
    p.add_argument("--policies", default=",".join(POLICIES))
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)

    if args.arm:
        model, policy = args.arm.split(",")
        print(json.dumps(run_arm(model, policy, args.batch)))
        return 0

    arms = []
    for model in args.models.split(","):
        for policy in args.policies.split(","):
            for rep in range(args.repeats):
                print(f"[remat_step] {model} remat={policy} rep {rep}...",
                      file=sys.stderr, flush=True)
                proc = subprocess.run(
                    [sys.executable, os.path.abspath(__file__),
                     "--arm", f"{model},{policy}", "--batch",
                     str(args.batch)],
                    capture_output=True, text=True, timeout=1200,
                    cwd=os.path.dirname(os.path.dirname(
                        os.path.abspath(__file__))))
                if proc.returncode != 0:
                    print(proc.stderr[-2000:], file=sys.stderr)
                    arms.append({"model": model, "remat": policy,
                                 "rep": rep, "error": "child failed"})
                    continue
                row = json.loads(proc.stdout.strip().splitlines()[-1])
                row["rep"] = rep
                arms.append(row)
                print(f"[remat_step]   -> {row['step_ms']} ms, "
                      f"{row['clips_per_sec']} clips/s", file=sys.stderr,
                      flush=True)

    # per-(model, policy) best (min step_ms — the protocol's fastest
    # plausible observation rule) + delta vs that model's 'none'
    summary = {}
    for row in arms:
        if "error" in row:
            continue
        key = (row["model"], row["remat"])
        if key not in summary or row["step_ms"] < summary[key]["step_ms"]:
            summary[key] = row
    table = []
    for model in args.models.split(","):
        base = summary.get((model, "none"))
        for policy in args.policies.split(","):
            row = summary.get((model, policy))
            if row is None:
                continue
            entry = dict(row)
            entry.pop("rep", None)
            if base and policy != "none":
                entry["vs_none_pct"] = round(
                    (base["step_ms"] / row["step_ms"] - 1.0) * 100, 1)
            table.append(entry)

    result = {
        "benchmark": "remat_step_ab",
        "protocol": ("per-arm fresh process, dedupe-proof two-point-slope "
                     "chain (bench.bench_train_step), best of "
                     f"{args.repeats} processes per arm; vs_none_pct > 0 "
                     "means the policy is FASTER than materializing"),
        "batch": args.batch,
        "geometry": "16x112x112 from 128x171 uint8",
        "best_per_arm": table,
        "all_observations": arms,
    }
    line = json.dumps(result, indent=2)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
