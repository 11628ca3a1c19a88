"""XLA flag + batch-size sweep on the headline train step.

Each configuration runs in a FRESH subprocess (XLA_FLAGS is read at jax
import; in-process edits are dead on this runtime — CLAUDE.md). Unknown
flags make XLA abort: those rows report 'error'.

Usage: python benchmarks/flag_sweep.py
"""

from __future__ import annotations

import os
import re
import subprocess
import sys

CHILD = r"""
import sys
sys.path.insert(0, "/root/repo")
from bench import bench_train_step
batch = int(sys.argv[1])
model = sys.argv[2]
clips, tflops, flops, sec, roof = bench_train_step(batch, model_name=model)
print(f"RESULT ms={sec*1e3:.2f} clips={clips:.1f} tf={tflops:.1f} "
      f"roof_frac={roof/sec:.4f}")
"""

CONFIGS = [
    ("baseline", "", 32, "r2plus1d_18"),
    ("B=48", "", 48, "r2plus1d_18"),
    ("B=64", "", 64, "r2plus1d_18"),
    ("vmem64M", "--xla_tpu_scoped_vmem_limit_kib=65536", 32, "r2plus1d_18"),
    ("vmem96M", "--xla_tpu_scoped_vmem_limit_kib=98304", 32, "r2plus1d_18"),
    ("licm2", "--xla_tpu_licm_size_inflation_ratio=2.0", 32, "r2plus1d_18"),
    ("no-dot-sr", "--xla_tpu_enable_dot_strength_reduction=false", 32,
     "r2plus1d_18"),
    ("tpu-B=64", "", 64, "r2plus1d_18_tpu"),
    ("tpu-vmem64M", "--xla_tpu_scoped_vmem_limit_kib=65536", 32,
     "r2plus1d_18_tpu"),
]


def main():
    for name, flags, batch, model in CONFIGS:
        env = dict(os.environ)
        if flags:
            env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " " + flags).strip()
        try:
            out = subprocess.run(
                [sys.executable, "-c", CHILD, str(batch), model],
                capture_output=True, text=True, timeout=900, env=env)
            m = re.search(r"RESULT (.*)", out.stdout)
            if m:
                print(f"{name:14s} {model:16s} B={batch:3d}  {m.group(1)}",
                      flush=True)
            else:
                tail = (out.stderr or out.stdout).strip().splitlines()[-3:]
                print(f"{name:14s} ERROR: {' | '.join(tail)}", flush=True)
        except subprocess.TimeoutExpired:
            print(f"{name:14s} TIMEOUT", flush=True)


if __name__ == "__main__":
    main()
