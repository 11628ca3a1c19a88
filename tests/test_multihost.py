"""Multi-host (DCN-tier) smoke test (SURVEY.md §6.8; VERDICT r1 item 8).

No second host exists here, so the DCN path is exercised the JAX-idiomatic
way: two OS processes on localhost, each with 2 virtual CPU devices, joined
by ``parallel.mesh.init_multihost`` (jax.distributed.initialize) into one
4-device job, then a psum over the global data axis through the same
``make_mesh`` the trainer uses. This drives the actual multi-controller call
path — coordinator handshake, global device enumeration, cross-process
collective — that a real multi-host TPU pod run would take.

Gated: skipped when the coordinator cannot start (port allocation/sandbox).
"""

import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import sys
port, pid = sys.argv[1], int(sys.argv[2])
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)  # local devices per process

from fastvideotagging_tpu.parallel.mesh import DATA_AXIS, init_multihost, make_mesh

init_multihost(f"127.0.0.1:{port}", num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4, jax.device_count()
assert jax.local_device_count() == 2

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

mesh = make_mesh()  # (data=4, model=1) spanning both processes
assert mesh.shape[DATA_AXIS] == 4

# Global array sharded over `data`: shard value == global device index.
sharding = NamedSharding(mesh, P(DATA_AXIS))
garr = jax.make_array_from_callback(
    (4, 8), sharding,
    lambda idx: np.full((1, 8), idx[0].start, np.float32))

@jax.jit
@jax.shard_map(mesh=mesh, in_specs=P(DATA_AXIS, None), out_specs=P())
def global_sum(x):
    return jax.lax.psum(x, DATA_AXIS)

out = global_sum(garr)
# sum of device indices 0+1+2+3 = 6, psum crosses the process boundary
np.testing.assert_allclose(np.asarray(out.addressable_data(0)), 6.0)
print(f"proc{pid} psum ok", flush=True)
jax.distributed.shutdown()
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_psum_over_dcn_path(tmp_path):
    try:
        port = _free_port()
    except OSError as e:  # pragma: no cover - sandbox without sockets
        pytest.skip(f"cannot allocate a localhost port: {e}")

    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, str(port), str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd="/root/repo",
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=150)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multi-host smoke timed out (coordinator hang?)")

    for pid, (p, out) in enumerate(zip(procs, outs)):
        if p.returncode != 0 and "UNAVAILABLE" in out:
            pytest.skip(f"coordinator unavailable in this sandbox: {out[-300:]}")
        assert p.returncode == 0, f"proc{pid} failed:\n{out}"
        assert f"proc{pid} psum ok" in out


# ---------------------------------------------------------------------------
# Real train step across processes (VERDICT r2 item 8): one make_train_step
# step on the global mesh, loss/params equal to the single-process run.
# ---------------------------------------------------------------------------

_STEP_WORKER = r"""
import sys
mode = sys.argv[1]            # 'single' | 'multi'
port, pid = sys.argv[2], int(sys.argv[3])
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4 if mode == "single" else 2)
if mode == "multi":
    from fastvideotagging_tpu.parallel.mesh import init_multihost
    init_multihost(f"127.0.0.1:{port}", num_processes=2, process_id=pid)
    assert jax.device_count() == 4 and jax.local_device_count() == 2

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from fastvideotagging_tpu.config import (
    ClipSamplerConfig, DataConfig, ExperimentConfig, ModelConfig, TrainConfig,
)
from fastvideotagging_tpu.models import get_model
from fastvideotagging_tpu.parallel.mesh import DATA_AXIS, make_mesh
from fastvideotagging_tpu.train import lr as lr_lib
from fastvideotagging_tpu.train.loop import make_train_step
from fastvideotagging_tpu.train.state import create_train_state

cfg = ExperimentConfig(
    model=ModelConfig(name="tiny3d", num_classes=3),
    data=DataConfig(resize_hw=(16, 16), crop_hw=(8, 8),
                    sampler=ClipSamplerConfig(clip_len=4)),
    train=TrainConfig(batch_size=4),
)
model = get_model("tiny3d", num_classes=3)
tx = lr_lib.make_optimizer(cfg.train, steps_per_epoch=10)
state = create_train_state(model, tx, jax.random.PRNGKey(0),
                           jnp.zeros((1, 4, 8, 8, 3), jnp.float32))
mesh = make_mesh()  # data axis spans all 4 devices (both processes in multi)
assert mesh.shape[DATA_AXIS] == 4
state = jax.device_put(state, NamedSharding(mesh, P()))

def row(fn):
    # global batch content is a pure function of the GLOBAL row index, so
    # single- and multi-process runs see byte-identical data
    def cb(index):
        rows = range(index[0].start, index[0].stop)
        return np.stack([fn(r) for r in rows])
    return cb

b, t, h, w = 4, 4, 16, 16
def mk(shape, dtype, fn):
    return jax.make_array_from_callback(
        shape, NamedSharding(mesh, P(*([DATA_AXIS] + [None] * (len(shape) - 1)))),
        row(fn))

batch = {
    "frames": mk((b, t, h, w, 3), np.uint8, lambda r: np.random.default_rng(
        100 + r).integers(0, 255, (t, h, w, 3)).astype(np.uint8)),
    "labels": mk((b,), np.int32, lambda r: np.int32(r % 3)),
    "crop_tops": mk((b,), np.int32, lambda r: np.int32(r % 8)),
    "crop_lefts": mk((b,), np.int32, lambda r: np.int32((r * 3) % 8)),
    "flips": mk((b,), bool, lambda r: bool(r % 2)),
    "weights": mk((b,), np.float32, lambda r: np.float32(1.0)),
}

step = make_train_step(model, cfg, donate=False)
new_state, metrics = step(state, batch, jax.random.PRNGKey(7))
loss = float(metrics["loss"])
# a post-update parameter checksum proves the whole state update (grads,
# allreduce, optimizer) agrees, not just the loss scalar
leaf = new_state.params["conv1"]["kernel"]
checksum = float(jnp.sum(jnp.abs(leaf.astype(jnp.float64))))
print(f"RESULT loss={loss:.10f} checksum={checksum:.10f}", flush=True)
if mode == "multi":
    jax.distributed.shutdown()
"""


def _parse_result(out: str) -> tuple[float, float]:
    for line in out.splitlines():
        if line.startswith("RESULT"):
            kv = dict(p.split("=") for p in line.split()[1:])
            return float(kv["loss"]), float(kv["checksum"])
    raise AssertionError(f"no RESULT line in:\n{out}")


def test_train_step_across_processes_matches_single_process():
    """One real jitted train step (preprocess+fwd+bwd+SyncBN+update) on a
    2-process global mesh == the same step single-process, to fp noise."""
    try:
        port = _free_port()
    except OSError as e:  # pragma: no cover
        pytest.skip(f"cannot allocate a localhost port: {e}")

    single = subprocess.run(
        [sys.executable, "-c", _STEP_WORKER, "single", "0", "0"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert single.returncode == 0, single.stdout + single.stderr
    want_loss, want_sum = _parse_result(single.stdout)

    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _STEP_WORKER, "multi", str(port), str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd="/root/repo",
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multi-process train step timed out")

    for pid, (p, out) in enumerate(zip(procs, outs)):
        if p.returncode != 0 and "UNAVAILABLE" in out:
            pytest.skip(f"coordinator unavailable in this sandbox: {out[-300:]}")
        assert p.returncode == 0, f"proc{pid} failed:\n{out}"
        got_loss, got_sum = _parse_result(out)
        assert abs(got_loss - want_loss) < 1e-5, (got_loss, want_loss)
        # bf16 compute retiled across processes: small fp-order noise
        assert abs(got_sum - want_sum) / max(abs(want_sum), 1.0) < 1e-4


# ---------------------------------------------------------------------------
# Full fit() across processes (round 3): the COMPLETE training orchestration
# — per-host row-subset loading (pipeline.train_batches rows=), global batch
# assembly (mesh.global_batch_put), jitted step, epoch loop, logging — on a
# 2-process global mesh, final parameters equal to the single-process run.
# ---------------------------------------------------------------------------

_FIT_WORKER = r"""
import sys
mode, pack, port, pid = sys.argv[1], sys.argv[2], sys.argv[3], int(sys.argv[4])
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4 if mode == "single" else 2)
if mode == "multi":
    from fastvideotagging_tpu.parallel.mesh import init_multihost
    init_multihost(f"127.0.0.1:{port}", num_processes=2, process_id=pid)
    assert jax.device_count() == 4 and jax.local_device_count() == 2

import jax.numpy as jnp
import numpy as np

from fastvideotagging_tpu.config import (
    ClipSamplerConfig, DataConfig, ExperimentConfig, ModelConfig, TrainConfig,
)
from fastvideotagging_tpu.train.fit import fit

cfg = ExperimentConfig(
    model=ModelConfig(name="tiny3d", num_classes=3, compute_dtype="float32"),
    data=DataConfig(resize_hw=(16, 16), crop_hw=(8, 8),
                    sampler=ClipSamplerConfig(clip_len=4), num_workers=2),
    train=TrainConfig(batch_size=4, num_epochs=2, base_lr=0.05,
                      log_every=2, checkpoint_dir="", lr_steps=(1,)),
)
state = fit(cfg, pack)
leaf = state.params["conv1"]["kernel"]
checksum = float(jnp.sum(jnp.abs(leaf)))
step = int(jax.device_get(state.step))
print(f"RESULT loss={0.0:.10f} checksum={checksum:.10f} step={step}",
      flush=True)
if mode == "multi":
    jax.distributed.shutdown()
"""


def _make_pack(tmp_path) -> str:
    from fastvideotagging_tpu.data.packed import write_pack_from_arrays

    rng = np.random.default_rng(5)

    def items():
        for v in range(16):
            frames = rng.integers(0, 255, (8, 16, 16, 3)).astype(np.uint8)
            yield f"v{v:02d}.mp4", v % 3, (), frames

    out = str(tmp_path / "tiny.fvtpack")
    write_pack_from_arrays(items(), out, resize_hw=(16, 16))
    return out


def test_fit_across_processes_matches_single_process(tmp_path):
    """fit() on a 2-process global mesh: each process decodes only its rows
    of every global batch; the final trained parameters match the
    single-process run to fp noise, and both complete 2 epochs x 4 steps."""
    try:
        port = _free_port()
    except OSError as e:  # pragma: no cover
        pytest.skip(f"cannot allocate a localhost port: {e}")
    pack = _make_pack(tmp_path)

    single = subprocess.run(
        [sys.executable, "-c", _FIT_WORKER, "single", pack, "0", "0"],
        capture_output=True, text=True, timeout=420, cwd="/root/repo",
    )
    assert single.returncode == 0, single.stdout + single.stderr
    want = _parse_fit_result(single.stdout)
    assert want["step"] == 8  # 16 videos / batch 4 x 2 epochs

    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _FIT_WORKER, "multi", pack, str(port),
             str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd="/root/repo",
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=420)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multi-process fit timed out")

    for pid, (p, out) in enumerate(zip(procs, outs)):
        if p.returncode != 0 and "UNAVAILABLE" in out:
            pytest.skip(f"coordinator unavailable in this sandbox: {out[-300:]}")
        assert p.returncode == 0, f"proc{pid} failed:\n{out}"
        got = _parse_fit_result(out)
        assert got["step"] == want["step"]
        rel = abs(got["checksum"] - want["checksum"]) / max(
            abs(want["checksum"]), 1.0)
        assert rel < 1e-4, (got["checksum"], want["checksum"])


def _parse_fit_result(out: str) -> dict:
    for line in out.splitlines():
        if line.startswith("RESULT"):
            kv = dict(p.split("=") for p in line.split()[1:])
            return {"loss": float(kv["loss"]),
                    "checksum": float(kv["checksum"]),
                    "step": int(kv["step"])}
    raise AssertionError(f"no RESULT line in:\n{out}")


# ---------------------------------------------------------------------------
# Multi-host evaluation: clip chunks shard over the cross-process global
# mesh (scores forced replicated so every host reads them back); per-video
# aggregated scores equal to the single-process run.
# ---------------------------------------------------------------------------

_EVAL_WORKER = r"""
import sys
mode, pack, port, pid = sys.argv[1], sys.argv[2], sys.argv[3], int(sys.argv[4])
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4 if mode == "single" else 2)
if mode == "multi":
    from fastvideotagging_tpu.parallel.mesh import init_multihost
    init_multihost(f"127.0.0.1:{port}", num_processes=2, process_id=pid)

import jax.numpy as jnp
import numpy as np

from fastvideotagging_tpu.config import (
    ClipSamplerConfig, DataConfig, ExperimentConfig, ModelConfig,
)
from fastvideotagging_tpu.data.packed import open_dataset
from fastvideotagging_tpu.evaluation.evaluate import evaluate_video_scores
from fastvideotagging_tpu.models import model_from_config
from fastvideotagging_tpu.parallel.mesh import make_mesh

cfg = ExperimentConfig(
    model=ModelConfig(name="tiny3d", num_classes=3, compute_dtype="float32"),
    data=DataConfig(resize_hw=(16, 16), crop_hw=(8, 8),
                    sampler=ClipSamplerConfig(clip_len=4, eval_mode="uniform",
                                              num_eval_clips=3)),
)
model = model_from_config(cfg.model)
variables = model.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, 4, 8, 8, 3), jnp.float32), train=False)
dataset = open_dataset(pack, cfg.data, mode="eval")
mesh = make_mesh()  # all 4 devices; multi: spans both processes
scores, _ = evaluate_video_scores(model, variables, dataset, cfg,
                                  clip_batch=4, mesh=mesh)
checksum = float(np.abs(scores.astype(np.float64)).sum())
# custom-engine path (the --int8 shape): an apply_fn jitted WITHOUT the
# replicated out_shardings — evaluate must wrap it so the cross-process
# sharded scores are readable (code-review finding r3d)
from fastvideotagging_tpu.models import heads
custom = jax.jit(lambda v, x: heads.predict_scores(
    model.apply(v, x, train=False), False))
scores2, _ = evaluate_video_scores(model, variables, dataset, cfg,
                                   clip_batch=4, mesh=mesh, apply_fn=custom)
assert float(np.abs(scores2.astype(np.float64)).sum()) == checksum
print(f"RESULT loss=0.0 checksum={checksum:.10f} step={scores.shape[0]}",
      flush=True)
if mode == "multi":
    jax.distributed.shutdown()
"""


def test_evaluate_across_processes_matches_single_process(tmp_path):
    try:
        port = _free_port()
    except OSError as e:  # pragma: no cover
        pytest.skip(f"cannot allocate a localhost port: {e}")
    pack = _make_pack(tmp_path)

    single = subprocess.run(
        [sys.executable, "-c", _EVAL_WORKER, "single", pack, "0", "0"],
        capture_output=True, text=True, timeout=420, cwd="/root/repo",
    )
    assert single.returncode == 0, single.stdout + single.stderr
    want = _parse_fit_result(single.stdout)
    assert want["step"] == 16  # one score row per pack video

    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _EVAL_WORKER, "multi", pack, str(port),
             str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd="/root/repo",
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=420)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multi-process evaluate timed out")

    for pid, (p, out) in enumerate(zip(procs, outs)):
        if p.returncode != 0 and "UNAVAILABLE" in out:
            pytest.skip(f"coordinator unavailable in this sandbox: {out[-300:]}")
        assert p.returncode == 0, f"proc{pid} failed:\n{out}"
        got = _parse_fit_result(out)
        assert got["step"] == want["step"]
        rel = abs(got["checksum"] - want["checksum"]) / max(
            abs(want["checksum"]), 1.0)
        assert rel < 1e-5, (got["checksum"], want["checksum"])


# ---------------------------------------------------------------------------
# Multi-host checkpoint/resume: all processes call orbax save on the shared
# directory (its multiprocess barriers align), DP state is replicated so the
# device_get payload is identical; resume restores the exact step/epoch.
# ---------------------------------------------------------------------------

_CKPT_WORKER = r"""
import sys
pack, ckdir, port, pid = sys.argv[1], sys.argv[2], sys.argv[3], int(sys.argv[4])
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)
from fastvideotagging_tpu.parallel.mesh import init_multihost
init_multihost(f"127.0.0.1:{port}", num_processes=2, process_id=pid)

import jax.numpy as jnp

from fastvideotagging_tpu.config import (
    ClipSamplerConfig, DataConfig, ExperimentConfig, ModelConfig, TrainConfig,
)
from fastvideotagging_tpu.train.fit import fit

def cfg_for(epochs, resume):
    return ExperimentConfig(
        model=ModelConfig(name="tiny3d", num_classes=3,
                          compute_dtype="float32"),
        data=DataConfig(resize_hw=(16, 16), crop_hw=(8, 8),
                        sampler=ClipSamplerConfig(clip_len=4), num_workers=2),
        train=TrainConfig(batch_size=4, num_epochs=epochs, base_lr=0.05,
                          log_every=2, checkpoint_dir=ckdir, lr_steps=(1,),
                          resume=resume),
    )

state = fit(cfg_for(1, False), pack)           # epoch 0, saves at step 4
assert int(jax.device_get(state.step)) == 4
state = fit(cfg_for(2, True), pack)            # resumes, runs epoch 1 only
step = int(jax.device_get(state.step))
leaf = state.params["conv1"]["kernel"]
checksum = float(jnp.sum(jnp.abs(leaf)))
print(f"RESULT loss=0.0 checksum={checksum:.10f} step={step}", flush=True)
jax.distributed.shutdown()
"""


def test_checkpoint_resume_across_processes(tmp_path):
    """fit -> orbax save -> resumed fit on a 2-process mesh completes and
    both processes agree on the final step and parameter checksum."""
    try:
        port = _free_port()
    except OSError as e:  # pragma: no cover
        pytest.skip(f"cannot allocate a localhost port: {e}")
    pack = _make_pack(tmp_path)
    ckdir = str(tmp_path / "ck")

    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _CKPT_WORKER, pack, ckdir, str(port),
             str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd="/root/repo",
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=420)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multi-process checkpoint/resume timed out")

    results = []
    for pid, (p, out) in enumerate(zip(procs, outs)):
        if p.returncode != 0 and "UNAVAILABLE" in out:
            pytest.skip(f"coordinator unavailable in this sandbox: {out[-300:]}")
        assert p.returncode == 0, f"proc{pid} failed:\n{out}"
        assert "resumed from step 4" in out
        results.append(_parse_fit_result(out))
    assert results[0]["step"] == results[1]["step"] == 8
    assert results[0]["checksum"] == results[1]["checksum"]


# ---------------------------------------------------------------------------
# Tensor parallelism ACROSS the process boundary: a (data=2, model=2) mesh
# laid out so the MODEL axis spans the two processes — the channel-sharded
# conv all-gathers ride the DCN path. One real train step, loss and updated
# params equal to the same-mesh single-process run.
# ---------------------------------------------------------------------------

_TP_WORKER = r"""
import sys
mode, port, pid = sys.argv[1], sys.argv[2], int(sys.argv[3])
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4 if mode == "single" else 2)
if mode == "multi":
    from fastvideotagging_tpu.parallel.mesh import init_multihost
    init_multihost(f"127.0.0.1:{port}", num_processes=2, process_id=pid)

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fastvideotagging_tpu.config import (
    ClipSamplerConfig, DataConfig, ExperimentConfig, ModelConfig, TrainConfig,
)
from fastvideotagging_tpu.models import get_model
from fastvideotagging_tpu.parallel.mesh import (
    DATA_AXIS, MODEL_AXIS, param_partition_specs,
)
from fastvideotagging_tpu.train import lr as lr_lib
from fastvideotagging_tpu.train.loop import make_train_step
from fastvideotagging_tpu.train.state import create_train_state

# model axis spans processes: grid rows (data) = [d0, d2], [d1, d3] where
# d0,d1 live on proc0 and d2,d3 on proc1 -> every channel all-gather
# crosses the process boundary (DCN tier).
grid = np.asarray(jax.devices()).reshape(2, 2).T
mesh = Mesh(grid, (DATA_AXIS, MODEL_AXIS))

cfg = ExperimentConfig(
    model=ModelConfig(name="slowfast_r2plus1d", num_classes=5,
                      compute_dtype="float32"),
    data=DataConfig(resize_hw=(16, 16), crop_hw=(16, 16),
                    sampler=ClipSamplerConfig(clip_len=4)),
    train=TrainConfig(batch_size=4),
)
model = get_model("slowfast_r2plus1d", num_classes=5, alpha=2, beta=8,
                  base_width=16, stage_blocks=(1, 1), dropout=0.0,
                  dtype=jnp.float32, shard_axis=MODEL_AXIS)
tx = lr_lib.make_optimizer(cfg.train, steps_per_epoch=10)
sample = jnp.zeros((1, 4, 16, 16, 3), jnp.float32)
boxed = jax.eval_shape(
    lambda: model.init(jax.random.PRNGKey(0), sample, train=False))
specs = param_partition_specs(boxed)["params"]
state = create_train_state(model, tx, jax.random.PRNGKey(0), sample)
state = jax.device_put(state, NamedSharding(mesh, P()))
shardings = jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                         is_leaf=lambda x: isinstance(x, P))
state = state.replace(
    params=jax.tree.map(jax.device_put, state.params, shardings))
assert MODEL_AXIS in str(state.params["slow_stem"]["kernel"].sharding.spec)

def row(fn):
    def cb(index):
        return np.stack([fn(r) for r in
                         range(index[0].start, index[0].stop)])
    return cb

b, t, h, w = 4, 4, 16, 16
def mk(shape, dtype, fn):
    return jax.make_array_from_callback(
        shape,
        NamedSharding(mesh, P(*([DATA_AXIS] + [None] * (len(shape) - 1)))),
        row(fn))

batch = {
    "frames": mk((b, t, h, w, 3), np.uint8, lambda r: np.random.default_rng(
        100 + r).integers(0, 255, (t, h, w, 3)).astype(np.uint8)),
    "labels": mk((b,), np.int32, lambda r: np.int32(r % 5)),
    "crop_tops": mk((b,), np.int32, lambda r: np.int32(0)),
    "crop_lefts": mk((b,), np.int32, lambda r: np.int32(0)),
    "flips": mk((b,), bool, lambda r: False),
    "weights": mk((b,), np.float32, lambda r: np.float32(1.0)),
}

step = make_train_step(model, cfg, donate=False)
new_state, metrics = step(state, batch, jax.random.PRNGKey(7))
loss = float(metrics["loss"])
kern = new_state.params["slow_stem"]["kernel"]
assert MODEL_AXIS in str(kern.sharding.spec), kern.sharding
# full-value checksum: sum over the channel-sharded kernel via jit (the
# reduction itself runs the cross-process collective)
checksum = float(jax.jit(
    lambda p: sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(p)),
    out_shardings=NamedSharding(mesh, P()))(new_state.params))
print(f"RESULT loss={loss:.10f} checksum={checksum:.10f} step=1", flush=True)
if mode == "multi":
    jax.distributed.shutdown()
"""


def test_tp_step_across_processes_matches_single_process():
    """Channel-sharded (TP) train step with the model axis spanning two
    processes == the same step single-process, to fp noise."""
    try:
        port = _free_port()
    except OSError as e:  # pragma: no cover
        pytest.skip(f"cannot allocate a localhost port: {e}")

    single = subprocess.run(
        [sys.executable, "-c", _TP_WORKER, "single", "0", "0"],
        capture_output=True, text=True, timeout=420, cwd="/root/repo",
    )
    assert single.returncode == 0, single.stdout + single.stderr
    want = _parse_fit_result(single.stdout)

    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _TP_WORKER, "multi", str(port), str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd="/root/repo",
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=420)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multi-process TP step timed out")

    for pid, (p, out) in enumerate(zip(procs, outs)):
        if p.returncode != 0 and "UNAVAILABLE" in out:
            pytest.skip(f"coordinator unavailable in this sandbox: {out[-300:]}")
        assert p.returncode == 0, f"proc{pid} failed:\n{out}"
        got = _parse_fit_result(out)
        assert abs(got["loss"] - want["loss"]) < 1e-5, (got, want)
        rel = abs(got["checksum"] - want["checksum"]) / max(
            abs(want["checksum"]), 1.0)
        assert rel < 1e-4, (got["checksum"], want["checksum"])


# ---------------------------------------------------------------------------
# Checkpointing a TP state whose shards span processes: save hands orbax the
# global jax arrays (device_get is illegal here), restore rebuilds them from
# the sharding-carrying abstract tree.
# ---------------------------------------------------------------------------

_TP_CKPT_WORKER = r"""
import sys
ckdir, port, pid = sys.argv[1], sys.argv[2], int(sys.argv[3])
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)
from fastvideotagging_tpu.parallel.mesh import init_multihost
init_multihost(f"127.0.0.1:{port}", num_processes=2, process_id=pid)

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fastvideotagging_tpu.config import TrainConfig
from fastvideotagging_tpu.models import get_model
from fastvideotagging_tpu.parallel.mesh import (
    DATA_AXIS, MODEL_AXIS, param_partition_specs,
)
from fastvideotagging_tpu.train import lr as lr_lib
from fastvideotagging_tpu.train.checkpoint import CheckpointManager
from fastvideotagging_tpu.train.state import create_train_state

grid = np.asarray(jax.devices()).reshape(2, 2).T  # model axis spans procs
mesh = Mesh(grid, (DATA_AXIS, MODEL_AXIS))
model = get_model("slowfast_r2plus1d", num_classes=5, alpha=2, beta=8,
                  base_width=16, stage_blocks=(1, 1), dropout=0.0,
                  dtype=jnp.float32, shard_axis=MODEL_AXIS)
tx = lr_lib.make_optimizer(TrainConfig(batch_size=4), steps_per_epoch=10)
sample = jnp.zeros((1, 4, 16, 16, 3), jnp.float32)
boxed = jax.eval_shape(
    lambda: model.init(jax.random.PRNGKey(0), sample, train=False))
specs = param_partition_specs(boxed)["params"]
state = create_train_state(model, tx, jax.random.PRNGKey(0), sample)
state = jax.device_put(state, NamedSharding(mesh, P()))
shardings = jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                         is_leaf=lambda x: isinstance(x, P))
state = state.replace(
    params=jax.tree.map(jax.device_put, state.params, shardings))
kern = state.params["slow_stem"]["kernel"]
assert MODEL_AXIS in str(kern.sharding.spec)
assert not kern.is_fully_addressable  # the shards really span processes

def checksum(params):
    return float(jax.jit(
        lambda p: sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(p)),
        out_shardings=NamedSharding(mesh, P()))(params))

want = checksum(state.params)
ck = CheckpointManager(ckdir)
ck.save(1, state, {"epoch": 3})
ck.wait()
restored, extra = ck.restore(state)
assert extra["epoch"] == 3, extra
rk = restored.params["slow_stem"]["kernel"]
assert MODEL_AXIS in str(rk.sharding.spec), rk.sharding
got = checksum(restored.params)
assert got == want, (got, want)
print(f"RESULT loss=0.0 checksum={got:.10f} step=1", flush=True)
jax.distributed.shutdown()
"""


def test_tp_checkpoint_roundtrip_across_processes(tmp_path):
    """Save + restore of a channel-sharded TrainState whose model axis spans
    two processes: bit-equal parameter checksum, sharding preserved."""
    try:
        port = _free_port()
    except OSError as e:  # pragma: no cover
        pytest.skip(f"cannot allocate a localhost port: {e}")
    ckdir = str(tmp_path / "tpck")

    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _TP_CKPT_WORKER, ckdir, str(port),
             str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd="/root/repo",
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=420)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multi-process TP checkpoint timed out")

    results = []
    for pid, (p, out) in enumerate(zip(procs, outs)):
        if p.returncode != 0 and "UNAVAILABLE" in out:
            pytest.skip(f"coordinator unavailable in this sandbox: {out[-300:]}")
        assert p.returncode == 0, f"proc{pid} failed:\n{out}"
        results.append(_parse_fit_result(out))
    assert results[0]["checksum"] == results[1]["checksum"]


# ---------------------------------------------------------------------------
# Graceful stop is COLLECTIVE: a SIGTERM on ONE process stops BOTH cleanly
# (the non-signaled process learns via the per-step flag allgather; without
# it, the signaled side's orbax barrier and the other side's psum deadlock).
# ---------------------------------------------------------------------------

_STOP_WORKER = r"""
import sys
pack, ckdir, port, pid = sys.argv[1], sys.argv[2], sys.argv[3], int(sys.argv[4])
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)
from fastvideotagging_tpu.parallel.mesh import init_multihost
init_multihost(f"127.0.0.1:{port}", num_processes=2, process_id=pid)

from fastvideotagging_tpu.config import (
    ClipSamplerConfig, DataConfig, ExperimentConfig, ModelConfig, TrainConfig,
)
from fastvideotagging_tpu.train.fit import fit

cfg = ExperimentConfig(
    model=ModelConfig(name="tiny3d", num_classes=3, compute_dtype="float32"),
    data=DataConfig(resize_hw=(16, 16), crop_hw=(8, 8),
                    sampler=ClipSamplerConfig(clip_len=4), num_workers=2),
    train=TrainConfig(batch_size=4, num_epochs=500, base_lr=0.05,
                      log_every=1, checkpoint_dir=ckdir, lr_steps=(400,)),
)
state = fit(cfg, pack)
step = int(jax.device_get(state.step))
print(f"RESULT loss=0.0 checksum=0.0 step={step}", flush=True)
jax.distributed.shutdown()
"""


def test_graceful_stop_is_collective_across_processes(tmp_path):
    import os
    import signal
    import time

    try:
        port = _free_port()
    except OSError as e:  # pragma: no cover
        pytest.skip(f"cannot allocate a localhost port: {e}")
    pack = _make_pack(tmp_path)
    ckdir = str(tmp_path / "ck")

    logs = [open(tmp_path / f"out{pid}.log", "w+") for pid in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _STOP_WORKER, pack, ckdir, str(port),
             str(pid)],
            stdout=logs[pid], stderr=subprocess.STDOUT, text=True,
            cwd="/root/repo",
        )
        for pid in range(2)
    ]
    try:
        # wait until proc0 has logged a training step, then signal ONLY proc0
        deadline = time.time() + 300
        while time.time() < deadline:
            logs[0].flush()
            txt = open(logs[0].name).read()
            if "UNAVAILABLE" in txt:
                pytest.skip(f"coordinator unavailable: {txt[-300:]}")
            if "samples_per_sec" in txt:
                break
            if procs[0].poll() is not None:
                pytest.fail(f"proc0 exited early:\n{txt[-2000:]}")
            time.sleep(1.0)
        else:
            pytest.fail("proc0 never reached a training step")
        os.kill(procs[0].pid, signal.SIGTERM)
        for p in procs:
            p.communicate(timeout=180)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("collective graceful stop deadlocked")
    outs = [open(lg.name).read() for lg in logs]
    for lg in logs:
        lg.close()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{pid} failed:\n{out[-2000:]}"
        assert "RESULT" in out, f"proc{pid} did not finish fit:\n{out[-800:]}"
        assert "stopping at step" in out  # both sides took the graceful path
