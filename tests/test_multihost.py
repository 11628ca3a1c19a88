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
