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
