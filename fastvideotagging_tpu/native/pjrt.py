"""Build + drive the native C++ PJRT serving runner (pjrt_runner.cc).

The runner is the no-Python deployment tier: it dlopens a PJRT plugin
(the TPU tunnel plugin here; libtpu on a real pod), compiles the StableHLO
module exported by evaluation/serving.py, and executes it on raw input
files. This module builds the binary on demand (g++ against the PJRT C API
header shipped in the environment's tensorflow include tree) and provides a
subprocess wrapper used by tests to cross-check the native outputs against
the in-process jax path.
"""

from __future__ import annotations

import json
import os
import subprocess
import sysconfig

import numpy as np

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "pjrt_runner.cc")
_BIN = os.path.join(_HERE, "_pjrt_runner")

_DTYPES = {"u8": np.uint8, "s32": np.int32, "f32": np.float32,
           "pred": np.bool_}


def _pjrt_header_dir() -> str:
    """Locate an include root containing xla/pjrt/c/pjrt_c_api.h."""
    site = sysconfig.get_paths()["purelib"]
    candidates = [
        os.path.join(site, "tensorflow", "include"),
        os.path.join(site, "jaxlib", "include"),
    ]
    for c in candidates:
        if os.path.exists(os.path.join(c, "xla", "pjrt", "c", "pjrt_c_api.h")):
            return c
    raise FileNotFoundError(
        "xla/pjrt/c/pjrt_c_api.h not found under " + " or ".join(candidates))


def build_runner(force: bool = False) -> str:
    """Compile pjrt_runner.cc -> cached binary path."""
    if (not force and os.path.exists(_BIN)
            and os.path.getmtime(_BIN) >= os.path.getmtime(_SRC)):
        return _BIN
    include = _pjrt_header_dir()
    cmd = ["g++", "-O2", "-std=c++17", "-pthread", f"-I{include}", "-o",
           _BIN, _SRC, "-ldl"]
    subprocess.run(cmd, check=True, capture_output=True, timeout=300)
    return _BIN


def default_plugin() -> str | None:
    """Best local PJRT plugin .so (the axon TPU tunnel on this machine)."""
    env = os.environ.get("PJRT_LIBRARY_PATH")
    if env and os.path.exists(env):
        return env
    for cand in ("/opt/axon/libaxon_pjrt.so",):
        if os.path.exists(cand):
            return cand
    return None


def plugin_client_options(backend: str | None = None) -> dict:
    """Recover the NamedValue options jax registered for a plugin backend.

    Pool-scheduled TPU plugins refuse PJRT_Client_Create without their
    options (scheduling/session metadata). jax's registration (e.g. the
    machine's sitecustomize) already built the correct dict; dig it out of
    the backend factory closure so the native runner creates its client the
    same way. A fresh session_id is minted so the runner's session cannot
    collide with any jax client in this or another process.
    """
    import functools
    import uuid

    from jax._src import xla_bridge

    backend = backend or os.environ.get("JAX_PLATFORMS", "").split(",")[0]
    reg = xla_bridge._backend_factories.get(backend)
    if reg is None:
        return {}

    def find(obj, depth=0):
        if depth > 6:
            return None
        if isinstance(obj, dict) and obj and all(
                isinstance(k, str) for k in obj):
            if any(isinstance(v, (str, int)) for v in obj.values()):
                return obj
        if isinstance(obj, functools.partial):
            for a in obj.args + tuple(obj.keywords.values()):
                r = find(a, depth + 1)
                if r is not None:
                    return r
        if callable(obj) and getattr(obj, "__closure__", None):
            for cell in obj.__closure__:
                r = find(cell.cell_contents, depth + 1)
                if r is not None:
                    return r
        return None

    opts = dict(find(getattr(reg, "factory", reg)) or {})
    if "session_id" in opts:
        opts["session_id"] = str(uuid.uuid4())
    return opts


def plugin_client_options_for(plugin_path: str,
                              backend: str | None = None) -> dict:
    """Client-create options for a specific plugin .so.

    Tries the backend named by the plugin filename (libaxon_pjrt.so ->
    'axon') before the process's JAX_PLATFORMS — the two diverge exactly
    in the hermetic test harness, where conftest pins JAX_PLATFORMS=cpu
    but the native child still drives the TPU plugin.
    """
    import re

    cands = []
    if backend:
        cands.append(backend)
    m = re.match(r"lib(\w+?)_pjrt", os.path.basename(plugin_path))
    if m:
        cands.append(m.group(1))
    envb = os.environ.get("JAX_PLATFORMS", "").split(",")[0]
    if envb:
        cands.append(envb)
    for b in cands:
        opts = plugin_client_options(b)
        if opts:
            return opts
    return {}


def _dtype_tag(arr: np.ndarray) -> str:
    for tag, dt in _DTYPES.items():
        if arr.dtype == dt:
            return tag
    raise TypeError(f"unsupported input dtype {arr.dtype}")


def make_compile_options(path: str) -> None:
    """Serialized CompileOptionsProto (1 replica / 1 partition) via jax."""
    from jax._src import compiler
    from jax._src.lib import xla_client as xc

    opts = compiler.get_compile_options(num_replicas=1, num_partitions=1)
    assert isinstance(opts, xc.CompileOptions)
    with open(path, "wb") as f:
        f.write(opts.SerializeAsString())


def run_serving(module_path: str, inputs: list[np.ndarray],
                workdir: str, plugin: str | None = None,
                client_options: dict | None = None,
                timeout: int = 600, bench: int = 1):
    """Execute an exported StableHLO module in the NATIVE runner process.

    Returns the program outputs as numpy arrays (f32/u8/s32 supported).
    With ``bench`` > 1, each input array carries a leading instance axis of
    that size (DISTINCT contents per instance — the runtime dedupes
    identical dispatches); the runner reports dedupe-proof two-point-slope
    throughput and the return value becomes ``(outputs, bench_dict)``.
    """
    plugin = plugin or default_plugin()
    if plugin is None:
        raise RuntimeError("no PJRT plugin .so found on this machine")
    binary = build_runner()
    os.makedirs(workdir, exist_ok=True)
    cmd = [binary, "--plugin", plugin, "--module", module_path,
           "--output", os.path.join(workdir, "out")]
    if bench > 1:
        cmd += ["--bench", str(bench)]
    if client_options is None:
        client_options = plugin_client_options_for(plugin)
    for k, v in client_options.items():
        tag = "int" if isinstance(v, (bool, int)) else "str"
        cmd += ["--client-option", f"{k}={tag}:{int(v) if tag == 'int' else v}"]
    for i, arr in enumerate(inputs):
        arr = np.ascontiguousarray(arr)
        path = os.path.join(workdir, f"in{i}.bin")
        arr.tofile(path)
        dims = ",".join(str(d) for d in
                        (arr.shape[1:] if bench > 1 else arr.shape))
        cmd += ["--input", f"{_dtype_tag(arr)}:{dims}:{path}"]
    opts_path = os.path.join(workdir, "compile_options.pb")
    make_compile_options(opts_path)
    cmd += ["--compile-options", opts_path]

    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=timeout)
    if proc.returncode != 0:
        raise RuntimeError(
            f"pjrt_runner failed (rc={proc.returncode}):\n{proc.stderr}")
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    outs = _load_outputs(summary["outputs"])
    if bench > 1:
        return outs, summary.get("bench")
    return outs


class NativeServerDied(RuntimeError):
    """The pjrt_runner --serve child exited; the server is unusable.

    Raised instead of a plain RuntimeError so request-loop callers
    (cli.serve) can fail FAST — a dead daemon would otherwise turn every
    remaining request of a backfill into an error line."""


def _load_outputs(entries) -> list[np.ndarray]:
    outs = []
    for o in entries:
        dt = _DTYPES.get(o["dtype"])
        if dt is None:
            raise TypeError(f"runner returned unsupported dtype {o['dtype']}")
        outs.append(np.fromfile(o["file"], dtype=dt).reshape(o["shape"]))
    return outs


class NativeServer:
    """Long-running native serving daemon over ``pjrt_runner --serve``.

    Compiles the exported StableHLO module ONCE in a no-Python child
    process, then answers requests over a stdin/stdout line protocol —
    the deployment tier behind ``cli.serve --engine native``. Python only
    writes raw input files and parses one JSON line per request; all
    device work (staging, execute, readback) happens in the C++ runner.

        with NativeServer(module, [((2, 4, 40, 56, 3), np.uint8)], wd) as s:
            scores, = s.request([clips_u8])

    Note the ONE-TPU-CLIENT rule: while this server is alive no jax TPU
    client may exist in any process (CLAUDE.md); the front-end keeps to
    host-side numpy work.
    """

    def __init__(self, module_path: str, specs, workdir: str,
                 plugin: str | None = None, client_options: dict | None = None,
                 ready_timeout: float = 600.0, pipeline: int = 0):
        import threading
        import time

        plugin = plugin or default_plugin()
        if plugin is None:
            raise RuntimeError("no PJRT plugin .so found on this machine")
        binary = build_runner()
        os.makedirs(workdir, exist_ok=True)
        self.workdir = workdir
        self.specs = [(tuple(shape), np.dtype(dt)) for shape, dt in specs]
        self.pipeline = int(pipeline)
        self._req_id = 0
        self._desync = False
        opts_path = os.path.join(workdir, "compile_options.pb")
        make_compile_options(opts_path)
        cmd = [binary, "--plugin", plugin, "--module", module_path,
               "--serve", "--output", os.path.join(workdir, "out"),
               "--compile-options", opts_path]
        if self.pipeline > 0:
            cmd += ["--pipeline", str(self.pipeline)]
        for shape, dt in self.specs:
            tag = _dtype_tag(np.empty((0,), dt))
            cmd += ["--serve-input",
                    f"{tag}:{','.join(str(d) for d in shape)}"]
        if client_options is None:
            client_options = plugin_client_options_for(plugin)
        for k, v in client_options.items():
            tag = "int" if isinstance(v, (bool, int)) else "str"
            cmd += ["--client-option",
                    f"{k}={tag}:{int(v) if tag == 'int' else v}"]
        self._proc = subprocess.Popen(
            cmd, stdin=subprocess.PIPE, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True)
        # stderr drains on a thread (compile logs may precede "ready")
        self._ready = threading.Event()
        self._stderr: list[str] = []

        def _drain():
            for line in self._proc.stderr:
                if line.strip() == "ready":
                    self._ready.set()
                else:
                    self._stderr.append(line)
            self._ready.set()  # EOF: unblock waiters (startup failure)

        self._drainer = threading.Thread(target=_drain, daemon=True)
        self._drainer.start()
        deadline = time.monotonic() + ready_timeout
        while not self._ready.wait(timeout=min(1.0, ready_timeout)):
            if time.monotonic() > deadline:
                self.close()
                raise TimeoutError("native server never became ready")
        if self._proc.poll() is not None:
            raise NativeServerDied(
                "native server died during startup:\n"
                + "".join(self._stderr))

    def _submit(self, inputs) -> tuple[int, list[str]]:
        """Write one request's input files + stdin line; returns (request
        id, file paths). Delete the files only after the matching reply —
        the daemon reads them when it STAGES the request, which in
        pipelined mode can happen well after the write."""
        if self._desync:
            raise NativeServerDied(
                "native server protocol is out of sync (an earlier reply "
                "was lost or mismatched); close() and start a fresh server")
        if len(inputs) != len(self.specs):
            raise ValueError(
                f"{len(inputs)} inputs for {len(self.specs)} specs")
        # Validate EVERYTHING before the request id is allocated or any
        # file is written: a client-side ValueError must leave the line
        # protocol untouched (ids are matched against replies).
        arrays = []
        for i, (arr, (shape, dt)) in enumerate(zip(inputs, self.specs)):
            arr = np.ascontiguousarray(arr, dtype=dt)
            if arr.shape != shape:
                raise ValueError(
                    f"input {i} shape {arr.shape} != spec {shape}")
            arrays.append(arr)
        rid = self._req_id  # consumed only once the input files exist: an
        # IO failure here must not desync the id counter from the daemon's
        # line counter (it never sees this request)
        paths = []
        try:
            for i, arr in enumerate(arrays):
                path = os.path.join(self.workdir, f"req{rid}_in{i}.bin")
                arr.tofile(path)
                paths.append(path)
        except OSError:
            for p in paths:
                if os.path.exists(p):
                    os.unlink(p)
            raise
        self._req_id += 1
        try:
            self._proc.stdin.write(" ".join(paths) + "\n")
            self._proc.stdin.flush()
        except (BrokenPipeError, OSError, ValueError):
            # ValueError: write on a CLOSED stdin (after close()) — the same
            # soft-error type _read_reply uses for per-request daemon errors,
            # so it must become NativeServerDied here or a backfill loop
            # would retry every request against a closed server
            for p in paths:
                os.unlink(p)
            self._desync = True  # dead server: unusable either way
            raise NativeServerDied(
                "native server exited or is closed:\n" + "".join(self._stderr))
        return rid, paths

    def _read_reply(self, rid: int, paths: list[str]) -> list[np.ndarray]:
        """Read the reply for request ``rid``; cleans up its input files."""
        try:
            line = self._proc.stdout.readline()
        finally:
            for p in paths:
                if os.path.exists(p):
                    os.unlink(p)
        if not line:
            self._desync = True  # dead server: unusable either way
            raise NativeServerDied(
                "native server exited:\n" + "".join(self._stderr))
        reply = json.loads(line)
        if reply.get("request") != rid:
            self._desync = True
            raise NativeServerDied(
                f"native server reply out of sync: expected request {rid}, "
                f"got {reply.get('request')}")
        if "error" in reply:
            raise ValueError(f"native server request failed: {reply['error']}")
        outs = _load_outputs(reply["outputs"])
        for o in reply["outputs"]:
            os.unlink(o["file"])
        return outs

    def request(self, inputs) -> list[np.ndarray]:
        """One synchronous request: arrays in (matching specs) -> outputs."""
        return self._read_reply(*self._submit(inputs))

    def request_many(self, batches, depth: int | None = None):
        """Pipelined requests: yields each batch's outputs IN ORDER while
        keeping up to ``depth`` requests in flight (default: the daemon's
        --pipeline stage-ahead + 1 executing, or 2). With a plain daemon
        this overlaps host-side framing with device work; with
        ``pipeline > 0`` the daemon additionally overlaps H2D staging of
        request N+k with execution of request N.

        The daemon's per-request fault isolation survives pipelining: if a
        reply raises (soft daemon error) or the consumer abandons the
        generator, the remaining in-flight replies are DRAINED (blocking
        reads, errors swallowed) so the line protocol stays in sync and
        the server remains usable for further requests."""
        from collections import deque

        depth = depth if depth is not None else max(2, self.pipeline + 1)
        if depth < 1:
            raise ValueError(f"depth must be >= 1 (got {depth})")
        inflight: deque[tuple[int, list[str]]] = deque()
        try:
            for batch in batches:
                if len(inflight) >= depth:
                    rid, paths = inflight.popleft()
                    yield self._read_reply(rid, paths)
                inflight.append(self._submit(batch))
            while inflight:
                rid, paths = inflight.popleft()
                yield self._read_reply(rid, paths)
        finally:
            while inflight:
                rid, paths = inflight.popleft()
                try:
                    self._read_reply(rid, paths)
                except ValueError:
                    pass  # soft per-request error; protocol still in sync
                except NativeServerDied:
                    self._desync = True  # dead or mismatched — unusable
                    for _rid, ps in inflight:
                        for p in ps:
                            if os.path.exists(p):
                                os.unlink(p)
                    break

    def close(self) -> None:
        if self._proc.poll() is None:
            try:
                self._proc.stdin.close()
                self._proc.wait(timeout=30)
            except Exception:
                self._proc.kill()
                self._proc.wait()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
