"""Fusion-level train-step profiler (SURVEY.md §6.1 tracing tier).

``jax.profiler`` traces through the axon tunnel report correct per-fusion
device events, but the fusion names (``convert_reduce_fusion.17``) are
meaningless without the HLO. This tool joins the two: it captures a trace of
the jitted train step, dumps the optimized HLO, maps every fusion instruction
to its ``op_name`` metadata (model-layer path) and the convolutions inside
it, estimates each fusion's FLOPs from the conv shapes, and prints a table
of device time, achieved TF/s, and attribution.

This is how the round-2 perf analysis was produced (see PERF.md): it showed
the step is ~85-90% convolution-fusion kernels with BatchNorm reductions
fused into their epilogues — overturning the round-1 guess that 40% of the
step was standalone BN/elementwise passes.

Usage:
    python -m fastvideotagging_tpu.utils.step_profiler --model r2plus1d_18
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import re


def _dims(s: str) -> list[int]:
    m = re.search(r"\[([\d,]*)\]", s)
    return [int(x) for x in m.group(1).split(",")] if m and m.group(1) else []


_DTYPE_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
                "s8": 1, "u8": 1, "pred": 1, "s16": 2, "u16": 2}


def _nbytes(s: str) -> float:
    """Byte size of an HLO type string like 'bf16[32,16,3136,128]{3,2,1,0}'."""
    m = re.match(r"([a-z0-9]+)\[", s or "")
    if not m:
        return 0.0
    n = float(_DTYPE_BYTES.get(m.group(1), 4))
    for d in _dims(s):
        n *= d
    return n


def parse_hlo(txt: str):
    """-> (fusion instr -> (called computation, op_name),
          computation -> [(conv out shape, window, flops)])."""
    comps: dict[str, list[str]] = {}
    cur, buf = None, []
    for ln in txt.splitlines():
        if ln.endswith("{") and not ln.strip().startswith("ROOT"):
            m = re.match(r"^\s*%?([\w\.\-]+)", ln)
            cur, buf = m.group(1), []
        elif cur and ln.strip() == "}":
            comps[cur] = buf
            cur = None
        elif cur is not None:
            buf.append(ln.strip())

    comp_convs: dict[str, list] = {}
    for cname, body in comps.items():
        shapes: dict[str, str] = {}
        convs = []
        for ln in body:
            m = re.match(r"^(?:ROOT )?%?([\w\.\-]+) = (\S+(?:\[[^\]]*\]\S*)?)",
                         ln)
            if m:
                shapes[m.group(1)] = m.group(2)
            mc = re.search(
                r"%?[\w\.\-]+ = (\S+) convolution\(%?([\w\.\-]+), "
                r"%?([\w\.\-]+)\).*?window=\{([^}]*)\}", ln)
            if mc:
                out = _dims(mc.group(1))
                rhs = _dims(shapes.get(mc.group(3), ""))
                po = pr = 1
                for v in out:
                    po *= v
                for v in rhs:
                    pr *= v
                cout = out[-1] if out else 1
                # rhs = (k..., cin, cout) -> contraction size = prod(rhs)/cout
                fl = 2.0 * po * (pr / max(cout, 1)) if rhs else 0.0
                nbytes = (_nbytes(mc.group(1))
                          + _nbytes(shapes.get(mc.group(2), ""))
                          + _nbytes(shapes.get(mc.group(3), "")))
                convs.append((mc.group(1), mc.group(4), fl, nbytes))
        if convs:
            comp_convs[cname] = convs

    fus = {}
    for m in re.finditer(
            r"%([\w\.\-]+) = .*? fusion\([^\n]*?calls=%?([\w\.\-]+)"
            r"[^\n]*?metadata=\{op_name=\"([^\"]+)\"", txt):
        fus[m.group(1)] = (m.group(2), m.group(3))
    return fus, comp_convs


def _type_bytes(s: str) -> float:
    """Bytes of an HLO type string; tuples sum their elements."""
    total = 0.0
    for m in re.finditer(r"([a-z0-9]+)\[([\d,]*)\]", s or ""):
        n = float(_DTYPE_BYTES.get(m.group(1), 4))
        if m.group(2):
            for d in m.group(2).split(","):
                n *= int(d)
        total += n
    return total


# type[dims]{perm:T(s,l)...} — dims, layout permutation, and tile (optional)
_SHAPE_RE = re.compile(
    r"([a-z0-9]+)\[([\d,]*)\]"
    r"(?:\{([\d,]*)(?::[^}]*?T\((\d+),(\d+)\))?[^}]*\})?")


def _type_bytes_padded(s: str) -> float:
    """PHYSICAL bytes of an HLO type string: each array padded to its
    layout tile (``{perm:T(sub,lane)}``). TPU buffers are tiled in HBM —
    a ``bf16[...,64]`` array under the (8,128) tile occupies (and
    transfers) 2x its logical bytes because the minor dimension pads to
    the 128-lane vreg width. Tuples sum their elements; shapes without a
    tile annotation fall back to logical bytes."""
    total = 0.0
    for m in _SHAPE_RE.finditer(s or ""):
        dtype, dims_s, perm_s, sub_s, lane_s = m.groups()
        n = float(_DTYPE_BYTES.get(dtype, 4))
        dims = [int(d) for d in dims_s.split(",")] if dims_s else []
        if dims and perm_s and sub_s:
            perm = [int(d) for d in perm_s.split(",")]
            sub, lane = int(sub_s), int(lane_s)
            # HLO layouts list dims MINOR-to-major: perm[0] is the minor
            # dim (padded to `lane`), perm[1] the second-minor (to `sub`)
            pad = dict.fromkeys(range(len(dims)), 1)
            if len(perm) >= 1:
                pad[perm[0]] = lane
            if len(perm) >= 2:
                pad[perm[1]] = sub
            for i, d in enumerate(dims):
                p = pad.get(i, 1)
                n *= -(-d // p) * p
        else:
            for d in dims:
                n *= d
        total += n
    return total


def _split_instr(ln: str):
    """'%name = TYPE opcode(args), ...' -> (name, type_str, opcode, args)
    or None. Handles tuple types and layout annotations (whose `T(8,128)`
    parens would defeat naive regex splitting) by balanced-paren scanning:
    a non-tuple type is one whitespace-free token; a tuple type runs from
    '(' to its balanced ')'."""
    m = re.match(r"^\s*(?:ROOT )?%?([\w\.\-]+) = ", ln)
    if not m:
        return None
    name = m.group(1)
    rest = ln[m.end():]
    if rest.startswith("("):
        depth = 0
        for i, ch in enumerate(rest):
            depth += (ch == "(") - (ch == ")")
            if depth == 0:
                break
        else:
            return None
        otype, rest = rest[:i + 1], rest[i + 1:]
    else:
        sp = rest.find(" ")
        if sp < 0:
            return None
        otype, rest = rest[:sp], rest[sp:]
    om = re.match(r"\s*([\w\-]+)\(", rest)
    if not om:
        return None
    args = rest[om.end():]
    depth = 1
    for i, ch in enumerate(args):
        depth += (ch == "(") - (ch == ")")
        if depth == 0:
            args = args[:i]
            break
    return name, otype, om.group(1), args


def parse_fusion_bytes(txt: str) -> dict[str, float]:
    """-> {instruction name: total operand+output PHYSICAL bytes} for every
    fusion (and custom-call) instruction of the ENTRY computation.

    This is the honest per-fusion BYTE floor: a fusion kernel must read
    each distinct operand once and write its output once, so
    bytes / HBM-bandwidth lower-bounds its device time regardless of
    emitter quality — the closure criterion PERF.md's temporal-kernel
    analysis established at the op level, lifted to the compiled step's
    actual fusion granularity. Bytes are TILE-PADDED (_type_bytes_padded):
    TPU buffers are tiled in HBM, so a C=64-minor tensor under the
    (8,128) tile physically moves 2x its logical bytes — that traffic is
    real, not emitter slack. (Operands the emitter can elide —
    broadcasted scalars — are negligible at these tensor sizes.)
    """
    # entry computation body: from the "ENTRY" line to its closing brace
    m = re.search(r"^ENTRY [^\n]*\{$", txt, re.M)
    if not m:
        return {}
    body = txt[m.end():]
    end = re.search(r"^\}", body, re.M)
    body = body[:end.start()] if end else body

    # signature parameter shapes (with layouts) from the ENTRY line
    shapes: dict[str, str] = {}
    for pm in re.finditer(
            r"([\w\.\-]+): ([a-z0-9]+\[[\d,]*\](?:\{[^}]*\})?)",
            txt[m.start():m.end()]):
        shapes[pm.group(1)] = pm.group(2)
    parsed = []
    for ln in body.splitlines():
        inst = _split_instr(ln)
        if not inst:
            continue
        shapes[inst[0]] = inst[1]
        parsed.append(inst)
    out: dict[str, float] = {}
    for name, otype, opcode, args in parsed:
        if opcode not in ("fusion", "custom-call"):
            continue
        total = _type_bytes_padded(otype)
        seen = set()
        for am in re.finditer(r"%?([\w\.\-]+)", args):
            a = am.group(1)
            if a in seen:
                continue
            seen.add(a)
            total += _type_bytes_padded(shapes.get(a, ""))
        out[name] = total
    return out


def conv_roofline_seconds(hlo_text: str, peak_flops: float,
                          mem_bw: float) -> tuple[float, float, int]:
    """Textbook op-level conv roofline of a compiled step.

    For every `convolution` instruction in the optimized HLO (fwd, dx and dw
    forms alike), the minimum achievable device time is
    max(flops / peak_flops, operand+result bytes / mem_bw) — MXU-bound for
    the spatial factors, HBM-bound for the temporal kx1x1 factors whose
    arithmetic intensity sits below the machine balance point. The sum over
    all convs is the fastest any schedule could run the step's convolutions
    on this chip (measured evidence in benchmarks/fusion_ladder.py: XLA's
    in-graph fusion already runs a conv pair FASTER than the sum of the
    bare convs, so non-conv work rides along and the conv roofline is the
    binding one).

    Returns (roofline_seconds, total_conv_flops, n_convs).
    """
    _, comp_convs = parse_hlo(hlo_text)
    sec = 0.0
    fl_tot = 0.0
    n = 0
    for convs in comp_convs.values():
        for _out, _win, fl, nbytes in convs:
            sec += max(fl / peak_flops, nbytes / mem_bw)
            fl_tot += fl
            n += 1
    return sec, fl_tot, n


def load_trace_durations(trace_dir: str, n_steps: int):
    """-> ({op name: us/step}, steps_captured, device_us_per_step).

    Aggregates 'XLA Ops'-track event durations, normalized by the number
    of module executions ACTUALLY captured on the 'XLA Modules' track —
    NOT by the requested n_steps. Through the axon tunnel the trace
    window routinely captures fewer executions than were dispatched
    (measured 2026-08-19: 1 of 4 — dividing by n_steps then understates
    every fusion 4x while wall time says otherwise). The module span's
    own duration is the true device time per step, returned for
    cross-checking against wall-clock measurements."""
    files = glob.glob(trace_dir + "/**/*.trace.json.gz", recursive=True)
    if not files:
        raise FileNotFoundError(f"no trace under {trace_dir}")
    ev = json.load(gzip.open(sorted(files)[-1]))["traceEvents"]
    pid_names = {e["pid"]: e["args"].get("name", "") for e in ev
                 if e.get("ph") == "M" and e.get("name") == "process_name"}
    tid_names = {(e["pid"], e["tid"]): e["args"].get("name", "") for e in ev
                 if e.get("ph") == "M" and e.get("name") == "thread_name"}

    def on_tpu_track(e, track):
        return (e.get("ph") == "X" and "dur" in e
                and "TPU" in pid_names.get(e.get("pid"), "")
                and tid_names.get((e.get("pid"), e.get("tid"))) == track)

    # the traced step program = the module with the most device time;
    # its execution count is the honest normalizer
    mods: dict[str, list] = collections.defaultdict(list)
    for e in ev:
        if on_tpu_track(e, "XLA Modules"):
            mods[e["name"]].append(e["dur"])
    steps = n_steps
    dev_us = 0.0
    if mods:
        top = max(mods.values(), key=sum)
        steps = len(top)
        dev_us = sum(top) / steps
    dur: dict[str, float] = collections.defaultdict(float)
    info: dict[str, dict] = {}
    for e in ev:
        if on_tpu_track(e, "XLA Ops"):
            dur[e["name"]] += e["dur"] / steps
            a = e.get("args") or {}
            if e["name"] not in info and ("long_name" in a or "tf_op" in a):
                # the event's own executable-side metadata: exact FLOPs,
                # the full typed instruction signature (floor bytes), and
                # the op attribution — immune to the instruction-renaming
                # that breaks HLO-text name matching (measured: the
                # compiled as_text() numbering differs from the
                # executable's for ~10% of fusions)
                info[e["name"]] = {
                    "flops": float(a.get("model_flops", 0) or 0),
                    "long_name": a.get("long_name", ""),
                    "tf_op": (a.get("tf_op") or "").rstrip(":"),
                }
    return dur, steps, dev_us, info


_NON_HBM = re.compile(r"S\(\d+\)")  # S(1)=VMEM-staged, S(2)=SMEM scalars


def _long_name_bytes(long_name: str, hbm_only: bool = True) -> float:
    """Physical (tile-padded) operand+output bytes of a traced fusion's
    ``long_name`` signature — '%f = TYPE fusion(T1 %a, T2 %b, ...), ...'.
    Distinct operands only (a buffer read twice streams in once).

    ``hbm_only``: skip shapes annotated with an alternate memory space
    (``S(1)`` — XLA's memory-space assignment stages these into VMEM via
    overlapped async copies, so the consumer reads them at VMEM, not HBM,
    bandwidth; charging HBM for them double-counts the copy's traffic and
    produces floors ABOVE measured time — observed on the _tpu step's
    downsample convs, 628us floor vs 371us measured)."""
    inst = _split_instr(long_name)
    if not inst:
        return 0.0
    _name, otype, _opcode, args = inst

    def shape_bytes(s: str) -> float:
        if hbm_only and _NON_HBM.search(s):
            # tuples mixing spaces: count only the HBM elements
            return sum(_type_bytes_padded(m.group(0))
                       for m in _SHAPE_RE.finditer(s)
                       if not _NON_HBM.search(m.group(0)))
        return _type_bytes_padded(s)

    # tuple outputs: walk elements so per-element S() annotations apply
    total = shape_bytes(otype)
    seen = set()
    for m in re.finditer(
            r"([a-z0-9]+\[[\d,]*\](?:\{[^}]*\})?)\s+%([\w\.\-]+)", args):
        if m.group(2) in seen:
            continue
        seen.add(m.group(2))
        total += shape_bytes(m.group(1))
    return total


def attribute(dur, fus, comp_convs, top: int = 30,
              peak_flops: float = 197e12, mem_bw: float = 819e9,
              fus_bytes: dict | None = None, ev_info: dict | None = None):
    """-> (rows sorted by time, category totals).

    Row: (us, TF/s, roofline_us, op, convs) — roofline_us is the fusion's
    honest floor: max(FLOP time, physical operand+output bytes / HBM
    bandwidth). Sources, best first: the trace event's own metadata
    (``ev_info`` from load_trace_durations — exact model_flops + the
    typed long_name signature, immune to HLO-text renaming), then
    ``fus_bytes`` (parse_fusion_bytes on the in-process HLO), then the
    summed per-conv max(FLOP-time, byte-time) of the convs inside it.
    Bytes are tile-padded (physical) and conv FLOP floors are MXU
    lane-aware; us - roofline_us is the fusion's slack — the time an
    ideal emitter could still recover at the compiler's chosen fusion
    granularity."""
    fus_bytes = fus_bytes or {}
    ev_info = ev_info or {}
    rows = []
    cat = collections.defaultdict(float)
    async_bytes = 0.0  # overlapped DMA traffic (copy-start/slice-start)

    def conv_flop_floor(c, is_bwd):
        # MXU lane-aware FLOP floor: result channels map to the 128 MXU
        # lanes in whole tile passes, so a conv's FLOP ceiling is
        # peak * cout / (ceil(cout/128)*128) — cout=64 runs one half-idle
        # pass (0.5, round-2 analysis), and cout=144 runs a full pass plus
        # a 16/128 pass (0.5625 — round 5: the original min(cout,128)/128
        # rule priced every cout>128 at FULL peak, which is exactly the
        # "M=144/230 mid fragmentation the floors don't see" of the
        # faithful model's 0.786 closure residual: its stage-1 fwd spatial
        # convs measured 94 TF/s = 1.88x a byte floor but 1.18x this lane
        # ceiling of 110.8). Applies to FORWARD convs (cout IS the GEMM's
        # N) and to dw convs (kernel-shaped output; measured 48 TF/s <=
        # the bound) — but NOT to dx convs: the emitter demonstrably
        # retiles those (stage-2 dx measured 146 TF/s with a C=64 output,
        # 1.5x the naive bound), so for activation-shaped bwd outputs full
        # peak is the only honest ceiling.
        out_dims = _dims(c[0])
        cout = out_dims[-1] if out_dims else 128
        kernel_shaped = bool(out_dims) and out_dims[0] != out_dims[-1] \
            and len(out_dims) == 5 and out_dims[0] <= 7 and out_dims[1] <= 7
        if is_bwd and not kernel_shaped:
            return c[2] / peak_flops  # dx
        lane_tiles = -(-cout // 128) * 128
        eff = peak_flops * cout / lane_tiles
        return c[2] / eff

    for name, d in dur.items():
        if name.startswith("jit_"):
            continue
        calls, op = fus.get(name, (None, None))
        convs = comp_convs.get(calls, []) if calls else []
        ev = ev_info.get(name, {})
        if ev.get("long_name") and not convs:
            # renaming between as_text() and the executable: recover the
            # called computation from the event's own signature
            cm = re.search(r"calls=%([\w\.\-]+)", ev["long_name"])
            if cm:
                convs = comp_convs.get(cm.group(1), [])
        if not op and ev.get("tf_op"):
            op = ev["tf_op"]
        fl = sum(c[2] for c in convs) or ev.get("flops", 0.0)
        ln = ev.get("long_name", "")
        inst = _split_instr(ln) if ln else None
        opcode = inst[2] if inst else ""
        if opcode.endswith("-start") or opcode.endswith("-done"):
            # async DMA pair: the -start measures ~0 (fully overlapped
            # with compute), the -done measures wait. Serialized floors
            # don't apply; the moved bytes are background HBM pressure,
            # aggregated once (at -start) and reported separately.
            if opcode.endswith("-start"):
                async_bytes += max(
                    (_type_bytes_padded(m.group(0))
                     for m in _SHAPE_RE.finditer(ln)
                     if not _NON_HBM.search(m.group(0))), default=0.0)
            rows.append((d, 0.0, 0.0, op or name, convs))
            cat["async_dma"] += d
            continue
        if convs:
            is_bwd = "transpose(" in (op or "")
            flop_floor_us = sum(conv_flop_floor(c, is_bwd)
                                for c in convs) * 1e6
        else:
            flop_floor_us = fl / peak_flops * 1e6
        byte_floor_us = 0.0
        if ln:
            byte_floor_us = _long_name_bytes(ln) / mem_bw * 1e6
        elif name in fus_bytes:
            byte_floor_us = fus_bytes[name] / mem_bw * 1e6
        elif convs:
            byte_floor_us = sum(c[3] for c in convs) / mem_bw * 1e6
        roof_us = max(flop_floor_us, byte_floor_us)
        rows.append((d, fl / d / 1e6 if (d > 0 and fl) else 0.0,
                     roof_us, op or name, convs))
        key = "other"
        if op:
            bwd = "transpose(" in op
            if "conv_general_dilated" in op:
                part = ("spatial" if "/spatial/" in op else
                        "temporal" if "/temporal/" in op else
                        "downsample" if "downsample" in op else "stem/other")
                key = ("bwd_" if bwd else "fwd_") + "conv_" + part
            elif "preprocess" in op:
                key = "preprocess"
            else:
                key = ("bwd_" if bwd else "fwd_") + "elementwise/other"
        cat[key] += d
    rows.sort(key=lambda r: -r[0])
    # ALL rows (callers slice for display): the closure sum over every
    # traced fusion needs the full set, not the top-N
    return (rows, dict(sorted(cat.items(), key=lambda kv: -kv[1])),
            async_bytes)


def profile_train_step(model_name: str = "r2plus1d_18", batch_size: int = 32,
                       clip_len: int = 16, crop: int = 112,
                       source_hw=(128, 171), n_steps: int = 4,
                       trace_dir: str = "/tmp/fvt_step_trace",
                       norm: str = "batch"):
    """Trace + attribute the jitted train step. Returns (rows, categories)."""
    import os

    import jax
    import jax.numpy as jnp
    import numpy as np

    from fastvideotagging_tpu.config import (
        ClipSamplerConfig, DataConfig, ExperimentConfig, ModelConfig,
        TrainConfig,
    )
    from fastvideotagging_tpu.models import get_model
    from fastvideotagging_tpu.train import lr as lr_lib
    from fastvideotagging_tpu.train.loop import (
        make_sample_batch, make_train_step,
    )
    from fastvideotagging_tpu.train.state import create_train_state

    cfg = ExperimentConfig(
        model=ModelConfig(name=model_name, num_classes=101, norm=norm),
        data=DataConfig(source_hw=source_hw, resize_hw=source_hw,
                        crop_hw=(crop, crop),
                        sampler=ClipSamplerConfig(clip_len=clip_len)),
        train=TrainConfig(batch_size=batch_size))
    model = get_model(model_name, num_classes=101, norm=norm)
    tx = lr_lib.make_optimizer(cfg.train, steps_per_epoch=100)
    sample = jnp.zeros((1, clip_len, crop, crop, 3), jnp.float32)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), sample)
    step = make_train_step(model, cfg, donate=False)
    batch = jax.tree.map(
        lambda x: jnp.asarray(np.random.default_rng(0).integers(
            0, 255, x.shape).astype(x.dtype)) if x.dtype == jnp.uint8 else x,
        make_sample_batch(cfg))
    rng = jax.random.PRNGKey(1)

    hlo = jax.jit(step).lower(state, batch, rng).compile().as_text()
    fus, comp_convs = parse_hlo(hlo)
    fus_bytes = parse_fusion_bytes(hlo)

    def sync(s):
        leaf = jax.tree.leaves(s.params)[0]
        float(leaf[(0,) * leaf.ndim])

    for _ in range(2):
        s2, _ = step(state, batch, rng)
        sync(s2)
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        s = state
        for _ in range(n_steps):
            s, _ = step(s, batch, rng)
        sync(s)

    dur, steps, dev_us, ev_info = load_trace_durations(trace_dir, n_steps)
    rows, cat, async_bytes = attribute(dur, fus, comp_convs,
                                       fus_bytes=fus_bytes, ev_info=ev_info)
    return rows, cat, {"steps_captured": steps,
                       "device_us_per_step": dev_us,
                       "async_dma_bytes": async_bytes}


def profile_eval_step(model_name: str = "r2plus1d_18", batch_size: int = 32,
                      clip_len: int = 16, crop: int = 112, n_steps: int = 4,
                      trace_dir: str = "/tmp/fvt_eval_trace"):
    """Trace + attribute the jitted eval-mode forward (the serving loop)."""
    import os

    import jax
    import jax.numpy as jnp
    import numpy as np

    from fastvideotagging_tpu.models import get_model

    model = get_model(model_name, num_classes=101)
    x0 = jnp.asarray(np.random.default_rng(0).standard_normal(
        (batch_size, clip_len, crop, crop, 3)), jnp.bfloat16)
    variables = jax.jit(model.init, static_argnames="train")(
        jax.random.PRNGKey(0), x0[:1], train=False)

    # variables is a TRACED argument, not a jit closure — closure capture
    # hoists the parameter tree into the program as constants and crashes
    # the remote compile service for real-sized models (CLAUDE.md trap).
    @jax.jit
    def step(vs, xi):
        y = model.apply(vs, xi, train=False)
        # evolving input: content-identical dispatches are deduped
        return xi + (jnp.tanh(y.sum()) * 1e-2).astype(xi.dtype)

    hlo = step.lower(variables, x0).compile().as_text()
    fus, comp_convs = parse_hlo(hlo)
    fus_bytes = parse_fusion_bytes(hlo)

    def sync(x):
        float(jnp.asarray(x.reshape(-1)[0], jnp.float32))

    c = step(variables, x0)
    sync(c)
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        for _ in range(n_steps):
            c = step(variables, c)
        sync(c)
    dur, steps, dev_us, ev_info = load_trace_durations(trace_dir, n_steps)
    rows, cat, async_bytes = attribute(dur, fus, comp_convs,
                                       fus_bytes=fus_bytes, ev_info=ev_info)
    return rows, cat, {"steps_captured": steps,
                       "device_us_per_step": dev_us,
                       "async_dma_bytes": async_bytes}


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default="r2plus1d_18")
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--clip-len", type=int, default=16)
    p.add_argument("--crop", type=int, default=112)
    p.add_argument("--norm", default="batch")
    p.add_argument("--top", type=int, default=30)
    p.add_argument("--eval", action="store_true",
                   help="profile the eval-mode forward instead of the "
                        "train step")
    args = p.parse_args(argv)
    if args.eval:
        rows, cat, info = profile_eval_step(args.model, args.batch,
                                            args.clip_len, args.crop)
    else:
        rows, cat, info = profile_train_step(args.model, args.batch,
                                             args.clip_len, args.crop,
                                             norm=args.norm)
    total = sum(cat.values())
    print(f"trace: {info['steps_captured']} module execution(s) captured, "
          f"device {info['device_us_per_step'] / 1e3:.1f} ms/step "
          f"(ops sum {total / 1e3:.1f} ms)")
    adma = info.get("async_dma_bytes", 0.0)
    if adma:
        print(f"async DMA (memory-space staging, overlapped): "
              f"{adma / 2**20:.0f} MiB/step = {adma / 819e9 * 1e3:.1f} ms "
              f"of background HBM traffic (not in per-fusion floors)")
    print(f"== categories ({total / 1e3:.1f} ms/step) ==")
    for k, v in cat.items():
        print(f"{v / 1e3:8.2f} ms  {100 * v / total:5.1f}%  {k}")
    # Closure summary: Σ per-fusion honest floors (max(conv FLOP time,
    # operand+output bytes / HBM bw)) over EVERY traced fusion = the
    # fastest any emitter could run this step at XLA's chosen fusion
    # granularity. measured/floor per fusion answers "is the remaining
    # gap emitter slack or inherent byte traffic?" fusion by fusion.
    roof = sum(r[2] for r in rows)
    slack = sorted(rows, key=lambda r: -(r[0] - r[2]))
    print(f"\nhonest per-fusion floor of the traced step: {roof / 1e3:.1f} "
          f"ms (measured {total / 1e3:.1f} ms -> emitter/overhead slack "
          f"{max(total - roof, 0.0) / 1e3:.1f} ms, floor/measured = "
          f"{roof / total:.2f})" if total else "(no device events)")
    print("\n== largest slack (measured - honest fusion floor) ==")
    for d, rate, roof_us, op, convs in slack[:args.top]:
        short = (op.replace("jit(step)/jit(step)/", "")
                 .replace("transpose(jvp(", "BWD(")
                 .replace("jvp(", "FWD("))
        cstr = "; ".join(s.split("{")[0] + " " + w.split(" ")[0]
                         for s, w, *_ in convs)[:60]
        print(f"{d:8.0f} us (floor {roof_us:6.0f})  {rate:5.0f} TF/s  "
              f"{short[:58]:58s} {cstr}")


if __name__ == "__main__":
    main()
