"""utils/step_profiler parsing units: HLO instruction splitting, tile-padded
byte accounting, fusion byte-floor coverage on a real compiled step.

The on-chip tracing path itself needs the TPU (profiler artifacts live in
PERF.md); what is hermetic — and what round 4's closure-table arithmetic
rests on — is the HLO text analysis: every ENTRY fusion must get a nonzero
physical-byte floor, and tile padding must follow the layout annotation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from fastvideotagging_tpu.utils.step_profiler import (
    _split_instr,
    _type_bytes,
    _type_bytes_padded,
    parse_fusion_bytes,
    parse_hlo,
)


def test_split_instr_plain_and_tuple():
    name, otype, opcode, args = _split_instr(
        "  %fusion.3 = bf16[32,16,56,56,64]{4,3,2,1,0:T(8,128)(2,1)} "
        "fusion(%a, %b.2), kind=kLoop, calls=%fused_computation.3")
    assert name == "fusion.3" and opcode == "fusion"
    assert otype.startswith("bf16[32,16,56,56,64]")
    assert "a" in args and "b.2" in args

    # tuple output with per-element layouts (the multiply_add case that
    # defeated the round-3 regex and zeroed those fusions' floors)
    name, otype, opcode, args = _split_instr(
        "  ROOT %multiply_add_fusion.51 = (f32[128]{0:T(128)}, "
        "f32[32,16,56,56,128]{4,3,2,1,0:T(8,128)(2,1)}) "
        "fusion(%p0, %p1), kind=kInput, calls=%fused.9")
    assert name == "multiply_add_fusion.51" and opcode == "fusion"
    assert otype.count("f32[") == 2

    assert _split_instr("ENTRY %main {") is None


def test_type_bytes_padded_tiles_minor_dims():
    # logical: 32*16*56*56*64 * 2B; physical pads C 64->128 (minor) under
    # the (8,128) tile -> exactly 2x
    s = "bf16[32,16,56,56,64]{4,3,2,1,0:T(8,128)(2,1)}"
    logical = 32 * 16 * 56 * 56 * 64 * 2
    assert _type_bytes(s) == logical
    assert _type_bytes_padded(s) == 2 * logical

    # second-minor padding: 5 -> 8 under sublane 8; minor 128 already exact
    s2 = "f32[5,128]{1,0:T(8,128)}"
    assert _type_bytes_padded(s2) == 8 * 128 * 4

    # transposed layout: {0,1} makes dim 0 the MINOR dim -> it pads to 128
    s3 = "f32[64,256]{0,1:T(8,128)}"
    assert _type_bytes_padded(s3) == 128 * 256 * 4

    # no tile annotation (CPU HLO) -> logical bytes
    s4 = "f32[33,65]{1,0}"
    assert _type_bytes_padded(s4) == _type_bytes(s4) == 33 * 65 * 4

    # tuples sum elements
    s5 = ("(f32[128]{0:T(128)}, bf16[2,64]{1,0:T(8,128)(2,1)})")
    assert _type_bytes_padded(s5) == 128 * 4 + 2 * 8 * 128


def _tiny_step_hlo():
    """Compile a small real train step (CPU backend) and return its
    optimized HLO text."""
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
        model=ModelConfig(name="tiny3d", num_classes=5),
        data=DataConfig(source_hw=(16, 16), resize_hw=(16, 16),
                        crop_hw=(16, 16),
                        sampler=ClipSamplerConfig(clip_len=4)),
        train=TrainConfig(batch_size=2))
    model = get_model("tiny3d", num_classes=5)
    tx = lr_lib.make_optimizer(cfg.train, steps_per_epoch=10)
    sample = jnp.zeros((1, 4, 16, 16, 3), jnp.float32)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), sample)
    step = make_train_step(model, cfg, donate=False)
    batch = jax.tree.map(
        lambda x: jnp.asarray(np.zeros(x.shape, x.dtype)),
        make_sample_batch(cfg))
    rng = jax.random.PRNGKey(1)
    return jax.jit(step).lower(state, batch, rng).compile().as_text()


def test_fusion_bytes_cover_every_entry_fusion():
    """Every fusion/custom-call in the compiled step's ENTRY must get a
    NONZERO byte floor — a zero floor silently turns real HBM traffic
    into 'emitter slack' in the closure table (the round-4 bug that
    misattributed the _tpu step's multiply_add fusions)."""
    import re

    hlo = _tiny_step_hlo()
    fb = parse_fusion_bytes(hlo)
    m = re.search(r"^ENTRY [^\n]*\{$", hlo, re.M)
    body = hlo[m.end():]
    body = body[:re.search(r"^\}", body, re.M).start()]
    want = re.findall(
        r"^\s*(?:ROOT )?%?([\w\.\-]+) = .*?[\s(](?:fusion|custom-call)\(",
        body, re.M)
    assert want, "compiled step has no fusions?"
    missing = [w for w in want if w not in fb]
    assert not missing, missing
    zero = [w for w in want if fb[w] <= 0]
    assert not zero, zero


def test_parse_hlo_finds_convs():
    hlo = _tiny_step_hlo()
    _fus, comp_convs = parse_hlo(hlo)
    convs = [c for cs in comp_convs.values() for c in cs]
    assert convs  # tiny3d: 2 convs fwd + their grads
    for _out, _win, fl, nbytes in convs:
        assert fl > 0 and nbytes > 0
