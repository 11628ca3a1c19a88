"""Declarative arch specs (ops/arch_spec): the ONE source of truth for the
serving-walk structure. For every covered zoo family:

* spec walk (bf16 reference engine) == model.apply(train=False) to bf16
  tolerance — proves the spec mirrors the flax module;
* calibrate -> quantize -> int8_infer runs end to end with bounded
  per-site reconstruction error (wiring bugs measure 50%+).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastvideotagging_tpu.models import get_model
from fastvideotagging_tpu.ops.arch_spec import iter_convs, spec_for
from fastvideotagging_tpu.ops.int8_infer import (
    calibrate,
    int8_infer,
    quantize_variables,
    spec_walk,
)

SHAPE = (2, 8, 32, 32, 3)
# c3d's flatten head pins the input geometry to the paper's 16x112x112.
C3D_SHAPE = (1, 16, 112, 112, 3)

CASES = [
    ("r2plus1d_18", SHAPE, {}),
    ("r2plus1d_18_tpu", SHAPE, {}),
    ("p3d_63", SHAPE, {}),
    ("c3d", C3D_SHAPE, {"dropout": 0.0}),
    ("r3d_18", SHAPE, {}),
    ("mc3_18", SHAPE, {}),
    # dual-pathway DAG through the multi-stream IR (clip_len % alpha == 0)
    ("slowfast_r2plus1d", SHAPE, {}),
    # packed-fast variant: Subsample.pack time-to-channel + stride-free
    # 3x1x1 laterals (round 4)
    ("slowfast_r2plus1d_tpu", SHAPE, {}),
    # Inception branches through the Branches node; gap_t2 head; BN eps 1e-3
    ("s3d", SHAPE, {}),
    # S3D-G: the data-dependent per-channel self-gate as an f32 Conv.gate
    # epilogue on every separable conv's temporal factor
    ("s3d_g", SHAPE, {}),
    # full-3D Inception + TF-SAME padding ('same_tf' stem conv, 'SAME_TF'
    # pools) resolved from the traced shape
    ("i3d", SHAPE, {}),
]


def _init(name, shape, kw):
    model = get_model(name, num_classes=11, **kw)
    x = jnp.asarray(np.random.default_rng(3).standard_normal(shape),
                    jnp.float32)
    variables = jax.jit(model.init, static_argnames="train")(
        jax.random.PRNGKey(0), x, train=False)
    if "batch_stats" in variables:
        # non-trivial running stats so BN folding is actually exercised
        def perturb(path, leaf):
            s = jax.tree_util.keystr(path)
            rng = np.random.default_rng(abs(hash(s)) % 2**32)
            if "mean" in s:
                return jnp.asarray(rng.normal(0, 0.05, leaf.shape),
                                   leaf.dtype)
            return jnp.asarray(1.0 + rng.uniform(-0.2, 0.2, leaf.shape),
                               leaf.dtype)

        variables = {
            "params": variables["params"],
            "batch_stats": jax.tree_util.tree_map_with_path(
                perturb, variables["batch_stats"]),
        }
    return model, variables, x


@pytest.mark.parametrize("name,shape,kw", CASES,
                         ids=[c[0] for c in CASES])
def test_spec_walk_matches_model_apply(name, shape, kw):
    model, variables, x = _init(name, shape, kw)
    spec = spec_for(name)
    want = np.asarray(jax.jit(
        lambda v, xx: model.apply(v, xx, train=False))(variables, x))
    got = np.asarray(jax.jit(
        lambda v, xx: spec_walk(spec, v, xx, lambda n, t: t))(variables, x))
    assert got.shape == want.shape
    # bf16 accumulation-order noise scales with the LOGIT SCALE, not each
    # element (P3D's perturbed-BN logits reach ~4e3 with near-zero entries;
    # measured noise ~0.5% of scale) — tolerance is 2% of max|logit|.
    atol = 0.02 * float(np.abs(want).max()) + 0.1
    np.testing.assert_allclose(got, want, rtol=0, atol=atol)


@pytest.mark.parametrize("name,shape,kw", CASES,
                         ids=[c[0] for c in CASES])
def test_int8_engine_site_errors_bounded(name, shape, kw):
    """calibrate -> quantize -> int8 forward; per-site reconstruction error
    vs the bf16 walk stays at the int8 rounding floor (full-int8: no bf16
    tail, the hardest setting)."""
    _, variables, x = _init(name, shape, kw)
    spec = spec_for(name)
    scales = calibrate(variables, [x], spec=spec)
    qpack = quantize_variables(variables, scales, spec=spec)

    def run_ref(v, xx):
        out = {}

        def record(site, t):
            out[site] = t.astype(jnp.float32)
            return t

        logits = spec_walk(spec, v, xx, record)
        return logits, out

    _, ref_sites = jax.jit(run_ref)(variables, x)
    logits, q_sites = int8_infer(qpack, x, spec, float_blocks=(),
                                 debug_sites=True)
    assert np.isfinite(np.asarray(logits)).all()
    errs = {}
    for site, r in ref_sites.items():
        r, q = np.asarray(r), np.asarray(q_sites[site])
        errs[site] = np.abs(q - r).mean() / (np.abs(r).mean() + 1e-9)
    worst = max(errs, key=errs.get)
    assert errs[worst] < 0.15, (worst, errs[worst])
    assert np.median(list(errs.values())) < 0.06, errs


@pytest.mark.parametrize("name,shape,kw", CASES,
                         ids=[c[0] for c in CASES])
def test_calibration_sites_cover_every_conv_input(name, shape, kw):
    _, variables, x = _init(name, shape, kw)
    spec = spec_for(name)
    scales = calibrate(variables, [x], spec=spec)
    want = {c.site for _k, c in iter_convs(spec)}
    assert set(scales) == want
    for v in scales.values():
        assert v.ndim == 1 and (v > 0).all()


def test_spec_for_unknown_name_raises():
    with pytest.raises(KeyError, match="covers"):
        spec_for("tiny3d")


def test_slowfast_stream_structure():
    """The dual-pathway spec carries the flax module's exact topology:
    5 laterals (stem + one per stage), per-stream blocks, and downsample
    convs exactly where stride != 1 or the fused channel count mismatches
    (slow stage-0 entry: 64+2*8=80 in vs 64 out -> down at stride 1)."""
    from fastvideotagging_tpu.ops.arch_spec import (
        Block, Fuse, Stream, Subsample)

    spec = spec_for("slowfast_r2plus1d")
    fuses = [n for n in spec.nodes if isinstance(n, Fuse)]
    assert len(fuses) == 5
    assert all(f.src == "fast" and f.dst == "slow" for f in fuses)
    assert all(f.conv.strides == (4, 1, 1) for f in fuses)
    subs = [n for n in spec.nodes if isinstance(n, Subsample)]
    assert [(s.dst, s.stride) for s in subs] == [("slow", 4), ("fast", 1)]
    blocks = {b.key: b for n in spec.nodes if isinstance(n, Stream)
              for b in n.nodes if isinstance(b, Block)}
    assert len(blocks) == 8  # (1,1,1,1) stages x 2 pathways
    assert blocks["slow_s0_b0"].down is not None    # 80 in != 64 out
    assert blocks["fast_s0_b0"].down is None        # 8 in == 8 out
    assert blocks["slow_s1_b0"].down is not None    # stride 2
    # the fast tensor at a fusion point feeds the lateral AND the next
    # fast block under ONE site name (shared smoothing consumers)
    assert fuses[0].conv.site == blocks["fast_s0_b0"].main[0].site
    assert fuses[-1].conv.site == "fast.out"
    assert spec.head_streams == ("slow", "fast")
    assert set(spec.default_float_blocks) == {"slow_s3_b0", "fast_s3_b0"}


def test_s3d_g_gate_structure():
    """S3D-G = S3D topology + a gate on EVERY separable conv's temporal
    factor (stem, conv3, every b1_sep/b2_sep) and nowhere else; the gate
    path sits next to the conv's params (models/s3d.py SepConv layout)."""
    spec = spec_for("s3d_g")
    base = spec_for("s3d")
    convs = [c for _k, c in iter_convs(spec)]
    base_convs = [c for _k, c in iter_convs(base)]
    assert len(convs) == len(base_convs)
    gated = [c for c in convs if c.gate is not None]
    # 2 stem-level sep convs (stem, conv3) + 9 blocks x 2 (b1_sep, b2_sep)
    assert len(gated) == 2 + 9 * 2
    for c in gated:
        assert c.kernel[-2:] == ("temporal", "kernel")
        assert c.gate == c.kernel[:-2] + ("gate",)
    # spatial factors and 1x1x1 convs never gate
    assert all(c.gate is None for c in convs
               if c.kernel[-2:] != ("temporal", "kernel"))


def test_p3d_block_cycle_structure():
    """The A->B->C cycle shows up as the expected node shapes."""
    from fastvideotagging_tpu.ops.arch_spec import Block, Sum

    spec = spec_for("p3d_63")
    blocks = [n for n in spec.nodes if isinstance(n, Block)]
    assert len(blocks) == 16  # 3+4+6+3
    # block0 = A (serial convs), block1 = B (Sum from input),
    # block2 = C (Sum from left)
    def sums(b):
        return [n for n in b.main if isinstance(n, Sum)]

    assert not sums(blocks[0])
    assert sums(blocks[1])[0].right_from == "input"
    assert sums(blocks[2])[0].right_from == "left"
    # stage entries carry a downsample conv (incl. stage 1: 64 -> 256)
    assert blocks[0].down is not None and blocks[1].down is None


def test_s3d_branch_structure():
    """The Inception spec carries models/s3d.py's exact topology: nine
    Branches nodes, b0/b1/b2 entry convs sharing the block-input site
    (ONE smoothing-consumers entry), b3 quantizing the pooled tensor,
    separable pairs as (1,k,k)+(k,1,1) strides, BN eps 1e-3 throughout."""
    from fastvideotagging_tpu.ops.arch_spec import Branches, Conv, MaxPool

    spec = spec_for("s3d")
    assert spec.head_pool == "gap_t2"
    blocks = [n for n in spec.nodes if isinstance(n, Branches)]
    assert len(blocks) == 9
    for b in blocks:
        assert len(b.branches) == 4
        b0, b1, b2, b3 = b.branches
        name = b0[0].kernel[0]
        # entry convs of b0/b1/b2 share the block-input site
        assert b0[0].site == b1[0].site == b2[0].site == f"{name}.in"
        # b1/b2: reduce + separable (spatial then temporal)
        assert [c.strides for c in b1] == [(1, 1, 1)] * 3
        assert b1[1].kernel[-2:] == ("spatial", "kernel")
        assert b1[2].kernel[-2:] == ("temporal", "kernel")
        # b3: stride-1 maxpool then 1x1x1 conv on its own site
        assert isinstance(b3[0], MaxPool) and b3[0].strides == (1, 1, 1)
        assert b3[1].site == f"{name}.pool"
    # stem separable pair downsamples in BOTH factors (s3d stride=2)
    convs = [c for _k, c in iter_convs(spec)]
    assert convs[0].strides == (1, 2, 2) and convs[1].strides == (2, 1, 1)
    assert all(c.bn_eps == 1e-3 for c in convs)
    # every conv has folded BN (no biased convs in s3d)
    assert all(c.bn is not None and c.bias is None for c in convs)
    # 2 stem + 1 conv2 + 2 conv3 + 9 blocks x (1 + 3 + 3 + 1) convs
    assert len(convs) == 5 + 9 * 8
