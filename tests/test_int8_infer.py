"""int8 PTQ serving engine (ops/int8_infer): walk parity, calibration
site coverage, quantized-logits fidelity, determinism.

The accuracy gate on a TRAINED model runs on the TPU via
benchmarks/int8_serving.py; the recorded JSON is threshold-checked here
when present.
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastvideotagging_tpu.models import get_model
from fastvideotagging_tpu.ops.int8_infer import (
    calibrate,
    quantize_variables,
    r2plus1d_int8_infer,
    reference_bf16_infer,
)

STAGE_BLOCKS = (2, 2, 2, 2)
SHAPE = (2, 8, 32, 32, 3)


@pytest.fixture(scope="module")
def model_and_vars():
    model = get_model("r2plus1d_18", num_classes=12)
    x = jnp.zeros(SHAPE, jnp.float32)
    variables = jax.jit(model.init, static_argnames="train")(
        jax.random.PRNGKey(0), x, train=False)
    # non-trivial running stats so the BN fold is actually exercised
    stats = jax.tree.map(lambda a: a, variables["batch_stats"])

    def perturb(path, leaf):
        name = jax.tree_util.keystr(path)
        rng = np.random.default_rng(abs(hash(name)) % 2**32)
        if "mean" in name:
            return jnp.asarray(rng.normal(0, 0.05, leaf.shape), leaf.dtype)
        return jnp.asarray(1.0 + rng.uniform(-0.2, 0.2, leaf.shape),
                           leaf.dtype)

    stats = jax.tree_util.tree_map_with_path(perturb, stats)
    return model, {"params": variables["params"], "batch_stats": stats}


@pytest.fixture(scope="module")
def clips():
    rng = np.random.default_rng(1)
    return jnp.asarray(rng.standard_normal(SHAPE), jnp.float32)


def test_reference_walk_matches_model_apply(model_and_vars, clips):
    model, variables = model_and_vars
    want = jax.jit(
        lambda v, x: model.apply(v, x, train=False))(variables, clips)
    got = jax.jit(
        lambda v, x: reference_bf16_infer(v, x, STAGE_BLOCKS))(
            variables, clips)
    # bf16 accumulation-order noise on logits of magnitude ~8
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=1.5e-1)


def test_calibration_covers_every_conv_input_site(model_and_vars, clips):
    _, variables = model_and_vars
    scales = calibrate(variables, [clips], STAGE_BLOCKS)
    want = {"input", "stem_mid"}
    for stage, n in enumerate(STAGE_BLOCKS):
        for b in range(n):
            key = f"stage{stage + 1}_block{b}"
            want |= {f"{key}.in", f"{key}.conv1.mid", f"{key}.conv2.in",
                     f"{key}.conv2.mid"}
    assert set(scales) == want
    # per-channel scale vectors, one entry per site channel, all positive
    for v in scales.values():
        assert v.ndim == 1 and (v > 0).all()


def test_int8_site_errors_bounded(model_and_vars, clips):
    """Per-site reconstruction error vs the bf16 walk stays at the int8
    rounding floor (a few %) — wiring bugs measure 50%+ here. (Random-init
    LOGITS are near-degenerate and amplify honest rounding noise, so the
    accuracy evidence lives in the trained-model gate below instead.)"""
    from fastvideotagging_tpu.ops.int8_infer import _walk

    _, variables = model_and_vars
    scales = calibrate(variables, [clips], STAGE_BLOCKS)
    qpack = quantize_variables(variables, scales, STAGE_BLOCKS)

    def run_ref(v, x):
        out = {}

        def record(name, t):
            out[name] = t.astype(jnp.float32)
            return t

        logits = _walk(v, x, STAGE_BLOCKS, record)
        return logits, out

    _, ref_sites = jax.jit(run_ref)(variables, clips)
    logits, q_sites = r2plus1d_int8_infer(
        qpack, clips, STAGE_BLOCKS, float_blocks=(), debug_sites=True)
    assert np.isfinite(np.asarray(logits)).all()
    errs = {}
    for name, r in ref_sites.items():
        r = np.asarray(r)
        q = np.asarray(q_sites[name])
        errs[name] = np.abs(q - r).mean() / (np.abs(r).mean() + 1e-9)
    worst = max(errs, key=errs.get)
    assert errs[worst] < 0.15, (worst, errs[worst])
    assert np.median(list(errs.values())) < 0.06, errs


def test_int8_engine_deterministic(model_and_vars, clips):
    _, variables = model_and_vars
    scales = calibrate(variables, [clips], STAGE_BLOCKS)
    qpack = quantize_variables(variables, scales, STAGE_BLOCKS)
    a = np.asarray(r2plus1d_int8_infer(qpack, clips, STAGE_BLOCKS))
    b = np.asarray(r2plus1d_int8_infer(qpack, clips, STAGE_BLOCKS))
    assert (a == b).all()


def test_make_int8_apply_eval_glue(model_and_vars, clips):
    from fastvideotagging_tpu.evaluation.quantized import make_int8_apply

    _, variables = model_and_vars
    qpack, apply_fn = make_int8_apply("r2plus1d_18", variables, [clips])
    scores = np.asarray(apply_fn(qpack, clips))
    assert scores.shape == (clips.shape[0], 12)
    assert np.isfinite(scores).all()
    # softmax scores: rows sum to 1
    np.testing.assert_allclose(scores.sum(axis=1), 1.0, atol=1e-3)
    # round 3: c3d/p3d (and now slowfast, via the multi-stream IR) ARE
    # covered; truly-unsupported names still raise the coverage error
    with pytest.raises(KeyError, match="covers"):
        make_int8_apply("tiny3d", variables, [clips])


def test_int8_engine_tpu_variant_walk(clips):
    """The engine walk is structure-driven: the MXU-aligned `_tpu` variant
    (128-wide stem, 128-multiple mids) quantizes and runs unchanged."""
    model = get_model("r2plus1d_18_tpu", num_classes=7)
    variables = jax.jit(model.init, static_argnames="train")(
        jax.random.PRNGKey(0), clips, train=False)
    scales = calibrate(variables, [clips], STAGE_BLOCKS)
    qpack = quantize_variables(variables, scales, STAGE_BLOCKS)
    q = np.asarray(r2plus1d_int8_infer(qpack, clips, STAGE_BLOCKS))
    ref = np.asarray(jax.jit(
        lambda v, x: model.apply(v, x, train=False))(variables, clips))
    assert q.shape == ref.shape == (clips.shape[0], 7)
    assert np.isfinite(q).all()


def test_int8_engine_data_parallel_sharding(model_and_vars, clips):
    """Batch-sharded over the 8-device `data` axis, the int8 engine's
    scores equal the unsharded run to bf16 tolerance (the sharded program
    tiles differently, so fp accumulation order inside the bf16 tail is
    not bitwise-stable) — GSPMD correctness for the int8 conv + requant
    graph."""
    import pytest
    from jax.sharding import NamedSharding, PartitionSpec as P

    from fastvideotagging_tpu.parallel import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    _, variables = model_and_vars
    scales = calibrate(variables, [clips], STAGE_BLOCKS)
    qpack = quantize_variables(variables, scales, STAGE_BLOCKS)
    x8 = jnp.concatenate([clips] * 4, axis=0)  # batch 8 over 8 devices
    ref = np.asarray(r2plus1d_int8_infer(qpack, x8, STAGE_BLOCKS))
    mesh = make_mesh(8, 1)
    xs = jax.device_put(
        x8, NamedSharding(mesh, P("data", None, None, None, None)))
    got = np.asarray(r2plus1d_int8_infer(qpack, xs, STAGE_BLOCKS))
    np.testing.assert_allclose(got, ref, rtol=0, atol=1.5e-1)


def test_recorded_accuracy_gate():
    """benchmarks/INT8_SERVING.json (produced on the TPU) must show the
    int8 engine within 2 points of bf16 top-1 on the hard benchmark."""
    path = os.path.join(os.path.dirname(__file__), "..", "benchmarks",
                        "INT8_SERVING.json")
    if not os.path.exists(path):
        pytest.skip("INT8_SERVING.json not recorded yet")
    rec = json.load(open(path))
    assert rec["bf16_top1"] - rec["int8_top1"] <= 0.02 + 1e-9
    assert rec["int8_top1"] >= 0.90


def test_bn_of_groupnorm_checkpoint_fails_with_reason():
    """The name-only coverage gate admits norm='group' checkpoints; the
    engine must fail with the REASON (BN folds into the requant epilogue)
    rather than a KeyError from deep inside jit tracing."""
    import pytest

    from fastvideotagging_tpu.ops.int8_infer import _bn_of

    variables = {
        "params": {"stem": {"s": {"GroupNorm_0": {"scale": 1.0}}}},
        "batch_stats": {},
    }
    with pytest.raises(ValueError, match="norm='batch'"):
        _bn_of(variables, ("stem", "s"))


def test_calibrate_site_margins(model_and_vars, clips):
    """Branch-site-aware static calibration (round 4): margins cover every
    calibrated site, live in [base, cap], and identical batches (spread 1)
    give exactly the base margin; a spiky site gets more headroom."""
    _, variables = model_and_vars
    scales_only = calibrate(variables, [clips, clips], STAGE_BLOCKS)
    scales, margins = calibrate(variables, [clips, clips], STAGE_BLOCKS,
                                return_margins=True)
    assert set(margins) == set(scales) == set(scales_only)
    for k in scales:
        np.testing.assert_array_equal(np.asarray(scales[k]),
                                      np.asarray(scales_only[k]))
        assert margins[k] == 2.0  # identical batches -> spread exactly 1

    # a 3x-hotter batch inflates the input site's spread -> larger margin
    _, m2 = calibrate(variables, [clips, 3.0 * clips], STAGE_BLOCKS,
                      return_margins=True)
    assert m2["input"] > margins["input"]
    assert all(2.0 <= v <= 8.0 for v in m2.values())  # [base, cap] clamp


def test_quantize_variables_site_margin_dict(model_and_vars, clips):
    """A {site: margin} dict scales each site's static requant scalar
    independently; the engine runs unchanged on the resulting qpack."""
    _, variables = model_and_vars
    scales, margins = calibrate(variables, [clips, 0.5 * clips],
                                STAGE_BLOCKS, return_margins=True)
    q_global = quantize_variables(variables, scales, STAGE_BLOCKS,
                                  static_margin=2.0)
    q_site = quantize_variables(variables, scales, STAGE_BLOCKS,
                                static_margin=margins)
    for site, s in q_site["s_static"].items():
        want = float(q_global["s_static"][site]) * margins[site] / 2.0
        np.testing.assert_allclose(float(s), want, rtol=1e-6)
    logits = np.asarray(r2plus1d_int8_infer(q_site, clips, STAGE_BLOCKS))
    assert np.isfinite(logits).all()
