"""Hard motion benchmark: generator properties + recorded-result thresholds.

The full benchmark (real r2plus1d_18, 50 classes, ~10 min on the TPU) runs
via benchmarks/accuracy_hard.py and checks in its result JSON; here we pin
(a) the generator's core property — class identity is INVISIBLE in any
single frame — and (b) that the checked-in result stays above threshold.
Set FVT_RUN_HARD_BENCH=1 to run a reduced live benchmark in-test.
"""

import json
import os

import numpy as np
import pytest

from fastvideotagging_tpu.data.synthetic_motion import (
    MAX_CLASSES,
    class_params,
    make_motion_frames,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RESULT_PATH = os.path.join(REPO, "benchmarks", "ACCURACY_HARD.json")


def test_class_params_enumerate_distinct():
    seen = set()
    for k in range(MAX_CLASSES):
        p = class_params(k)
        seen.add((round(p["angle"], 6), p["speed"], p["pattern"]))
    assert len(seen) == MAX_CLASSES
    with pytest.raises(ValueError):
        class_params(MAX_CLASSES)


def test_single_frame_is_class_blind():
    """Frame 0 must be pixel-identical across classes for the same instance:
    a per-frame classifier scores at chance BY CONSTRUCTION."""
    base = make_motion_frames(0, instance=5, num_frames=2, seed=3)
    for label in (1, 7, 16, 33, 49):
        other = make_motion_frames(label, instance=5, num_frames=2, seed=3)
        np.testing.assert_array_equal(base[0], other[0])


def test_motion_differs_between_classes():
    a = make_motion_frames(0, instance=5, num_frames=12, seed=3)
    b = make_motion_frames(16, instance=5, num_frames=12, seed=3)  # 2.2x speed
    assert not np.array_equal(a[6], b[6])


def test_deterministic_and_instance_varied():
    a = make_motion_frames(9, instance=2, num_frames=6, seed=1)
    b = make_motion_frames(9, instance=2, num_frames=6, seed=1)
    np.testing.assert_array_equal(a, b)
    c = make_motion_frames(9, instance=3, num_frames=6, seed=1)
    assert not np.array_equal(a[0], c[0])  # fresh background/start per video


def test_recorded_benchmark_meets_threshold():
    """The checked-in 50-class result: the real r2plus1d_18 must beat chance
    by a wide margin on pure-motion classes (chance = 0.02)."""
    assert os.path.exists(RESULT_PATH), (
        "benchmarks/ACCURACY_HARD.json missing — run "
        "python benchmarks/accuracy_hard.py --out benchmarks/ACCURACY_HARD.json")
    with open(RESULT_PATH) as f:
        r = json.load(f)
    assert r["num_classes"] >= 50
    assert r["model"] == "r2plus1d_18"
    # Measured 0.97 top-1 / 0.991 mAP (60 epochs, seed 0, v5e); thresholds
    # leave rerun margin but still demand near-solved motion classification.
    assert r["top1"] >= 0.85, r
    assert r["mAP"] >= 0.9, r


def test_multi_object_frames_are_label_blind_and_distinct():
    from fastvideotagging_tpu.data.synthetic_motion import (
        make_multi_motion_frames,
    )

    a = make_multi_motion_frames([0, 5], instance=4, num_frames=4, seed=2)
    b = make_multi_motion_frames([17, 40], instance=4, num_frames=4, seed=2)
    # same instance -> same background/starts/brightness -> same frame 0
    np.testing.assert_array_equal(a[0], b[0])
    assert not np.array_equal(a[3], b[3])  # motion separates them
    # deterministic
    np.testing.assert_array_equal(
        a, make_multi_motion_frames([0, 5], instance=4, num_frames=4, seed=2))


def test_tagging_dataset_lists_roundtrip(tmp_path):
    from fastvideotagging_tpu.data.synthetic_motion import (
        make_tagging_dataset, tag_index,
    )
    from fastvideotagging_tpu.data.ucf101 import load_tag_list

    tl, el = make_tagging_dataset(str(tmp_path), num_classes=6,
                                  train_videos=8, eval_videos=4,
                                  num_frames=8)
    tidx = tag_index(6)
    train, _ = load_tag_list(tl, str(tmp_path), tidx)
    evalr, _ = load_tag_list(el, str(tmp_path), tidx)
    assert len(train) == 8 and len(evalr) == 4
    for r in train + evalr:
        assert len(r.tags) == 2 and all(0 <= t < 6 for t in r.tags)
        assert os.path.exists(r.path)


def test_recorded_tagging_benchmark_meets_threshold():
    path = os.path.join(REPO, "benchmarks", "ACCURACY_TAGGING.json")
    assert os.path.exists(path), (
        "benchmarks/ACCURACY_TAGGING.json missing — run "
        "python benchmarks/accuracy_hard.py --multilabel "
        "--out benchmarks/ACCURACY_TAGGING.json")
    with open(path) as f:
        r = json.load(f)
    assert r["num_tags"] >= 24 and r["objects_per_video"] >= 2
    # Measured 0.96 mAP / 0.91 macro-F1 / 0.885 top-2 exact (1500 videos,
    # 90 epochs, v5e); chance mAP is ~0.083. Thresholds leave rerun margin.
    assert r["mAP"] >= 0.85, r
    assert r["macro_f1"] >= 0.75, r
    assert r["top2_exact_set"] >= 0.7, r


@pytest.mark.skipif(not os.environ.get("FVT_RUN_HARD_BENCH"),
                    reason="live hard benchmark is opt-in (slow)")
def test_live_reduced_benchmark():
    import sys

    sys.path.insert(0, os.path.join(REPO, "benchmarks"))
    import accuracy_hard

    r = accuracy_hard.run(num_classes=8, epochs=40, batch_size=32)
    assert r["top1"] >= 0.5, r


def test_recorded_s3d_benchmark_meets_threshold():
    """The checked-in S3D result (round 3f): the separable-Inception family
    trains to r2plus1d-class accuracy on pure-motion classes — with grad
    clipping (clip_grad_norm=1.0; the no-residual backbone diverges
    without it, tests/test_train.py::TestGradClip)."""
    path = os.path.join(REPO, "benchmarks", "ACCURACY_HARD_S3D.json")
    assert os.path.exists(path), (
        "benchmarks/ACCURACY_HARD_S3D.json missing — run "
        "python benchmarks/accuracy_hard.py --model s3d --epochs 120 "
        "--clip-grad-norm 1.0 --out benchmarks/ACCURACY_HARD_S3D.json")
    with open(path) as f:
        r = json.load(f)
    assert r["model"] == "s3d"
    assert r["num_classes"] >= 50
    assert r["clip_grad_norm"] > 0
    # Measured 0.96 top-1 / 0.991 mAP (120 epochs, seed 0, v5e); 60 epochs
    # reached 0.815 — the Inception stack converges slower from scratch
    # than the residual family. Thresholds leave rerun margin.
    assert r["top1"] >= 0.85, r
    assert r["mAP"] >= 0.9, r


def test_recorded_s3d_int8_benchmark_meets_threshold():
    """The checked-in S3D int8 PTQ result (round 3f): dynamic scales hold
    full bf16 parity on the Inception walk; GLOBAL statics lose ~3pp
    (branch-site calibration drift). Round 4 superseded the dynamic
    default with branch-site-aware static margins — see
    test_recorded_int8_inception_schemes."""
    path = os.path.join(REPO, "benchmarks", "INT8_S3D.json")
    assert os.path.exists(path), (
        "benchmarks/INT8_S3D.json missing — run "
        "python benchmarks/int8_s3d.py --out benchmarks/INT8_S3D.json")
    with open(path) as f:
        r = json.load(f)
    assert r["model"] == "s3d"
    # Measured: bf16 0.96, static int8 0.93, dynamic int8 0.96 (v5e,
    # 120 epochs, seed 0). Thresholds leave rerun margin.
    assert r["bf16_top1"] >= 0.85, r
    assert r["int8_dynamic_top1"] >= r["bf16_top1"] - 0.02, r
    assert r["int8_top1"] >= 0.80, r


def test_recorded_int8_inception_schemes():
    """Round-4 measured int8 policy for the Inception families
    (benchmarks/INT8_INCEPTION.json): the spec defaults must match what
    the measurement says — s3d serves branch-site-aware STATIC margins
    (top-1 within the 2pp gate at +30% throughput over the dynamic amax
    pass); i3d serves DYNAMIC (exact parity AND fastest — the dense
    full-3D net is compute-bound, the amax bytes hide under MXU time)."""
    path = os.path.join(REPO, "benchmarks", "INT8_INCEPTION.json")
    assert os.path.exists(path), (
        "benchmarks/INT8_INCEPTION.json missing — run "
        "python benchmarks/int8_inception.py "
        "--out benchmarks/INT8_INCEPTION.json")
    with open(path) as f:
        rows = {r["model"]: r for r in json.load(f)["results"]}

    from fastvideotagging_tpu.ops.arch_spec import spec_for

    s3d = rows["s3d"]
    assert s3d["int8_static_site_top1"] >= s3d["bf16_top1"] - 0.02, s3d
    assert (s3d["throughput"]["int8_static_clips_per_sec"]
            > s3d["throughput"]["int8_dynamic_clips_per_sec"]), s3d
    assert spec_for("s3d").default_site_margins
    assert not spec_for("s3d").default_dynamic
    assert spec_for("s3d_g").default_site_margins

    i3d = rows["i3d"]
    assert i3d["int8_dynamic_top1"] >= i3d["bf16_top1"] - 0.02, i3d
    # round-5 correction: static-vs-dynamic THROUGHPUT on the
    # compute-bound i3d is a coin flip inside run variance (r4: dynamic
    # +6%; r5: static +3%) — the strict 'dynamic fastest' pin was
    # over-fitted to one run. The honest invariant: dynamic costs at
    # most ~10% vs static while being the only scheme at bf16 parity
    # (the round-5 margin sweep shows NO static margin reaches parity —
    # monotone 0.61@1.0 -> 0.945@2.5 < 0.965 bf16), so accuracy decides.
    assert (i3d["throughput"]["int8_dynamic_clips_per_sec"]
            > 0.9 * i3d["throughput"]["int8_static_clips_per_sec"]), i3d
    if "margin_sweep" in i3d:
        sw = i3d["margin_sweep"]
        assert sw["global_1.0"] < sw["global_1.5"] < sw["global_2.5"], sw
        assert sw["global_2.5"] < i3d["int8_dynamic_top1"], sw
    assert spec_for("i3d").default_dynamic
    assert not spec_for("i3d").default_site_margins

    assert not spec_for("r2plus1d_18").default_dynamic


def test_recorded_slowfast_benchmarks_meet_thresholds():
    """Round-4 SlowFast evidence: the faithful dual-pathway net trains to
    r2plus1d-class accuracy (0.985 measured), and the packed `_tpu`
    variant holds parity (0.98) while measuring FASTER in
    SLOWFAST_STEP.json (+23% train / +25% serving — the time-to-channel
    pack is the lane fix, PERF.md ROUND-4d)."""
    for fname, model, floor in (
            ("ACCURACY_HARD_SLOWFAST.json", "slowfast_r2plus1d", 0.9),
            ("ACCURACY_HARD_SLOWFAST_TPU.json", "slowfast_r2plus1d_tpu",
             0.9)):
        path = os.path.join(REPO, "benchmarks", fname)
        assert os.path.exists(path), (
            f"benchmarks/{fname} missing — run "
            f"python benchmarks/accuracy_hard.py --model {model} "
            f"--epochs 80 --out benchmarks/{fname}")
        with open(path) as f:
            r = json.load(f)
        assert r["model"] == model
        assert r["num_classes"] >= 50
        assert r["top1"] >= floor, r

    path = os.path.join(REPO, "benchmarks", "SLOWFAST_STEP.json")
    assert os.path.exists(path), (
        "benchmarks/SLOWFAST_STEP.json missing — run "
        "python benchmarks/slowfast_step.py --out "
        "benchmarks/SLOWFAST_STEP.json")
    with open(path) as f:
        rows = json.load(f)["rows"]
    fast, faithful = (rows["slowfast_r2plus1d_tpu"],
                      rows["slowfast_r2plus1d"])
    assert (fast["train_clips_per_sec"]
            > faithful["train_clips_per_sec"]), rows
    assert (fast["infer_clips_per_sec"]
            > faithful["infer_clips_per_sec"]), rows


def test_recorded_i3d_benchmark_meets_threshold():
    """Round-4 I3D trained-accuracy evidence (VERDICT r3 item 3): the
    inflated full-3D Inception trains to 0.97 top-1 / 0.997 mAP on the
    hard benchmark — with grad clipping, like every no-residual-bypass
    Inception stack here."""
    path = os.path.join(REPO, "benchmarks", "ACCURACY_HARD_I3D.json")
    assert os.path.exists(path), (
        "benchmarks/ACCURACY_HARD_I3D.json missing — run "
        "python benchmarks/accuracy_hard.py --model i3d --epochs 120 "
        "--clip-grad-norm 1.0 --out benchmarks/ACCURACY_HARD_I3D.json")
    with open(path) as f:
        r = json.load(f)
    assert r["model"] == "i3d"
    assert r["num_classes"] >= 50
    assert r["clip_grad_norm"] > 0
    assert r["top1"] >= 0.85, r
    assert r["mAP"] >= 0.9, r


def test_recorded_kinetics_geometry_benchmark():
    """Round-4 Kinetics-geometry evidence (VERDICT r3 item 8): a model
    TRAINED at the 32x224x224 BASELINE-config-3 geometry, evaluated
    through the eval_mode='uniform' multi-clip aggregation at that
    geometry — accuracy (not just the BENCH perf rows) at the shipped
    clip shape. Measured: s3d 0.906 top-1 single-clip, 0.9375 with the
    4-clip uniform aggregation (vs 0.125 chance; 8 classes, 60 epochs,
    12 train videos/class) — the multi-clip path measurably adds
    accuracy at this geometry."""
    path = os.path.join(REPO, "benchmarks", "ACCURACY_KINETICS_GEOM.json")
    assert os.path.exists(path), (
        "benchmarks/ACCURACY_KINETICS_GEOM.json missing — run "
        "python benchmarks/accuracy_kinetics_geom.py "
        "--out benchmarks/ACCURACY_KINETICS_GEOM.json")
    with open(path) as f:
        r = json.load(f)
    assert r["geometry"].startswith("32x224x224")
    assert r["top1_single_clip"] >= 4 * r["chance_top1"], r
    assert r["top1_multi_clip_4"] >= 4 * r["chance_top1"], r


def test_recorded_c3d_benchmark_meets_threshold():
    """Round-5 (VERDICT r4 item 4): the reference's ORIGINAL backbone has a
    trained-accuracy artifact at the same hard-benchmark standard as the
    newer families. Measured 0.985 top-1 / 0.995 mAP (120 epochs, lr 0.03,
    seed 0, v5e). Recipe notes carried in the artifact: C3D has no norm
    layers at all, so it needs grad clipping (like s3d) and the full
    T=16/stride-1 clip (its five temporal pools leave pool5 empty at T=8);
    dropout 0.5 UNDERFIT this 800-video set (0.285 at 60 epochs) — the
    recorded run uses dropout 0."""
    path = os.path.join(REPO, "benchmarks", "ACCURACY_HARD_C3D.json")
    assert os.path.exists(path), (
        "benchmarks/ACCURACY_HARD_C3D.json missing — run "
        "python benchmarks/accuracy_hard.py --model c3d --clip-len 16 "
        "--stride 1 --dropout 0.0 --clip-grad-norm 1.0 --lr 0.03 "
        "--epochs 120 --out benchmarks/ACCURACY_HARD_C3D.json")
    with open(path) as f:
        r = json.load(f)
    assert r["model"] == "c3d"
    assert r["num_classes"] >= 50
    assert r["clip_grad_norm"] > 0  # no-norm backbone: same necessity as s3d
    assert r["clip_geometry"].startswith("16x")  # T=16: pool5 needs it
    assert r["top1"] >= 0.85, r
    assert r["mAP"] >= 0.9, r


def test_recorded_p3d_benchmark_meets_threshold():
    """Round-5 (VERDICT r4 item 4): P3D-63, the reference's third core
    backbone, at the hard-benchmark standard. Measured 0.98 top-1 / 0.993
    mAP (120 epochs, T=16 stride 1, seed 0, v5e). 60 epochs at T=8
    measured 0.52 — the stem's temporal pool (T -> T/2 before any stage)
    halves the motion evidence, so P3D wants the full-rate clip and the
    long schedule, not a recipe change."""
    path = os.path.join(REPO, "benchmarks", "ACCURACY_HARD_P3D.json")
    assert os.path.exists(path), (
        "benchmarks/ACCURACY_HARD_P3D.json missing — run "
        "python benchmarks/accuracy_hard.py --model p3d_63 --clip-len 16 "
        "--stride 1 --epochs 120 --out benchmarks/ACCURACY_HARD_P3D.json")
    with open(path) as f:
        r = json.load(f)
    assert r["model"] == "p3d_63"
    assert r["num_classes"] >= 50
    assert r["top1"] >= 0.85, r
    assert r["mAP"] >= 0.9, r


def test_recorded_r3d_mc3_benchmarks_meet_thresholds():
    """Round-5 stretch (VERDICT r4 item 4): the Tran'18 ablation siblings
    — the last untrained real zoo names — at the hard-benchmark standard.
    Measured (60 epochs, default recipe, seed 0, v5e): r3d_18 0.98 top-1 /
    0.9945 mAP, mc3_18 0.995 / 0.999. With these, EVERY registered family
    (C3D, R(2+1)D+_tpu, P3D, r3d/mc3, S3D/S3D-G, I3D, SlowFast x2,
    scaleonly) has a from-scratch trained-accuracy artifact; tiny3d (test
    fixture) is the only exception by design."""
    for fname, model in (("ACCURACY_HARD_R3D.json", "r3d_18"),
                         ("ACCURACY_HARD_MC3.json", "mc3_18")):
        path = os.path.join(REPO, "benchmarks", fname)
        assert os.path.exists(path), (
            f"benchmarks/{fname} missing — run "
            f"python benchmarks/accuracy_hard.py --model {model} "
            f"--epochs 60 --out benchmarks/{fname}")
        with open(path) as f:
            r = json.load(f)
        assert r["model"] == model
        assert r["num_classes"] >= 50
        assert r["top1"] >= 0.85, r
        assert r["mAP"] >= 0.9, r
