"""UCF101 parity-readiness harness (VERDICT r3 next-round #7).

The reference's de-facto validation is UCF101 top-1 on the official split
(SURVEY.md §5; BASELINE.json:2 "UCF101 top-1 parity"). No real dataset or
network exists in this environment, so this test proves the PROTOCOL end to
end on a synthetic stand-in tree with the real UCF101 directory layout:

* ``<root>/<ClassName>/v_<ClassName>_gXX_cXX.avi`` videos,
* ``ucfTrainTestlist/classInd.txt`` (``1 ApplyEyeMakeup`` — 1-based),
* ``trainlist01.txt`` (``Class/video.avi <1-based id>``),
* ``testlist01.txt`` (paths ONLY — ids resolve via classInd + directory),

driven through the actual CLI entrypoints with ``--preset ucf101_parity``
(geometry shrunk via flag overrides for CPU speed; the protocol itself —
official-list parsing, uniform multi-clip eval, video-level top-1 — is
exactly what a real run would execute). The preset's untouched fields are
asserted to carry the reference geometry, so the one-command recipe in
MIGRATION.md cannot silently drift.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pytest

from fastvideotagging_tpu.cli import evaluate as cli_evaluate
from fastvideotagging_tpu.cli import train as cli_train
from fastvideotagging_tpu.config import PRESETS

CLASSES = ("ApplyEyeMakeup", "Basketball", "CliffDiving")


def test_parity_preset_carries_reference_protocol():
    """The preset IS the protocol: canonical UCF101 eval geometry."""
    cfg = PRESETS["ucf101_parity"]
    assert cfg.model.name == "r2plus1d_18"
    assert cfg.model.num_classes == 101
    assert cfg.data.resize_hw == (128, 171)   # Tran'15 canonical resize
    assert cfg.data.crop_hw == (112, 112)
    assert cfg.data.sampler.clip_len == 16
    assert cfg.data.sampler.eval_mode == "uniform"
    assert cfg.data.sampler.num_eval_clips == 10
    assert not cfg.model.multilabel           # video-level top-1, softmax


@pytest.fixture(scope="module")
def ucf_tree(tmp_path_factory):
    """Synthetic stand-in with the REAL UCF101 on-disk layout."""
    from fastvideotagging_tpu.data.synthetic import make_frames, write_video

    root = tmp_path_factory.mktemp("UCF-101")
    lists = tmp_path_factory.mktemp("ucfTrainTestlist")
    train_rows, test_rows = [], []
    for ci, cname in enumerate(CLASSES):
        os.makedirs(root / cname, exist_ok=True)
        for g in range(2):
            rel = f"{cname}/v_{cname}_g{g + 1:02d}_c01.avi"
            frames = make_frames(ci, 24, 48, 64, seed=ci * 10 + g)
            write_video(str(root / rel), frames)
            # official format: trainlist carries 1-based ids, testlist
            # carries the bare path (label via classInd + directory)
            (train_rows if g == 0 else test_rows).append(
                (rel, ci + 1))
    with open(lists / "classInd.txt", "w") as f:
        for ci, cname in enumerate(CLASSES):
            f.write(f"{ci + 1} {cname}\n")
    with open(lists / "trainlist01.txt", "w") as f:
        for rel, cid in train_rows:
            f.write(f"{rel} {cid}\n")
    with open(lists / "testlist01.txt", "w") as f:
        for rel, _ in test_rows:
            f.write(f"{rel}\n")
    return str(root), str(lists)


# CPU-speed overrides: model/geometry shrink; the PROTOCOL flags
# (uniform eval, official lists) come from the preset itself.
SPEED = [
    "--model", "tiny3d", "--num-classes", str(len(CLASSES)),
    "--resize", "40", "56", "--crop", "32", "32",
    "--clip-len", "4", "--num-eval-clips", "3", "--num-workers", "2",
]


def test_parity_one_command_workflow(ucf_tree, tmp_path, capsys):
    root, lists = ucf_tree
    ckpt = str(tmp_path / "ckpt")

    cli_train.main(["--preset", "ucf101_parity", *SPEED,
                    "--data-root", root,
                    "--train-list", os.path.join(lists, "trainlist01.txt"),
                    "--class-index", os.path.join(lists, "classInd.txt"),
                    "--batch-size", "3", "--epochs", "2", "--lr", "0.03",
                    "--checkpoint-dir", ckpt, "--data-parallel", "1"])
    assert any(os.scandir(ckpt))

    capsys.readouterr()
    cli_evaluate.main(["--preset", "ucf101_parity", *SPEED,
                       "--data-root", root,
                       "--val-list", os.path.join(lists, "testlist01.txt"),
                       "--class-index", os.path.join(lists, "classInd.txt"),
                       "--checkpoint-dir", ckpt, "--clip-batch", "3"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # one row per test-list video; top-1 is a video-level rate
    assert out["num_videos"] == len(CLASSES)
    assert 0.0 <= out["top1"] <= 1.0


def test_official_testlist_labels_resolve_via_class_index(ucf_tree):
    """testlist01.txt has NO ids — labels must come from classInd.txt via
    the path's directory prefix (the official-format subtlety that a naive
    parser gets wrong)."""
    from fastvideotagging_tpu.data import ucf101

    root, lists = ucf_tree
    cidx = ucf101.load_class_index(os.path.join(lists, "classInd.txt"))
    assert cidx == {c: i for i, c in enumerate(CLASSES)}  # 1-based -> 0-based
    recs = ucf101.load_video_list(
        os.path.join(lists, "testlist01.txt"), root, cidx)
    assert [r.label for r in recs] == list(range(len(CLASSES)))
    assert all(os.path.isfile(r.path) for r in recs)
    # trainlist carries 1-based ids; same loader, ids shifted to 0-based
    recs_tr = ucf101.load_video_list(
        os.path.join(lists, "trainlist01.txt"), root, cidx)
    assert [r.label for r in recs_tr] == list(range(len(CLASSES)))


def test_uniform_ten_clip_sampling_is_the_reference_protocol():
    """The preset's eval clip starts are evenly spaced over the video —
    pinned against the frozen golden sampler spec (data/sampler.py)."""
    from fastvideotagging_tpu.data.sampler import sample_eval_indices

    cfg = PRESETS["ucf101_parity"].data.sampler
    clips = sample_eval_indices(300, cfg.clip_len, cfg.stride,
                                mode="uniform", num_clips=cfg.num_eval_clips)
    assert len(clips) == 10
    starts = [int(c[0]) for c in clips]
    # evenly spaced, first at the start, last ending at the video tail
    gaps = np.diff(starts)
    assert starts[0] == 0 and abs(gaps.max() - gaps.min()) <= 1
    assert starts[-1] + cfg.clip_len * cfg.stride <= 300
    for c in clips:
        assert list(np.diff(c)) == [cfg.stride] * (cfg.clip_len - 1)
