"""End-to-end CLI coverage: prepare -> train -> evaluate -> tag through the
actual argparse entrypoints (the reference user's full workflow, C18/L6)."""

import json
import os

import pytest

from fastvideotagging_tpu.cli import evaluate as cli_evaluate
from fastvideotagging_tpu.cli import prepare as cli_prepare
from fastvideotagging_tpu.cli import tag as cli_tag
from fastvideotagging_tpu.cli import train as cli_train


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    from fastvideotagging_tpu.data import synthetic

    ws = tmp_path_factory.mktemp("cli_e2e")
    root = ws / "data"
    synthetic.make_dataset(str(root), num_classes=3, videos_per_class=2,
                           num_frames=24, height=48, width=64)
    os.remove(root / "list.txt")  # the prepare CLI builds the lists
    return ws, str(root)


COMMON = [
    "--model", "tiny3d", "--num-classes", "3",
    "--resize", "40", "56", "--crop", "32", "32",
    "--clip-len", "4", "--stride", "2", "--num-workers", "2",
]


def test_full_cli_workflow(workspace, capsys):
    ws, root = workspace

    # 1) prepare: directory tree -> UCF101-format lists
    cli_prepare.main([root, "--val-fraction", "0.5"])
    assert os.path.exists(os.path.join(root, "trainlist01.txt"))

    # 2) train (2 epochs, single device, with per-epoch eval on the val list)
    ckpt = str(ws / "ckpt")
    cli_train.main(COMMON + [
        "--data-root", root,
        "--train-list", os.path.join(root, "trainlist01.txt"),
        "--val-list", os.path.join(root, "testlist01.txt"),
        "--class-index", os.path.join(root, "classInd.txt"),
        "--batch-size", "3", "--epochs", "2", "--lr", "0.03",
        "--checkpoint-dir", ckpt, "--data-parallel", "1",
        "--metrics-jsonl", str(ws / "metrics.jsonl"),
    ])
    assert any(os.scandir(ckpt))

    # 3) evaluate from the checkpoint
    capsys.readouterr()
    cli_evaluate.main(COMMON + [
        "--data-root", root,
        "--val-list", os.path.join(root, "testlist01.txt"),
        "--class-index", os.path.join(root, "classInd.txt"),
        "--checkpoint-dir", ckpt, "--clip-batch", "2",
    ])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["num_videos"] == 3
    assert 0.0 <= out["top1"] <= 1.0

    # 4) export weights and tag a video through the CLI
    import jax
    import jax.numpy as jnp

    from fastvideotagging_tpu.config import TrainConfig
    from fastvideotagging_tpu.models import get_model
    from fastvideotagging_tpu.train import lr as lr_lib
    from fastvideotagging_tpu.train.checkpoint import (
        CheckpointManager, export_weights)
    from fastvideotagging_tpu.train.state import create_train_state

    model = get_model("tiny3d", num_classes=3)
    tx = lr_lib.make_optimizer(TrainConfig(), 1)
    state = create_train_state(model, tx, jax.random.PRNGKey(0),
                               jnp.zeros((1, 4, 32, 32, 3), jnp.float32))
    mgr = CheckpointManager(ckpt)
    state, _ = mgr.restore(state)
    mgr.close()
    weights = str(ws / "weights")
    export_weights(weights, jax.device_get(state.params),
                   jax.device_get(state.batch_stats))

    video = os.path.join(root, "class_0", "v_0_0.mp4")
    capsys.readouterr()
    cli_tag.main(COMMON + [
        video, "--weights", weights, "--multilabel",
        "--eval-mode", "dense", "--threshold", "0.0", "--top-k", "2",
        "--clip-batch", "2",
    ])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["video"] == video
    assert len(out["tags"]) == 2
    assert all(0.0 <= t["score"] <= 1.0 for t in out["tags"])
