"""Serving daemon CLI (cli/serve.py): one engine, many requests, per-request
fault isolation, JSON-object request overrides."""

import io
import json
import os

from fastvideotagging_tpu.config import (
    ClipSamplerConfig, DataConfig, ExperimentConfig, ModelConfig,
)
from fastvideotagging_tpu.cli.serve import _parse_request, serve
from fastvideotagging_tpu.data.ucf101 import load_video_list
from fastvideotagging_tpu.evaluation.tagger import Tagger
from fastvideotagging_tpu.models import get_model


def _tagger():
    import jax
    import jax.numpy as jnp

    cfg = ExperimentConfig(
        model=ModelConfig(name="tiny3d", num_classes=3, multilabel=True,
                          dropout=0.0),
        data=DataConfig(resize_hw=(40, 56), crop_hw=(32, 32),
                        sampler=ClipSamplerConfig(clip_len=4, stride=2,
                                                  eval_mode="dense")),
    )
    model = get_model("tiny3d", num_classes=3, dropout=0.0)
    variables = jax.jit(model.init, static_argnames="train")(
        jax.random.PRNGKey(0), jnp.zeros((1, 4, 32, 32, 3), jnp.float32),
        train=False)
    return Tagger(cfg, variables, tag_names=["cat", "dog", "bird"],
                  clip_batch=2)


def test_parse_request_forms():
    assert _parse_request("a.mp4\n") == {"video": "a.mp4"}
    assert _parse_request('{"video": "b.mp4", "top_k": 2}') == {
        "video": "b.mp4", "top_k": 2}


def test_serve_streams_results_and_isolates_faults(synthetic_dataset):
    root, list_path = synthetic_dataset
    records = load_video_list(list_path, root=root)
    tagger = _tagger()

    requests = [
        records[0].path + "\n",
        "\n",  # blank lines are skipped
        json.dumps({"video": records[1].path, "top_k": 1,
                    "threshold": 0.0}) + "\n",
        os.path.join(root, "missing.mp4") + "\n",  # must not kill the loop
        records[2].path + "\n",
    ]
    out = io.StringIO()
    stats = serve(tagger, requests, out, threshold=0.0, top_k=2)
    assert stats == {"served": 3, "errors": 1}

    lines = [json.loads(line) for line in out.getvalue().splitlines()]
    assert len(lines) == 4
    assert [len(r["tags"]) for r in lines if "tags" in r] == [2, 1, 2]
    err = next(r for r in lines if "error" in r)
    assert err["video"].endswith("missing.mp4") and err["error"]
    for r in lines:
        if "tags" in r:
            assert all(0.0 <= t["score"] <= 1.0 for t in r["tags"])
