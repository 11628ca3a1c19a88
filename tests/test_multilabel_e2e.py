"""[B:10] config end-to-end: 1k-tag sigmoid head over dense sampling."""

import jax
import jax.numpy as jnp
import numpy as np

from fastvideotagging_tpu.config import (
    ClipSamplerConfig,
    DataConfig,
    ExperimentConfig,
    ModelConfig,
    TrainConfig,
)
from fastvideotagging_tpu.data.ucf101 import load_tag_list
from fastvideotagging_tpu.evaluation.tagger import Tagger
from fastvideotagging_tpu.models.zoo import load_pretrained
from fastvideotagging_tpu.train.checkpoint import export_weights
from fastvideotagging_tpu.train.loop import make_train_step
from tests.test_train import make_state, synth_batch


def test_1k_tag_train_step_and_dense_tagging(synthetic_dataset, tmp_path):
    cfg = ExperimentConfig(
        model=ModelConfig(name="tiny3d", num_classes=1000, multilabel=True,
                          compute_dtype="float32"),
        data=DataConfig(source_hw=(48, 64), resize_hw=(40, 56), crop_hw=(32, 32),
                        sampler=ClipSamplerConfig(clip_len=4, stride=2,
                                                  eval_mode="dense")),
        train=TrainConfig(batch_size=4, base_lr=0.05, weight_decay=0.0),
    )
    model, state = make_state(cfg)
    step = make_train_step(model, cfg, donate=False)
    _, metrics = step(state, synth_batch(cfg), jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))

    # export -> load_pretrained -> dense tag() on a real video file
    path = str(tmp_path / "w1k")
    export_weights(path, jax.device_get(state.params),
                   jax.device_get(state.batch_stats))
    model2, variables = load_pretrained("tiny3d", path, num_classes=1000,
                                        dtype=jnp.float32)
    root, list_path = synthetic_dataset
    # build a tag list over the synthetic videos
    tag_file = tmp_path / "tags.txt"
    with open(list_path) as f:
        rows = [line.split()[0] for line in f if line.strip()]
    tag_file.write_text("\n".join(f"{r} tag_{i % 7}" for i, r in enumerate(rows)))
    records, _ = load_tag_list(str(tag_file), root=root)

    tagger = Tagger(cfg, variables, clip_batch=2)
    results = tagger.tag(records[0].path, threshold=0.0, top_k=5)
    assert len(results) == 5
    assert all(0.0 <= r.score <= 1.0 for r in results)
    scores = tagger.video_scores(records[0].path)
    assert scores.shape == (1000,)
