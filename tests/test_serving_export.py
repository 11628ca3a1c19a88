"""StableHLO serving export: serialize -> deserialize -> numerical identity."""

import jax
import jax.numpy as jnp
import numpy as np

from fastvideotagging_tpu.evaluation.serving import (
    export_serving,
    load_serving,
    make_serving_fn,
)
from tests.test_eval_tag import eval_cfg, init_variables


def test_export_roundtrip(tmp_path, rng):
    cfg = eval_cfg(multilabel=True)
    _, variables = init_variables(cfg)
    path = str(tmp_path / "serving.stablehlo")
    data = export_serving(cfg, variables, clip_batch=2, path=path)
    assert len(data) > 1000

    clips = rng.integers(0, 256, size=(2, 4, 48, 64, 3), dtype=np.int64
                         ).astype(np.uint8)
    ref = np.asarray(jax.jit(make_serving_fn(cfg, variables))(
        jnp.asarray(clips)))
    exported = load_serving(path)
    got = np.asarray(exported.call(jnp.asarray(clips)))
    assert got.shape == (2, 3)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)
    assert (got >= 0).all() and (got <= 1).all()  # sigmoid scores


def test_int8_export_roundtrip(tmp_path, rng):
    """The int8 PTQ engine exports as a self-contained StableHLO program:
    int8 weights + epilogue constants baked in, scores bit-identical to
    the in-process engine."""
    from fastvideotagging_tpu.config import (
        ClipSamplerConfig, DataConfig, ExperimentConfig, ModelConfig,
    )
    from fastvideotagging_tpu.evaluation.serving import quantize_for_serving
    from fastvideotagging_tpu.models import get_model

    cfg = ExperimentConfig(
        model=ModelConfig(name="r2plus1d_18", num_classes=5, multilabel=True,
                          compute_dtype="bfloat16"),
        data=DataConfig(source_hw=(48, 64), resize_hw=(40, 56),
                        crop_hw=(32, 32),
                        sampler=ClipSamplerConfig(clip_len=4)),
    )
    model = get_model("r2plus1d_18", num_classes=5)
    x = jnp.zeros((1, 4, 32, 32, 3), jnp.float32)
    variables = jax.jit(model.init, static_argnames="train")(
        jax.random.PRNGKey(0), x, train=False)

    clips_u8 = rng.integers(0, 256, size=(2, 4, 48, 64, 3), dtype=np.int64
                            ).astype(np.uint8)
    qpack = quantize_for_serving(cfg, variables, [clips_u8])
    path = str(tmp_path / "serving_int8.stablehlo")
    export_serving(cfg, variables, clip_batch=2, path=path, qpack=qpack)

    ref = np.asarray(jax.jit(make_serving_fn(cfg, variables, qpack=qpack))(
        jnp.asarray(clips_u8)))
    got = np.asarray(load_serving(path).call(jnp.asarray(clips_u8)))
    assert got.shape == (2, 5)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)
    # and the quantized scores track the bf16 serving fn
    bf16 = np.asarray(jax.jit(make_serving_fn(cfg, variables))(
        jnp.asarray(clips_u8)))
    assert np.corrcoef(got.ravel(), bf16.ravel())[0, 1] > 0.9
