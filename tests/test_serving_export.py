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
