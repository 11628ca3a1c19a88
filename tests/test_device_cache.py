"""HBM-resident device-cache tier (data/device_cache.py).

Contract under test: staging the pack into device memory and gathering
clip rows on-device yields BIT-identical batches to the streaming packed
loader — same Philox permutation, same per-sample draws, same clamp-fill
policy — and the device_cache train step consumes them end to end
(including under a multi-device data-parallel mesh with the cache
replicated)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastvideotagging_tpu.config import (
    ClipSamplerConfig,
    DataConfig,
    ExperimentConfig,
    ModelConfig,
    ParallelConfig,
    TrainConfig,
)
from fastvideotagging_tpu.data.device_cache import (
    DeviceFrameCache,
    build_cache,
    train_index_batches,
)
from fastvideotagging_tpu.data.packed import PackedDataset, write_pack
from fastvideotagging_tpu.data.pipeline import ClipDataset, train_batches
from fastvideotagging_tpu.data.ucf101 import load_video_list

CFG = DataConfig(
    resize_hw=(40, 56),
    crop_hw=(32, 32),
    sampler=ClipSamplerConfig(clip_len=4, stride=2),
    num_workers=2,
    cache_on_device=True,
)


@pytest.fixture(scope="module")
def pack_env(tmp_path_factory):
    from fastvideotagging_tpu.data import synthetic

    root = tmp_path_factory.mktemp("dcsrc")
    list_path = synthetic.make_dataset(
        str(root), num_classes=3, videos_per_class=2, num_frames=24,
        height=48, width=64,
    )
    records = load_video_list(list_path, root=str(root))
    pack_path = str(tmp_path_factory.mktemp("dcpack") / "train.fvtpack")
    summary = write_pack(records, pack_path, CFG.resize_hw, root=str(root))
    assert summary["videos"] == len(records) and summary["skipped"] == 0
    return records, pack_path


class TestIndexBatches:
    def test_bit_identical_to_streaming(self, pack_env):
        """cache[rows] == the streaming loader's frames, byte for byte."""
        _, pack_path = pack_env
        ds = PackedDataset(pack_path, CFG, mode="train", seed=7)
        cache = DeviceFrameCache(ds.pack)
        frames_host = np.asarray(cache.frames)
        for epoch in (0, 1):
            got = list(train_index_batches(ds, cache, 2, epoch))
            want = list(train_batches(ds, 2, epoch, num_workers=2))
            assert len(got) == len(want) > 0
            for g, w in zip(got, want):
                np.testing.assert_array_equal(frames_host[g["rows"]],
                                              w["frames"])
                for k in ("labels", "crop_tops", "crop_lefts", "flips",
                          "weights"):
                    np.testing.assert_array_equal(g[k], w[k])

    def test_clamps_past_stored_frames(self, pack_env):
        """Sampled indices past the stored range hit the last stored row
        (the pack reader's fill policy)."""
        _, pack_path = pack_env
        ds = PackedDataset(pack_path, CFG, mode="train", seed=7)
        cache = DeviceFrameCache(ds.pack)
        n = cache.frames_count[0]
        rows = cache.global_rows(0, np.array([0, n - 1, n + 10]))
        assert rows[1] == rows[2] == cache.row_offset[0] + n - 1

    def test_rejects_streaming_dataset(self, pack_env):
        records, pack_path = pack_env
        ds = PackedDataset(pack_path, CFG, mode="train", seed=7)
        cache = DeviceFrameCache(ds.pack)
        stream = ClipDataset(records, CFG, mode="train", seed=7)
        with pytest.raises(TypeError, match="PackedDataset"):
            next(train_index_batches(stream, cache, 2, 0))

    def test_rejects_host_crop(self, pack_env):
        import dataclasses

        _, pack_path = pack_env
        cfg = dataclasses.replace(CFG, host_crop=True)
        ds = PackedDataset(pack_path, cfg, mode="train", seed=7)
        cache = DeviceFrameCache(ds.pack)
        with pytest.raises(ValueError, match="host_crop"):
            next(train_index_batches(ds, cache, 2, 0))

    def test_budget_guard(self, pack_env):
        _, pack_path = pack_env
        ds = PackedDataset(pack_path, CFG, mode="train", seed=7)
        with pytest.raises(ValueError, match="budget"):
            DeviceFrameCache(ds.pack, budget_bytes=1024)

    def test_multihost_rows_subset(self, pack_env):
        """rows= yields exactly those global-batch rows (multi-host path)."""
        _, pack_path = pack_env
        ds = PackedDataset(pack_path, CFG, mode="train", seed=7)
        cache = DeviceFrameCache(ds.pack)
        full = list(train_index_batches(ds, cache, 2, 0))
        sub = list(train_index_batches(ds, cache, 2, 0, rows=[1]))
        assert len(sub) == len(full)
        for f, s in zip(full, sub):
            np.testing.assert_array_equal(s["rows"], f["rows"][1:2])
            np.testing.assert_array_equal(s["labels"], f["labels"][1:2])


class TestDeviceCacheStep:
    def test_step_matches_streaming_step(self, pack_env):
        """One train step from cache rows == one step from shipped frames
        (same draws, same uint8 pixels -> same loss and updated params)."""
        from fastvideotagging_tpu.models import model_from_config
        from fastvideotagging_tpu.train import lr as lr_lib
        from fastvideotagging_tpu.train.loop import make_train_step
        from fastvideotagging_tpu.train.state import create_train_state

        _, pack_path = pack_env
        cfg = ExperimentConfig(
            model=ModelConfig(name="tiny3d", num_classes=3, dropout=0.0),
            data=CFG,
            train=TrainConfig(batch_size=2, checkpoint_dir=""),
        )
        ds = PackedDataset(pack_path, CFG, mode="train", seed=7)
        cache = DeviceFrameCache(ds.pack)
        model = model_from_config(cfg.model)
        tx = lr_lib.make_optimizer(cfg.train, steps_per_epoch=3)
        sample = jnp.zeros((1, 4, 32, 32, 3), jnp.float32)
        state0 = create_train_state(model, tx, jax.random.PRNGKey(0), sample)

        ib = next(train_index_batches(ds, cache, 2, 0))
        sb = next(train_batches(ds, 2, 0, num_workers=2))
        rng = jax.random.PRNGKey(1)
        cached_step = make_train_step(model, cfg, donate=False,
                                      device_cache=True)
        plain_step = make_train_step(model, cfg, donate=False)
        s1, m1 = cached_step(state0, jax.tree.map(jnp.asarray, ib), rng,
                             cache.frames)
        s2, m2 = plain_step(state0, jax.tree.map(jnp.asarray, sb), rng)
        assert np.allclose(float(m1["loss"]), float(m2["loss"]),
                           rtol=1e-5, atol=1e-6)
        for a, b in zip(jax.tree.leaves(s1.params),
                        jax.tree.leaves(s2.params)):
            np.testing.assert_allclose(np.asarray(a, np.float32),
                                       np.asarray(b, np.float32),
                                       rtol=1e-4, atol=1e-5)

    def test_fit_cache_on_device_multidevice(self, pack_env, tmp_path):
        """fit(cache_on_device=True) trains end to end over a 2-device
        data-parallel mesh (replicated cache, sharded index batches)."""
        from fastvideotagging_tpu.train.fit import fit

        _, pack_path = pack_env
        cfg = ExperimentConfig(
            model=ModelConfig(name="tiny3d", num_classes=3, dropout=0.0),
            data=CFG,
            train=TrainConfig(batch_size=2, num_epochs=2, base_lr=0.01,
                              log_every=1, checkpoint_dir=""),
            parallel=ParallelConfig(data_parallel=2, model_parallel=1),
        )
        state = fit(cfg, pack_path)
        assert int(state.step) == 2 * (6 // 2)
        for leaf in jax.tree.leaves(state.params):
            assert np.all(np.isfinite(np.asarray(leaf, np.float32)))

    def test_fit_rejects_streaming_records(self, pack_env):
        from fastvideotagging_tpu.train.fit import fit

        records, _ = pack_env
        cfg = ExperimentConfig(
            model=ModelConfig(name="tiny3d", num_classes=3, dropout=0.0),
            data=CFG,
            train=TrainConfig(batch_size=2, num_epochs=1,
                              checkpoint_dir=""),
            parallel=ParallelConfig(data_parallel=1, model_parallel=1),
        )
        with pytest.raises(ValueError, match="fvtpack"):
            fit(cfg, records)


def test_build_cache_replicated_under_mesh(pack_env):
    """build_cache(mesh=...) places one replicated copy per device."""
    from fastvideotagging_tpu.parallel import make_mesh

    _, pack_path = pack_env
    ds = PackedDataset(pack_path, CFG, mode="train", seed=7)
    mesh = make_mesh(2, 1, devices=jax.devices()[:2])
    cache = build_cache(ds, mesh=mesh)
    assert len(cache.frames.sharding.device_set) == 2
    assert cache.frames.sharding.is_fully_replicated
