"""Packed decode-once tier (data/packed.py): golden pixel parity with the
streaming loader, bit-identical batches, fault policy, fit() integration.

The contract (VERDICT r2 item 3 / SURVEY.md §3.2 N3): a pack stores exactly
the pixels the streaming pipeline would ship (decode -> spec bilinear resize,
uint8), and PackedDataset under the same (seed, epoch, index) produces
bit-identical batches — so training from a pack is a pure IO optimization.
"""

import json
import os
import struct

import numpy as np
import pytest

from fastvideotagging_tpu.config import ClipSamplerConfig, DataConfig
from fastvideotagging_tpu.data import decode
from fastvideotagging_tpu.data.packed import (
    MAGIC,
    Pack,
    PackedDataset,
    is_pack,
    open_dataset,
    write_pack,
)
from fastvideotagging_tpu.data.pipeline import (
    ClipDataset,
    _ensure_size,
    train_batches,
)
from fastvideotagging_tpu.data.ucf101 import VideoRecord, load_video_list

CFG = DataConfig(
    resize_hw=(40, 56),
    crop_hw=(32, 32),
    sampler=ClipSamplerConfig(clip_len=4, stride=2),
    num_workers=2,
)


@pytest.fixture(scope="module")
def pack_env(tmp_path_factory):
    """(records, pack_path) over the session's synthetic videos."""
    from fastvideotagging_tpu.data import synthetic

    root = tmp_path_factory.mktemp("packsrc")
    list_path = synthetic.make_dataset(
        str(root), num_classes=3, videos_per_class=2, num_frames=24,
        height=48, width=64,
    )
    records = load_video_list(list_path, root=str(root))
    pack_path = str(tmp_path_factory.mktemp("pack") / "train.fvtpack")
    summary = write_pack(records, pack_path, CFG.resize_hw, root=str(root))
    assert summary["videos"] == len(records) and summary["skipped"] == 0
    return records, pack_path


class TestPackFile:
    def test_is_pack(self):
        assert is_pack("x/train.fvtpack")
        assert not is_pack("x/list.txt")
        assert not is_pack([VideoRecord("a", 0)])

    def test_header_and_index(self, pack_env):
        records, pack_path = pack_env
        with open(pack_path, "rb") as f:
            assert f.read(8) == MAGIC
            (off,) = struct.unpack("<Q", f.read(8))
            f.seek(off)
            index = json.loads(f.read().decode())
        assert len(index["videos"]) == len(records)
        assert (index["height"], index["width"]) == CFG.resize_hw
        # offsets are contiguous and frame-aligned
        fb = index["height"] * index["width"] * 3
        pos = 0
        for e in index["videos"]:
            assert e["offset"] == pos
            pos += e["frames"] * fb

    def test_golden_pixels_match_streaming_decode(self, pack_env):
        """Packed bytes == decode-all -> spec resize, per video, exactly."""
        records, pack_path = pack_env
        pack = Pack(pack_path)
        for i, rec in enumerate(records):
            want = _ensure_size(decode.read_all_frames(rec.path), CFG.resize_hw)
            np.testing.assert_array_equal(np.asarray(pack.video_view(i)), want)

    def test_gather_clamps_past_end(self, pack_env):
        _, pack_path = pack_env
        pack = Pack(pack_path)
        n = pack.entries[0]["frames"]
        got = pack.gather(0, np.array([0, n - 1, n + 5]))
        np.testing.assert_array_equal(got[1], got[2])

    def test_records_roundtrip(self, pack_env):
        records, pack_path = pack_env
        got = Pack(pack_path).records()
        assert [r.label for r in got] == [r.label for r in records]
        assert [os.path.basename(r.path) for r in got] == [
            os.path.basename(r.path) for r in records]

    def test_skips_undecodable(self, pack_env, tmp_path):
        records, _ = pack_env
        bad = tmp_path / "bad.mp4"
        bad.write_bytes(b"not a video at all")
        mixed = [records[0], VideoRecord(str(bad), 9), records[1]]
        out = str(tmp_path / "mixed.fvtpack")
        summary = write_pack(mixed, out, CFG.resize_hw)
        assert summary["videos"] == 2 and summary["skipped"] == 1
        pack = Pack(out)
        # data region stayed contiguous despite the mid-stream skip
        want = _ensure_size(decode.read_all_frames(records[1].path),
                            CFG.resize_hw)
        np.testing.assert_array_equal(np.asarray(pack.video_view(1)), want)


class TestPackedDataset:
    def test_geometry_mismatch_raises(self, pack_env):
        _, pack_path = pack_env
        with pytest.raises(ValueError, match="pack geometry"):
            PackedDataset(pack_path, DataConfig(resize_hw=(64, 64)))

    def test_train_batches_bit_identical_to_streaming(self, pack_env):
        """Same (seed, epoch, index) -> byte-for-byte the same batches."""
        records, pack_path = pack_env
        stream = ClipDataset(records, CFG, mode="train", seed=7)
        packed = PackedDataset(pack_path, CFG, mode="train", seed=7)
        for epoch in (0, 1):
            got = list(train_batches(packed, 2, epoch, num_workers=2))
            want = list(train_batches(stream, 2, epoch, num_workers=2))
            assert len(got) == len(want) > 0
            for g, w in zip(got, want):
                assert g.keys() == w.keys()
                for k in w:
                    np.testing.assert_array_equal(g[k], w[k])

    def test_eval_clips_bit_identical(self, pack_env):
        records, pack_path = pack_env
        stream = ClipDataset(records, CFG, mode="eval")
        packed = PackedDataset(pack_path, CFG, mode="eval")
        for i in range(len(records)):
            g, grec = packed.get_eval_clips(i)
            w, wrec = stream.get_eval_clips(i)
            np.testing.assert_array_equal(g, w)
            assert grec.label == wrec.label

    def test_open_dataset_dispatch(self, pack_env):
        records, pack_path = pack_env
        assert isinstance(open_dataset(pack_path, CFG), PackedDataset)
        ds = open_dataset(records, CFG)
        assert isinstance(ds, ClipDataset) and not isinstance(ds, PackedDataset)


class TestShipGeometry:
    """source_hw configs: the pack must store SHIP-geometry frames so the
    device-side float resize sees the same bytes as streaming (a
    resize_hw-packed file would add a uint8 rounding the streaming path
    does not have)."""

    SRC_CFG = DataConfig(
        source_hw=(48, 64),       # the synthetic videos' raw size
        resize_hw=(40, 56),
        crop_hw=(32, 32),
        sampler=ClipSamplerConfig(clip_len=4, stride=2),
        num_workers=2,
    )

    def test_resize_packed_file_rejected_for_source_hw_config(self, pack_env):
        _, pack_path = pack_env  # packed at resize_hw (40, 56)
        with pytest.raises(ValueError, match="ship geometry"):
            PackedDataset(pack_path, self.SRC_CFG)

    def test_ship_geometry_pack_bit_identical(self, pack_env, tmp_path):
        records, _ = pack_env
        pack_path = str(tmp_path / "ship.fvtpack")
        write_pack(records, pack_path, self.SRC_CFG.source_hw)
        stream = ClipDataset(records, self.SRC_CFG, mode="train", seed=3)
        packed = PackedDataset(pack_path, self.SRC_CFG, mode="train", seed=3)
        assert packed.ship_hw == stream.ship_hw == (48, 64)
        got = list(train_batches(packed, 2, 0, num_workers=2))
        want = list(train_batches(stream, 2, 0, num_workers=2))
        assert len(got) == len(want) > 0
        for g, w in zip(got, want):
            for k in w:
                np.testing.assert_array_equal(g[k], w[k])


class TestMultilabelPacks:
    def test_class_pack_rejects_multilabel(self, pack_env):
        """num_tags against a tag-less pack would silently train on
        all-zero multihot targets — must raise instead."""
        _, pack_path = pack_env
        with pytest.raises(ValueError, match="tag lists"):
            PackedDataset(pack_path, CFG, num_tags=5)

    def test_tag_pack_carries_tags_and_num_tags(self, pack_env, tmp_path):
        from fastvideotagging_tpu.cli.prepare import pack_lists
        from fastvideotagging_tpu.data.ucf101 import load_tag_list

        records, _ = pack_env
        tag_file = tmp_path / "tags.txt"
        tag_file.write_text("".join(
            f"{os.path.basename(os.path.dirname(r.path))}/"
            f"{os.path.basename(r.path)} tag_{i % 3},tag_{(i + 1) % 3}\n"
            for i, r in enumerate(records)))
        root = os.path.dirname(os.path.dirname(records[0].path))
        stats = pack_lists([str(tag_file)], root, CFG.resize_hw,
                           tag_lists=True)
        pack_path = str(tmp_path / "tags.fvtpack")
        assert os.path.exists(pack_path)
        assert stats["tags.txt"]["videos"] == len(records)

        tag_records, tag_index = load_tag_list(str(tag_file), root)
        packed = PackedDataset(pack_path, CFG, mode="train", seed=5)
        assert packed.num_tags == len(tag_index) == 3
        stream = ClipDataset(tag_records, CFG, mode="train",
                             num_tags=len(tag_index), seed=5)
        got = list(train_batches(packed, 2, 0, num_workers=2))
        want = list(train_batches(stream, 2, 0, num_workers=2))
        assert len(got) == len(want) > 0
        for g, w in zip(got, want):
            assert "multihot" in g and g["multihot"].any()
            for k in w:
                np.testing.assert_array_equal(g[k], w[k])


class TestTrainCliGuards:
    def test_tag_lists_flag_rejected_on_class_pack(self, pack_env):
        from fastvideotagging_tpu.cli import train as cli_train

        _, pack_path = pack_env
        with pytest.raises(SystemExit, match="no tag sets"):
            cli_train.main([
                "--model", "tiny3d", "--num-classes", "3",
                "--resize", "40", "56", "--crop", "32", "32",
                "--clip-len", "4", "--train-list", pack_path,
                "--tag-lists", "--epochs", "1", "--batch-size", "2",
            ])

    def test_class_index_flag_rejected_on_pack(self, pack_env, tmp_path):
        from fastvideotagging_tpu.cli import train as cli_train

        _, pack_path = pack_env
        cidx = tmp_path / "classInd.txt"
        cidx.write_text("1 a\n")
        with pytest.raises(SystemExit, match="pack time"):
            cli_train.main([
                "--model", "tiny3d", "--num-classes", "3",
                "--resize", "40", "56", "--crop", "32", "32",
                "--clip-len", "4", "--train-list", pack_path,
                "--class-index", str(cidx), "--epochs", "1",
                "--batch-size", "2",
            ])


class TestFitFromPack:
    def test_fit_consumes_pack_path(self, pack_env, tmp_path):
        """fit() trains end to end straight from a .fvtpack path."""
        from fastvideotagging_tpu.config import (
            ExperimentConfig, ModelConfig, ParallelConfig, TrainConfig,
        )
        from fastvideotagging_tpu.train.fit import fit

        records, pack_path = pack_env
        cfg = ExperimentConfig(
            model=ModelConfig(name="tiny3d", num_classes=3, dropout=0.0),
            data=CFG,
            train=TrainConfig(batch_size=2, num_epochs=1, log_every=1,
                              checkpoint_dir=""),
            parallel=ParallelConfig(data_parallel=1, model_parallel=1),
        )
        state = fit(cfg, pack_path)
        assert int(state.step) == len(records) // 2


class TestPackTagging:
    """Bulk tag-from-pack (evaluation.tagger.iter_pack_tags + cli.tag)."""

    def _tagger(self):
        import jax
        import jax.numpy as jnp

        from fastvideotagging_tpu.config import ExperimentConfig, ModelConfig
        from fastvideotagging_tpu.evaluation.tagger import Tagger
        from fastvideotagging_tpu.models import get_model

        cfg = ExperimentConfig(
            model=ModelConfig(name="tiny3d", num_classes=3, multilabel=True,
                              dropout=0.0),
            data=DataConfig(resize_hw=(40, 56), crop_hw=(32, 32),
                            sampler=ClipSamplerConfig(clip_len=4, stride=2,
                                                      eval_mode="dense")))
        model = get_model("tiny3d", num_classes=3, dropout=0.0)
        variables = jax.jit(model.init, static_argnames="train")(
            jax.random.PRNGKey(0), jnp.zeros((1, 4, 32, 32, 3), jnp.float32),
            train=False)
        return Tagger(cfg, variables, ["a", "b", "c"], clip_batch=2)

    def test_pack_scores_bit_identical_to_streaming(self, pack_env):
        """The decode-once pack serves the SAME pixels, so video scores
        match the streaming tag() bitwise."""
        from fastvideotagging_tpu.evaluation.tagger import iter_pack_tags

        import os

        records, pack_path = pack_env
        root = os.path.dirname(os.path.dirname(records[0].path))
        tagger = self._tagger()
        got = dict(iter_pack_tags(tagger, pack_path, threshold=0.0,
                                  root=root))
        assert len(got) == len(records)
        for rec in records[:3]:
            ref = tagger.video_scores(rec.path)
            packed = {r.index: r.score for r in got[rec.path]}
            assert packed == {i: float(ref[i]) for i in range(3)}

    def test_geometry_mismatch_raises(self, pack_env):
        from fastvideotagging_tpu.evaluation.tagger import iter_pack_tags

        _, pack_path = pack_env
        tagger = self._tagger()
        tagger.cfg = tagger.cfg.__class__(
            model=tagger.cfg.model,
            data=DataConfig(resize_hw=(48, 64), crop_hw=(32, 32)))
        with pytest.raises(ValueError, match="geometry"):
            next(iter(iter_pack_tags(tagger, pack_path)))

    def test_tag_cli_bulk_packs(self, pack_env, tmp_path, capsys):
        import jax

        from fastvideotagging_tpu.cli import tag as cli_tag
        from fastvideotagging_tpu.train.checkpoint import export_weights

        import os

        records, pack_path = pack_env
        root = os.path.dirname(os.path.dirname(records[0].path))
        tagger = self._tagger()
        weights = str(tmp_path / "w")
        v = jax.device_get(tagger.variables)
        export_weights(weights, v["params"], v["batch_stats"])
        capsys.readouterr()
        cli_tag.main([
            pack_path, "--data-root", root, "--model", "tiny3d",
            "--num-classes", "3",
            "--multilabel", "--dropout", "0.0", "--clip-len", "4",
            "--stride", "2", "--eval-mode", "dense", "--resize", "40", "56",
            "--crop", "32", "32", "--weights", weights, "--threshold", "0.0",
            "--top-k", "2", "--clip-batch", "2",
        ])
        lines = [json.loads(line) for line in
                 capsys.readouterr().out.strip().splitlines()]
        assert len(lines) == len(records)
        assert {r["video"] for r in lines} == {r.path for r in records}
        assert all(len(r["tags"]) == 2 for r in lines)


def test_write_pack_from_arrays_roundtrip(tmp_path):
    """The array-direct writer (benchmark/synthetic prep) produces packs
    the production reader serves verbatim — the format has ONE owner
    (_PackWriter), so this also pins the layout."""
    import numpy as np

    from fastvideotagging_tpu.data.packed import Pack, write_pack_from_arrays
    from fastvideotagging_tpu.data.synthetic import make_frames

    items = [(f"v{i}.mp4", i % 3, [], make_frames(i, 6, 40, 56, seed=i))
             for i in range(4)]
    out = str(tmp_path / "arrays.fvtpack")
    summary = write_pack_from_arrays(iter(items), out, (40, 56))
    assert summary["videos"] == 4 and summary["frames"] == 24

    pack = Pack(out)
    assert (pack.height, pack.width) == (40, 56)
    for i, (path, label, _tags, frames) in enumerate(items):
        assert pack.entries[i]["path"] == path
        assert pack.entries[i]["label"] == label
        got = pack.gather(i, np.arange(6))
        np.testing.assert_array_equal(got, frames)
    # geometry is enforced at write time
    import pytest

    with pytest.raises(ValueError, match="pack geometry"):
        write_pack_from_arrays(
            [("x.mp4", 0, [], make_frames(0, 4, 32, 32))],
            str(tmp_path / "bad.fvtpack"), (40, 56))
