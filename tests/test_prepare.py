"""Dataset prep CLI: tree scan -> UCF101-format lists roundtrip."""

import os

from fastvideotagging_tpu.cli.prepare import scan_tree, write_splits
from fastvideotagging_tpu.data import ucf101


def test_prepare_roundtrip(synthetic_dataset, tmp_path):
    root, _ = synthetic_dataset
    classes = scan_tree(root)
    assert len(classes) == 3
    assert all(len(v) == 2 for v in classes.values())

    out = str(tmp_path / "lists")
    stats = write_splits(classes, out, val_fraction=0.5, seed=0)
    assert stats == {"classes": 3, "train": 3, "val": 3}

    cidx = ucf101.load_class_index(os.path.join(out, "classInd.txt"))
    assert len(cidx) == 3
    train = ucf101.load_video_list(os.path.join(out, "trainlist01.txt"),
                                   root=root, class_index=cidx)
    val = ucf101.load_video_list(os.path.join(out, "testlist01.txt"),
                                 root=root, class_index=cidx)
    assert len(train) == 3 and len(val) == 3
    # no overlap, labels consistent with directory names
    assert {r.path for r in train}.isdisjoint({r.path for r in val})
    for r in train + val:
        cls = os.path.basename(os.path.dirname(r.path))
        assert r.label == cidx[cls]
