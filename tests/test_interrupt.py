"""Graceful-stop: signal mid-training -> checkpoint saved, clean return."""

import os
import signal
import threading

from fastvideotagging_tpu.data.ucf101 import load_video_list
from fastvideotagging_tpu.train.checkpoint import CheckpointManager
from fastvideotagging_tpu.train.fit import fit
from fastvideotagging_tpu.utils.interrupt import GracefulStopper
from tests.test_fit_integration import fit_cfg
from tests.test_train import make_state


def test_stopper_flag_and_restore():
    with GracefulStopper() as stopper:
        assert not stopper.stop_requested
        os.kill(os.getpid(), signal.SIGTERM)
        assert stopper.stop_requested
    # handler restored: a stray flag object shouldn't linger
    assert signal.getsignal(signal.SIGTERM) != stopper._handle


def test_fit_stops_and_checkpoints_on_signal(synthetic_dataset, tmp_path):
    root, list_path = synthetic_dataset
    records = load_video_list(list_path, root=root)
    cfg = fit_cfg(tmp_path, epochs=50)  # would run 100 steps if not stopped

    # Fire SIGTERM shortly after training starts.
    timer = threading.Timer(3.0, os.kill, (os.getpid(), signal.SIGTERM))
    timer.start()
    try:
        state = fit(cfg, records)
    finally:
        timer.cancel()
    assert int(state.step) < 100  # stopped early
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    assert mgr.latest_step() is not None  # checkpoint exists
    mgr.close()
