"""ctypes bindings for the native host data-plane (framepack.c).

Auto-builds the shared object with the system compiler on first use (cached
next to the source); every entry point has a pure-numpy fallback so the
framework works without a compiler.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "framepack.c")
_SO = os.path.join(_HERE, "_fvt_native.so")
_lock = threading.Lock()
_lib = None
_build_failed = False


def _load():
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        try:
            if (not os.path.exists(_SO)
                    or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                for cc in ("cc", "gcc", "clang"):
                    try:
                        subprocess.run(
                            [cc, "-O3", "-march=native", "-shared", "-fPIC",
                             "-o", _SO, _SRC, "-lm"],
                            check=True, capture_output=True, timeout=120,
                        )
                        break
                    except (FileNotFoundError, subprocess.CalledProcessError):
                        continue
                else:
                    raise RuntimeError("no working C compiler")
            lib = ctypes.CDLL(_SO)
            lib.fvt_pack_frames.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p,
            ]
            lib.fvt_resize_batch_u8.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_void_p, ctypes.c_int64,
                ctypes.c_int64,
            ]
            lib.fvt_resize_batch_u8.restype = ctypes.c_int
            _lib = lib
        except Exception:
            _build_failed = True
    return _lib


def available() -> bool:
    return _load() is not None


def pack_frames(frames: np.ndarray, indices: np.ndarray) -> np.ndarray:
    """Gather frames[i] for i in indices -> (len(indices), H, W, 3) uint8.

    Out-of-range indices clamp to the last frame.
    """
    frames = np.ascontiguousarray(frames, dtype=np.uint8)
    idx = np.ascontiguousarray(indices, dtype=np.int64).reshape(-1)
    lib = _load()
    if lib is None:
        return frames[np.clip(idx, 0, len(frames) - 1)]
    out = np.empty((len(idx),) + frames.shape[1:], np.uint8)
    lib.fvt_pack_frames(
        frames.ctypes.data, frames.shape[0], idx.ctypes.data, len(idx),
        int(np.prod(frames.shape[1:])), out.ctypes.data,
    )
    return out


def resize_batch_u8(frames: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Bilinear (half-pixel) resize of (T, H, W, 3) uint8 frames."""
    frames = np.ascontiguousarray(frames, dtype=np.uint8)
    t, h, w, c = frames.shape
    assert c == 3
    lib = _load()
    if lib is None:
        from fastvideotagging_tpu.data.preprocess import resize_bilinear_host

        x = resize_bilinear_host(frames, out_h, out_w)
        return np.clip(np.rint(x), 0, 255).astype(np.uint8)
    out = np.empty((t, out_h, out_w, 3), np.uint8)
    rc = lib.fvt_resize_batch_u8(frames.ctypes.data, t, h, w,
                                 out.ctypes.data, out_h, out_w)
    if rc != 0:  # pragma: no cover - allocation failure
        raise MemoryError("fvt_resize_batch_u8 failed")
    return out
