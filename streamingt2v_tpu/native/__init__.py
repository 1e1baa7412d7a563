"""Native (C++) runtime components.

`AsyncVideoWriter` wraps the C++ media feeder (media_feeder.cpp): frames
submitted as float32 RGB in [-1,1] are converted to YUV420 and written to
a YUV4MPEG2 stream on a background thread, overlapping host video export
with TPU compute.  The library builds lazily with g++ and is cached next
to the source; environments without a toolchain fall back to the Python
writer in utils/media.py.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "media_feeder.cpp")
_LIB = os.path.join(os.path.dirname(__file__), "libmediafeeder.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None


def _build() -> str:
    if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-pthread", _SRC, "-o", _LIB],
            check=True, capture_output=True,
        )
    return _LIB


def load_library() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is None:
            lib = ctypes.CDLL(_build())
            lib.mfw_open.restype = ctypes.c_void_p
            lib.mfw_open.argtypes = [ctypes.c_char_p] + [ctypes.c_int] * 4
            lib.mfw_submit.restype = ctypes.c_int
            lib.mfw_submit.argtypes = [ctypes.c_void_p,
                                       ctypes.POINTER(ctypes.c_float), ctypes.c_int]
            lib.mfw_pending.restype = ctypes.c_int
            lib.mfw_pending.argtypes = [ctypes.c_void_p]
            lib.mfw_close.restype = ctypes.c_int
            lib.mfw_close.argtypes = [ctypes.c_void_p]
            _lib = lib
    return _lib


def available() -> bool:
    try:
        load_library()
        return True
    except Exception:
        return False


class AsyncVideoWriter:
    """Non-blocking Y4M video writer. Frames: (N, H, W, 3) float32 [-1,1]."""

    def __init__(self, path: str, width: int, height: int, fps: int = 24):
        self._lib = load_library()
        self._handle = self._lib.mfw_open(path.encode(), width, height, fps, 1)
        if not self._handle:
            raise RuntimeError(f"cannot open {path} (even dimensions required)")
        self.width = width
        self.height = height

    def write(self, frames: np.ndarray) -> None:
        frames = np.ascontiguousarray(frames, dtype=np.float32)
        assert frames.ndim == 4 and frames.shape[1:] == (self.height, self.width, 3), (
            frames.shape
        )
        rc = self._lib.mfw_submit(
            self._handle, frames.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            frames.shape[0],
        )
        if rc != 0:
            raise IOError(f"submit failed ({rc})")

    @property
    def pending(self) -> int:
        return self._lib.mfw_pending(self._handle)

    def close(self) -> None:
        if self._handle:
            rc = self._lib.mfw_close(self._handle)
            self._handle = None
            if rc != 0:
                raise IOError(f"writer reported errors ({rc})")

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
