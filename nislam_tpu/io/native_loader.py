"""ctypes binding for the native packed-dataset loader (libnisf_loader.so).

Streams (chunk, H, W) float32 frame blocks from a NISF file (written by any
dataset's ``pack()``) with C++ prefetch threads overlapping disk I/O with
device compute — the high-throughput input path for benchmarking and
production serving.  Auto-builds the shared library with ``make`` on first
use if a toolchain is present; ``NativeChunkReader.available()`` gates
callers that need a fallback (the pure-Python ``Dataset.chunks``).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Iterator, Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libnisf_loader.so"))

_lib: Optional[ctypes.CDLL] = None
_lib_tried = False


def _build() -> bool:
    try:
        r = subprocess.run(
            ["make", "-C", os.path.abspath(_NATIVE_DIR)],
            capture_output=True,
            text=True,
            timeout=120,
        )
        return r.returncode == 0 and os.path.exists(_LIB_PATH)
    except (OSError, subprocess.TimeoutExpired):
        return False


def _load_lib() -> Optional[ctypes.CDLL]:
    global _lib, _lib_tried
    if _lib is not None or _lib_tried:
        return _lib
    _lib_tried = True
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.nisf_open.restype = ctypes.c_void_p
    lib.nisf_open.argtypes = [ctypes.c_char_p]
    lib.nisf_info.argtypes = [ctypes.c_void_p] + [ctypes.POINTER(ctypes.c_int64)] * 3
    lib.nisf_timestamps.restype = ctypes.POINTER(ctypes.c_double)
    lib.nisf_timestamps.argtypes = [ctypes.c_void_p]
    lib.nisf_elem_size.restype = ctypes.c_int64
    lib.nisf_elem_size.argtypes = [ctypes.c_void_p]
    lib.nisf_frame.restype = ctypes.c_void_p
    lib.nisf_frame.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.nisf_start_prefetch.restype = ctypes.c_int
    lib.nisf_start_prefetch.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
    ]
    lib.nisf_next_chunk.restype = ctypes.c_int64
    lib.nisf_next_chunk.argtypes = [
        ctypes.c_void_p,
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_double),
    ]
    lib.nisf_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


class NativeChunkReader:
    """Iterate (frames (N≤chunk, H, W), times (N,) f64) chunks.

    Frames come in the file's stored dtype (:attr:`dtype`): uint8 for
    NISF v2 (8-bit sources — ship raw over the host→device link, the
    engine normalizes /255 on device) or f32 for v1."""

    def __init__(self, path: str, chunk: int, *, threads: int = 2, ring: int = 4):
        lib = _load_lib()
        if lib is None:
            raise RuntimeError(
                "libnisf_loader.so unavailable (no C++ toolchain?); use the "
                "pure-Python Dataset.chunks() fallback"
            )
        self._lib = lib
        self._h = lib.nisf_open(path.encode())
        if not self._h:
            raise FileNotFoundError(f"cannot open NISF file {path}")
        n = ctypes.c_int64()
        hh = ctypes.c_int64()
        ww = ctypes.c_int64()
        lib.nisf_info(self._h, ctypes.byref(n), ctypes.byref(hh), ctypes.byref(ww))
        self.n, self.height, self.width = n.value, hh.value, ww.value
        self.dtype = (
            np.uint8 if lib.nisf_elem_size(self._h) == 1 else np.float32
        )
        self.chunk = chunk
        if lib.nisf_start_prefetch(self._h, chunk, threads, ring) != 0:
            raise RuntimeError("prefetch start failed")

    @staticmethod
    def available() -> bool:
        return _load_lib() is not None

    def __len__(self) -> int:
        return self.n

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        buf = np.empty((self.chunk, self.height, self.width), self.dtype)
        tbuf = np.empty((self.chunk,), np.float64)
        while True:
            got = self._lib.nisf_next_chunk(
                self._h,
                buf.ctypes.data_as(ctypes.c_void_p),
                tbuf.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            )
            if got <= 0:
                break
            yield buf[:got].copy(), tbuf[:got].copy()

    def frame(self, idx: int) -> np.ndarray:
        """Zero-copy single-frame view into the mmap (stored dtype)."""
        ptr = self._lib.nisf_frame(self._h, idx)
        if not ptr:
            raise IndexError(idx)
        ctype = ctypes.c_uint8 if self.dtype == np.uint8 else ctypes.c_float
        return np.ctypeslib.as_array(
            ctypes.cast(ptr, ctypes.POINTER(ctype)),
            shape=(self.height, self.width),
        )

    def timestamps(self) -> np.ndarray:
        ptr = self._lib.nisf_timestamps(self._h)
        return np.ctypeslib.as_array(ptr, shape=(self.n,)).copy()

    def close(self):
        if getattr(self, "_h", None):
            self._lib.nisf_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
