"""ctypes binding for the native prefetching image loader (native/loader.cpp).

Falls back cleanly when the shared library hasn't been built; the pure-python
EuRoC reader (data/euroc.py) remains the functional fallback.  Build with
``make -C native``.
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional

import numpy as np

_LIB_PATHS = [
    os.path.join(os.path.dirname(__file__), "..", "..", "native", "librebvio_loader.so"),
    os.path.join(os.path.dirname(__file__), "librebvio_loader.so"),
]


def _try_build() -> None:
    """Best-effort on-demand build (the .so is not committed; see native/Makefile)."""
    import subprocess
    native_dir = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..", "native"))
    if os.path.exists(os.path.join(native_dir, "Makefile")):
        try:
            subprocess.run(["make", "-C", native_dir], check=False,
                           capture_output=True, timeout=120)
        except Exception:
            pass


def _load_lib() -> Optional[ctypes.CDLL]:
    if not any(os.path.exists(os.path.abspath(p)) for p in _LIB_PATHS):
        _try_build()
    for p in _LIB_PATHS:
        p = os.path.abspath(p)
        if os.path.exists(p):
            lib = ctypes.CDLL(p)
            lib.rebvio_loader_open.restype = ctypes.c_void_p
            lib.rebvio_loader_open.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_float,
            ]
            lib.rebvio_loader_next.restype = ctypes.c_int
            lib.rebvio_loader_next.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ]
            lib.rebvio_loader_close.argtypes = [ctypes.c_void_p]
            return lib
    return None


_LIB = _load_lib()


def available() -> bool:
    return _LIB is not None


class NativeImageLoader:
    """Threaded prefetching PNG loader; yields float32 [H,W] frames with the
    input gain already applied (like the reference's convertTo(x3.0),
    rebvio.cpp:43)."""

    def __init__(self, paths: List[str], rows: int, cols: int,
                 n_threads: int = 2, ring: int = 8, gain: float = 1.0):
        if _LIB is None:
            raise RuntimeError("native loader not built (make -C native)")
        self.rows, self.cols = rows, cols
        arr = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
        self._paths_keepalive = arr
        self._h = _LIB.rebvio_loader_open(arr, len(paths), n_threads, ring,
                                          ctypes.c_float(gain))
        self._buf = np.zeros((rows * cols,), np.float32)
        self.n = len(paths)

    def __len__(self):
        return self.n

    def __iter__(self):
        while True:
            f = self.next()
            if f is None:
                return
            yield f

    def next(self) -> Optional[np.ndarray]:
        w = ctypes.c_int()
        h = ctypes.c_int()
        rc = _LIB.rebvio_loader_next(
            self._h, self._buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.byref(w), ctypes.byref(h),
        )
        if rc == 0:
            return None
        if rc < 0:
            raise IOError("native loader: decode failed")
        if h.value != self.rows or w.value != self.cols:
            raise ValueError(f"frame size {h.value}x{w.value} != {self.rows}x{self.cols}")
        return self._buf.reshape(self.rows, self.cols).copy()

    def close(self):
        if self._h:
            _LIB.rebvio_loader_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
