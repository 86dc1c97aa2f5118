"""ctypes binding for the native batch assembler (data/native/loader.cc).

Builds the shared library on first use with the system g++ (cached next to
the source); falls back to the pure-numpy path when no compiler is
available.  The native path applies only to RAM-cached datasets — the gather
+ transpose is the CPU-bound step, and C++ threads bypass the GIL.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_SRC_DIR = os.path.join(os.path.dirname(__file__), "native")
_SO_PATH = os.path.join(_SRC_DIR, "libc2wloader.so")
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build() -> bool:
    # -march=native is safe: the library is always built on the machine that
    # runs it (never shipped; *.so is gitignored so a foreign binary cannot
    # be loaded and SIGILL mid-training).
    src = os.path.join(_SRC_DIR, "loader.cc")
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-pthread",
        src, "-o", _SO_PATH,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception as e:  # no compiler / build failure -> numpy fallback
        print(f"native loader build failed ({e}); using numpy fallback")
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        if not os.path.exists(_SO_PATH):
            src = os.path.join(_SRC_DIR, "loader.cc")
            if not (os.path.exists(src) and _build()):
                return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError:
            if not _build():
                return None
            lib = ctypes.CDLL(_SO_PATH)
        lib.c2w_assemble_batch.argtypes = [
            ctypes.POINTER(ctypes.c_float),  # data
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),  # indices
            ctypes.c_int64,                  # n
            ctypes.c_int64,                  # window
            ctypes.POINTER(ctypes.c_float),  # out
            ctypes.c_int64,                  # num_threads
        ]
        lib.c2w_assemble_batch.restype = None
        lib.c2w_abi_version.restype = ctypes.c_int64
        assert lib.c2w_abi_version() == 1
        _LIB = lib
        return _LIB


def assemble_batch(
    data: np.ndarray,
    indices: np.ndarray,
    window: int,
    num_threads: int = 8,
    out: Optional[np.ndarray] = None,
) -> Optional[np.ndarray]:
    """[T, C, H, W] cache + [n] window starts -> [n, H, W, window*C].

    Returns None when the native library is unavailable (caller falls back
    to numpy).
    """
    lib = get_lib()
    if lib is None:
        return None
    assert data.dtype == np.float32 and data.flags.c_contiguous
    T, C, H, W = data.shape
    idx = np.ascontiguousarray(indices, np.int64)
    assert idx.ndim == 1
    assert idx.min() >= 0 and idx.max() + window <= T
    n = len(idx)
    if out is None:
        out = np.empty((n, H, W, window * C), np.float32)
    lib.c2w_assemble_batch(
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        T, C, H, W,
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n, window,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        num_threads,
    )
    return out
