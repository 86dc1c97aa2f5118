"""ctypes binding for the native batch assembler (data/native/loader.cc).

Built on first use via the shared scaffolding (data/native_build.py); falls
back to the pure-numpy path when no compiler is available.  The native path
applies only to RAM-cached datasets — the gather + transpose is the
CPU-bound step, and C++ threads bypass the GIL.
"""

from __future__ import annotations

import ctypes
from typing import Optional

import numpy as np

from climate2weather_tpu.data.native_build import load_native


def _bind(lib: ctypes.CDLL) -> None:
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


def get_lib() -> Optional[ctypes.CDLL]:
    return load_native("loader.cc", "libc2wloader.so", _bind)


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
