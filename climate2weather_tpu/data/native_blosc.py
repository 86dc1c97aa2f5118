"""ctypes binding for the native blosc1/LZ4 codec (data/native/blosc.cc).

Lets the dependency-free zarr-v2 backend (data/zarr_store.py) read stores
written by real zarr installs, whose default compressor is
``Blosc(cname='lz4', clevel=5, shuffle=SHUFFLE)`` — previously a hard error
(round-2 ADVICE finding).  Also exposes the encoder so ``write_zarr`` can
produce blosc-lz4 stores (~5-10x faster than zlib on weather fields).

Built on first use via the shared scaffolding (data/native_build.py).
When no compiler is available, ``decompress``/``compress`` raise
``RuntimeError`` — callers surface the zlib-rewrite guidance instead.
"""

from __future__ import annotations

import ctypes
from typing import Optional

import numpy as np

from climate2weather_tpu.data.native_build import load_native

_ERRORS = {
    -1: "truncated chunk",
    -2: "output capacity too small",
    -3: "unsupported codec (only lz4 and memcpy chunks are handled; "
        "blosclz/zlib/zstd chunks need a rewrite with compressor zlib "
        "or blosc-lz4)",
    -4: "bit-shuffle filter not supported (byte-shuffle only)",
    -5: "corrupt chunk",
    -6: "buffer too large for the blosc1 format (2 GiB chunk limit)",
}


def _bind(lib: ctypes.CDLL) -> None:
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.c2w_blosc_nbytes.argtypes = [u8p, ctypes.c_int64]
    lib.c2w_blosc_nbytes.restype = ctypes.c_int64
    lib.c2w_blosc_decompress.argtypes = [u8p, ctypes.c_int64, u8p, ctypes.c_int64]
    lib.c2w_blosc_decompress.restype = ctypes.c_int64
    lib.c2w_blosc_compress.argtypes = [
        u8p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int32,
        ctypes.c_int64, u8p, ctypes.c_int64,
    ]
    lib.c2w_blosc_compress.restype = ctypes.c_int64
    lib.c2w_blosc_abi_version.restype = ctypes.c_int64
    assert lib.c2w_blosc_abi_version() == 1


def get_lib() -> Optional[ctypes.CDLL]:
    return load_native("blosc.cc", "libc2wblosc.so", _bind)


def available() -> bool:
    return get_lib() is not None


def _u8(buf: np.ndarray) -> "ctypes.pointer":
    return buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _check(rc: int, what: str) -> int:
    if rc < 0:
        raise ValueError(f"blosc {what} failed: {_ERRORS.get(rc, rc)}")
    return rc


def decompress(raw: bytes) -> bytes:
    """Decode one blosc1 chunk (lz4 or memcpy, optional byte-shuffle)."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError(
            "native blosc codec unavailable (no g++?); cannot read "
            "blosc-compressed zarr chunks"
        )
    src = np.frombuffer(raw, np.uint8)
    nbytes = _check(lib.c2w_blosc_nbytes(_u8(src), len(raw)), "header parse")
    out = np.empty(nbytes, np.uint8)
    n = _check(lib.c2w_blosc_decompress(_u8(src), len(raw), _u8(out), nbytes),
               "decompress")
    assert n == nbytes, (n, nbytes)
    return out.tobytes()


def compress(raw: bytes, typesize: int, shuffle: bool = True,
             blocksize: int = 0) -> bytes:
    """Encode one blosc1 chunk with the lz4 codec."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native blosc codec unavailable (no g++?)")
    src = np.frombuffer(raw, np.uint8)
    cap = 16 + len(raw) + len(raw) // 16 + 64
    out = np.empty(cap, np.uint8)
    n = _check(
        lib.c2w_blosc_compress(
            _u8(src), len(raw), int(typesize), int(bool(shuffle)),
            int(blocksize), _u8(out), cap,
        ),
        "compress",
    )
    return out[:n].tobytes()
