"""Shared build-and-load scaffolding for the native components in
``data/native/`` (batch assembler, blosc codec).

One code path for: first-use g++ build cached next to the source, a
stale-binary guard (rebuild when the ``.cc`` is newer than the cached
``.so`` — without it a pulled source fix would keep running the old
binary silently), a rebuild-on-dlopen-failure retry, and the ABI-version
assert.  ``-march=native`` is safe: the library is always built on the
machine that runs it (``*.so`` is gitignored, so a foreign binary can
never be loaded).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Callable, Dict, Optional

_SRC_DIR = os.path.join(os.path.dirname(__file__), "native")
_LOCK = threading.Lock()
_CACHE: Dict[str, Optional[ctypes.CDLL]] = {}


def _build(src: str, so: str) -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-pthread",
        src, "-o", so,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception as e:  # no compiler / build failure -> caller falls back
        print(f"native build of {os.path.basename(src)} failed ({e})")
        return False


def load_native(
    src_name: str, so_name: str, bind: Callable[[ctypes.CDLL], None]
) -> Optional[ctypes.CDLL]:
    """Build (if needed) and dlopen ``data/native/<src_name>``.

    ``bind(lib)`` declares argtypes/restypes and asserts the ABI version.
    Returns the bound CDLL, or None when no compiler is available (the
    result, including None, is cached for the process lifetime).
    """
    with _LOCK:
        if so_name in _CACHE:
            return _CACHE[so_name]
        _CACHE[so_name] = None  # failure is sticky until process restart
        src = os.path.join(_SRC_DIR, src_name)
        so = os.path.join(_SRC_DIR, so_name)
        stale = os.path.exists(so) and os.path.exists(src) and (
            os.path.getmtime(src) > os.path.getmtime(so)
        )
        if not os.path.exists(so) or stale:
            if not (os.path.exists(src) and _build(src, so)):
                return None
        try:
            lib = ctypes.CDLL(so)
        except OSError:
            if not _build(src, so):
                return None
            lib = ctypes.CDLL(so)
        bind(lib)
        _CACHE[so_name] = lib
        return lib
