"""On-demand build + ctypes bindings for the native cache-I/O hot paths.

The C++ sources live in native/ (see native/cacheio.cpp for rationale).
Compiled once into native/_cacheio.so with the system compiler; if no
compiler is available the callers fall back to the pure-Python loop.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

from novic_tpu.utils.logger import log

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _native_dir() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "native")


def _build() -> Optional[str]:
    src = os.path.join(_native_dir(), "cacheio.cpp")
    if not os.path.isfile(src):
        return None
    # Key the artifact on the source content hash: a stale or foreign .so can
    # never shadow the reviewed C++ source (mtime comparisons always favored
    # a pre-existing binary on a fresh clone).
    import hashlib

    with open(src, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:12]
    out = os.path.join(_native_dir(), f"_cacheio-{digest}.so")
    if os.path.isfile(out):
        return out
    for cc in ("g++", "c++", "clang++"):
        try:
            subprocess.run([cc, "-O2", "-shared", "-fPIC", "-o", out, src],
                           check=True, capture_output=True, timeout=120)
            log.info(f"Built native cache I/O library with {cc}: {out}")
            return out
        except (FileNotFoundError, subprocess.CalledProcessError, subprocess.TimeoutExpired) as e:
            log.warning(f"Native build with {cc} failed: {e}")
    return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        path = _build()
        if path is None:
            log.warning("Native cache I/O unavailable => falling back to Python loops")
            return None
        lib = ctypes.CDLL(path)
        lib.novic_scatter_pwrite.restype = ctypes.c_longlong
        lib.novic_scatter_pwrite.argtypes = [
            ctypes.c_int, ctypes.c_char_p, ctypes.c_longlong, ctypes.c_longlong,
            ctypes.c_longlong, ctypes.POINTER(ctypes.c_longlong)]
        lib.novic_gather_rows.restype = None
        lib.novic_gather_rows.argtypes = [
            ctypes.c_char_p, ctypes.c_longlong, ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_longlong), ctypes.c_longlong, ctypes.c_char_p]
        _lib = lib
        return _lib


def scatter_pwrite(fd: int, data: bytes, stride: int, section_offset: int,
                   indices: np.ndarray) -> Optional[int]:
    """Native scatter-write; returns bytes written or None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    idx = np.ascontiguousarray(indices, dtype=np.int64)
    n = len(idx)
    written = lib.novic_scatter_pwrite(
        fd, data, n, stride, section_offset,
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)))
    if written < 0:
        raise OSError("native scatter_pwrite failed")
    return int(written)
