"""ctypes loader for the native host data-plane (native/rstpu_io.cpp).

Compiles the shared library on first use (cached next to the source) and
degrades to pure-Python when no compiler is available. Used by the passage
store for offset scanning and batched hit fetches.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import List, Optional, Sequence, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _native_dir() -> str:
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native"
    )


def _build_library(src: str, out: str) -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", out, src, "-lpthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (OSError, subprocess.SubprocessError) as e:
        logger.warning("native build failed (%s); using Python fallback", e)
        return False


def get_library() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        src = os.path.join(_native_dir(), "rstpu_io.cpp")
        so = os.path.join(_native_dir(), "librstpu_io.so")
        if not os.path.exists(src):
            return None
        if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
            if not _build_library(src, so):
                return None
        try:
            lib = ctypes.CDLL(so)
        except OSError as e:
            logger.warning("failed to load %s: %s", so, e)
            return None
        lib.rstpu_scan_offsets.restype = ctypes.c_int64
        lib.rstpu_scan_offsets.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.POINTER(ctypes.c_int64))]
        lib.rstpu_free.argtypes = [ctypes.c_void_p]
        lib.rstpu_pread_many.restype = ctypes.c_int
        lib.rstpu_pread_many.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.c_int,
        ]
        lib.rstpu_file_size.restype = ctypes.c_int64
        lib.rstpu_file_size.argtypes = [ctypes.c_char_p]
        _LIB = lib
        return _LIB


def scan_offsets_native(path: str) -> Optional[np.ndarray]:
    lib = get_library()
    if lib is None:
        return None
    out = ctypes.POINTER(ctypes.c_int64)()
    n = lib.rstpu_scan_offsets(path.encode(), ctypes.byref(out))
    if n < 0:
        return None
    try:
        arr = np.ctypeslib.as_array(out, shape=(n,)).copy()
    finally:
        lib.rstpu_free(out)
    return arr


def pread_lines_native(
    path: str,
    spans: Sequence[Tuple[int, int]],  # (start, length) per record
    threads: int = 16,
) -> Optional[List[bytes]]:
    """Read many byte spans from one file with threaded preads."""
    lib = get_library()
    if lib is None or not spans:
        return None
    n = len(spans)
    starts = np.asarray([s for s, _ in spans], np.int64)
    lens = np.asarray([l for _, l in spans], np.int64)
    out_offsets = np.zeros(n, np.int64)
    np.cumsum(lens[:-1], out=out_offsets[1:])
    total = int(lens.sum())
    buf = ctypes.create_string_buffer(total)
    rc = lib.rstpu_pread_many(
        path.encode(),
        starts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        out_offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        buf,
        n,
        threads,
    )
    if rc != 0:
        return None
    raw = buf.raw
    return [raw[int(o) : int(o + l)] for o, l in zip(out_offsets, lens)]


def file_size_native(path: str) -> Optional[int]:
    lib = get_library()
    if lib is None:
        return None
    size = lib.rstpu_file_size(path.encode())
    return None if size < 0 else int(size)
