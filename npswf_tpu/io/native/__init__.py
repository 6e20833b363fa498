"""Native (C++) host-runtime library: build-on-demand loader.

The shared library is compiled once from decode.cpp with g++ and cached next
to the source; loading falls back gracefully (callers use the numpy path) if
no compiler is available.
"""
from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Optional

log = logging.getLogger("npswf.native")

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "decode.cpp")
_LIB = os.path.join(_HERE, "libnpswf_host.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           "-o", _LIB, _SRC, "-lpthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception as exc:  # pragma: no cover - depends on toolchain
        log.warning("native build failed (%s); using numpy fallback", exc)
        return False


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native host library, or None."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) or \
                os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError as exc:  # pragma: no cover
            log.warning("native load failed (%s); using numpy fallback", exc)
            return None
        i64p = ctypes.POINTER(ctypes.c_int64)
        f64p = ctypes.POINTER(ctypes.c_double)
        f32p = ctypes.POINTER(ctypes.c_float)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i32p = ctypes.POINTER(ctypes.c_int32)
        lib.decode_batch.restype = ctypes.c_int
        lib.decode_batch.argtypes = [
            f64p, i64p, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int64,
            f32p, u8p, f32p, i32p, ctypes.c_int]
        lib.flatten_pulses.restype = None
        lib.flatten_pulses.argtypes = [
            i32p, f64p, f64p, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
            f64p, f64p, i64p]
        _lib = lib
        return _lib
