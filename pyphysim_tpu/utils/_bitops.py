"""ctypes loader for the native popcount library (csrc/bitops.c).

Compiles the shared object on first use (cc is baked into the image) and
caches it next to the source. Falls back with ImportError if no compiler
is available — callers treat this module as optional.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_LOCK = threading.Lock()
_LIB = None

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "csrc", "bitops.c")
_SO = os.path.join(os.path.dirname(_SRC), "_bitops.so")


def _load():
    global _LIB
    with _LOCK:
        if _LIB is not None:
            return _LIB
        if not os.path.exists(_SO) or (
                os.path.exists(_SRC)
                and os.path.getmtime(_SRC) > os.path.getmtime(_SO)):
            cc = os.environ.get("CC", "cc")
            subprocess.run(
                [cc, "-O3", "-shared", "-fPIC", "-o", _SO, _SRC],
                check=True, capture_output=True)
        lib = ctypes.CDLL(_SO)
        lib.popcount_u64.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_size_t]
        lib.popcount_u64.restype = None
        lib.count_bit_errors_u64.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_size_t]
        lib.count_bit_errors_u64.restype = ctypes.c_int64
        _LIB = lib
        return lib


def popcount(arr: np.ndarray) -> np.ndarray:
    """Elementwise popcount of a non-negative integer numpy array."""
    lib = _load()
    a = np.ascontiguousarray(arr, dtype=np.uint64)
    out = np.empty(a.shape, dtype=np.int64)
    lib.popcount_u64(a.ctypes.data, out.ctypes.data, a.size)
    return out


def count_bit_errors(a: np.ndarray, b: np.ndarray) -> int:
    """Fused popcount(a ^ b) reduction."""
    lib = _load()
    aa = np.ascontiguousarray(a, dtype=np.uint64)
    bb = np.ascontiguousarray(np.broadcast_to(b, aa.shape), dtype=np.uint64)
    return int(lib.count_bit_errors_u64(aa.ctypes.data, bb.ctypes.data,
                                        aa.size))
