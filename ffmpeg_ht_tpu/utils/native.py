"""ctypes loader for the native host-runtime library (native/htprep.c).

The native tier accelerates the byte/bit-serial host stages that feed the
device pipeline (the analog of the reference's C runtime around its SIMD
kernels). Built with native/build.sh; when the shared library is absent
the callers fall back to the vectorized-numpy implementations, so the
package works everywhere and goes faster where a C compiler ran.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False


def _root() -> str:
    return os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))


def load():
    """Load (building on first use if possible) the native library."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    so = os.path.join(_root(), "native", "libffhtnative.so")
    if not os.path.exists(so):
        script = os.path.join(_root(), "native", "build.sh")
        try:
            subprocess.run(["sh", script], check=True, capture_output=True,
                           timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    lib.ht_prepare_streams.restype = ctypes.c_int
    lib.ht_prepare_streams.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_int64, ctypes.c_void_p,
    ]
    _LIB = lib
    return _LIB


def ht_prepare_streams(data: np.ndarray, lcup: np.ndarray,
                       pcup: np.ndarray):
    """Native stream prep; returns (msw, melw, vlcw) or None if no lib."""
    lib = load()
    if lib is None:
        return None
    data = np.ascontiguousarray(data, np.uint8)
    n, l = data.shape
    lcup = np.ascontiguousarray(lcup, np.int64)
    pcup = np.ascontiguousarray(pcup, np.int64)
    w_cap = (8 * l + 64) // 32 + 3
    msw = np.zeros((n, w_cap), np.uint32)
    melw = np.zeros((n, w_cap), np.uint32)
    vlcw = np.zeros((n, w_cap), np.uint32)
    maxw = np.zeros(1, np.int64)
    rc = lib.ht_prepare_streams(
        data.ctypes.data, n, l, lcup.ctypes.data, pcup.ctypes.data,
        msw.ctypes.data, melw.ctypes.data, vlcw.ctypes.data,
        w_cap, maxw.ctypes.data)
    if rc != 0:
        return None
    # per-stream pow2 widths (matches ht_batch._trim_pow2)
    from ffmpeg_ht_tpu.ops.ht_batch import _trim_pow2
    return (_trim_pow2(msw), _trim_pow2(melw), _trim_pow2(vlcw))
