"""Native (C++) runtime components, loaded via ctypes.

The TPU does the tracing; the host-side runtime pieces that the reference
implements in C (scene physics stepping, tight per-frame loops) are native
here too.  Sources compile on first use with the system toolchain into a
cached shared object; everything has a pure-numpy fallback so the framework
still runs without a compiler.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sysconfig

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_BUILD = os.path.join(_DIR, "_build")
_LIB = None
_TRIED = False


def _compile() -> str:
    os.makedirs(_BUILD, exist_ok=True)
    src = os.path.join(_DIR, "physics.cc")
    out = os.path.join(_BUILD, "libndt_native.so")
    if (os.path.exists(out)
            and os.path.getmtime(out) >= os.path.getmtime(src)):
        return out
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", src, "-o", out]
    subprocess.run(cmd, check=True, capture_output=True)
    return out


def get_lib():
    """The native library, or None when unavailable."""
    global _LIB, _TRIED
    if _LIB is None and not _TRIED:
        _TRIED = True
        try:
            lib = ctypes.CDLL(_compile())
            lib.ndt_step_balls.argtypes = [
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_double),
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_double, ctypes.c_double,
            ]
            lib.ndt_step_balls.restype = None
            _LIB = lib
        except Exception:
            _LIB = None
    return _LIB


def step_balls(pos: np.ndarray, vel: np.ndarray, radius: np.ndarray,
               mass: np.ndarray, substeps: int, scale: float,
               box: float) -> bool:
    """In-place native physics step; returns False if the native library is
    unavailable (caller falls back to numpy)."""
    lib = get_lib()
    if lib is None:
        return False
    n, dim = pos.shape
    assert dim <= 16, "native stepper supports dim <= 16"
    for a in (pos, vel):
        assert a.dtype == np.float64 and a.flags.c_contiguous
    p = pos.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
    v = vel.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
    r = np.ascontiguousarray(radius, np.float64)
    m = np.ascontiguousarray(mass, np.float64)
    lib.ndt_step_balls(
        p, v, r.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        n, dim, substeps, scale, box)
    return True
