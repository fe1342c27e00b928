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
    srcs = sorted(
        os.path.join(_DIR, f) for f in os.listdir(_DIR) if f.endswith(".cc"))
    out = os.path.join(_BUILD, "libndt_native.so")
    if (os.path.exists(out)
            and all(os.path.getmtime(out) >= os.path.getmtime(s)
                    for s in srcs)):
        return out
    cmd = (["g++", "-O3", "-march=native", "-shared", "-fPIC", "-pthread"]
           + srcs + ["-o", out])
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
            lib.ndt_kd_cells.argtypes = [
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_double),
                ctypes.c_int64, ctypes.c_int64, ctypes.c_double,
                ctypes.POINTER(ctypes.POINTER(ctypes.c_double)),
                ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
            ]
            lib.ndt_kd_cells.restype = ctypes.c_int64
            lib.ndt_kd_cells_budget.argtypes = [
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_double),
                ctypes.c_int64, ctypes.c_int64, ctypes.c_double,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_double, ctypes.c_double,
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.POINTER(ctypes.c_double)),
                ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
            ]
            lib.ndt_kd_cells_budget.restype = ctypes.c_int64
            lib.ndt_kd_cells_free.argtypes = [
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_int32),
            ]
            lib.ndt_kd_cells_free.restype = None
            lib.ndt_optimal_sphere.argtypes = [
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_double),
                ctypes.c_int64, ctypes.c_int64, ctypes.c_double,
                ctypes.POINTER(ctypes.c_double),
            ]
            lib.ndt_optimal_sphere.restype = ctypes.c_double
            lib.ndt_optimal_spheres.argtypes = [
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int64, ctypes.c_int64, ctypes.c_double,
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_double),
            ]
            lib.ndt_optimal_spheres.restype = None
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


def kd_cells(lowers: np.ndarray, uppers: np.ndarray, eps: float):
    """Native kd leaf-cell build (kdsplit.cc): returns (boxes [count, d, 2]
    f64, items [count] i32) or None when the native library is unavailable
    (caller falls back to the Python implementation in utils/kdtree.py)."""
    lib = get_lib()
    if lib is None:
        return None
    lo = np.ascontiguousarray(lowers, np.float64)
    hi = np.ascontiguousarray(uppers, np.float64)
    n, d = lo.shape
    pb = ctypes.POINTER(ctypes.c_double)()
    pi = ctypes.POINTER(ctypes.c_int32)()
    count = lib.ndt_kd_cells(
        lo.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        hi.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        n, d, eps, ctypes.byref(pb), ctypes.byref(pi))
    try:
        if count == 0:
            return (np.zeros((0, d, 2), np.float64),
                    np.zeros((0,), np.int32))
        boxes = np.ctypeslib.as_array(pb, shape=(count, d, 2)).copy()
        items = np.ctypeslib.as_array(pi, shape=(count,)).copy()
    finally:
        lib.ndt_kd_cells_free(pb, pi)
    return boxes, items


def kd_cells_budget(lowers: np.ndarray, uppers: np.ndarray, eps: float,
                    max_boxes: int, node_budget: int, max_depth: int,
                    clip_pad: float = -1.0, clip_rel: float = 0.0):
    """Bounded kd leaf-cell build (kdsplit.cc ndt_kd_cells_budget): the
    reference's exact recursion, but stopping past ``node_budget`` split
    calls / ``max_depth`` levels (unsplit regions become cells) and
    merging each item's cells online into <= ``max_boxes`` boxes — both
    conservative SUPERSETS of the exact per-item leaf-cell union, so the
    gate still admits everything the C's traversal reaches.  With
    ``clip_pad`` >= 0 every emitted cell is first intersected with the
    item's AABB padded by clip_pad + clip_rel*|coord| per dim — sound
    whenever the pad covers the family evals' acceptance shell, and it
    keeps truncated near-root regions from washing the gate out.
    Returns (boxes [count, d, 2] f64, items [count] i32, truncated bool)
    or None when the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    lo = np.ascontiguousarray(lowers, np.float64)
    hi = np.ascontiguousarray(uppers, np.float64)
    n, d = lo.shape
    pb = ctypes.POINTER(ctypes.c_double)()
    pi = ctypes.POINTER(ctypes.c_int32)()
    trunc = ctypes.c_int32(0)
    count = lib.ndt_kd_cells_budget(
        lo.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        hi.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        n, d, eps, max_boxes, node_budget, max_depth, clip_pad, clip_rel,
        ctypes.byref(trunc), ctypes.byref(pb), ctypes.byref(pi))
    try:
        if count == 0:
            return (np.zeros((0, d, 2), np.float64),
                    np.zeros((0,), np.int32), bool(trunc.value))
        boxes = np.ctypeslib.as_array(pb, shape=(count, d, 2)).copy()
        items = np.ctypeslib.as_array(pi, shape=(count,)).copy()
    finally:
        lib.ndt_kd_cells_free(pb, pi)
    return boxes, items, bool(trunc.value)


def optimal_sphere(pts: np.ndarray, radii: np.ndarray, eps: float):
    """Native minimal-bounding-sphere fit (bounding.cc): returns
    (center [d], radius) or None when the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    p = np.ascontiguousarray(pts, np.float64)
    r = np.ascontiguousarray(radii, np.float64)
    n, d = p.shape
    out = np.empty(d, np.float64)
    radius = lib.ndt_optimal_sphere(
        p.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        r.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        n, d, eps, out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return out, float(radius)


def optimal_spheres(pts: np.ndarray, radii: np.ndarray,
                    offsets: np.ndarray, eps: float):
    """Batched minimal-bounding-sphere fits, threaded in C++ (one fit per
    offset span).  pts [sum_n, d], radii [sum_n], offsets [m + 1] i64.
    Returns (centers [m, d], radii_out [m]) or None when unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    p = np.ascontiguousarray(pts, np.float64)
    r = np.ascontiguousarray(radii, np.float64)
    off = np.ascontiguousarray(offsets, np.int64)
    m = len(off) - 1
    d = p.shape[1]
    centers = np.empty((m, d), np.float64)
    out_r = np.empty(m, np.float64)
    lib.ndt_optimal_spheres(
        p.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        r.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        off.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        m, d, eps,
        centers.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        out_r.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return centers, out_r
