"""ctypes loader for the fastgeo native library (with on-demand build).

Mirrors the reference's native substrate (HDK's GEO_PointTree / GQ_Detail,
capture.cpp:15-24) for the host-side irregular work.  The library is built
lazily with g++ on first import and cached next to the source; every entry
point has a pure-numpy/scipy fallback, so the framework works without a
toolchain — the native path is a host-performance optimization, not a
correctness dependency.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "fastgeo.cpp")
_LIB = os.path.join(_DIR, "libfastgeo.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        _SRC, "-o", _LIB,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError):
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded library, building it if needed; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        lib.fd_bfs_rings.argtypes = [
            i64p, i32p, ctypes.c_int64, i64p, ctypes.c_int64,
            ctypes.c_int64, u8p,
        ]
        lib.fd_bfs_rings.restype = None
        lib.fd_nearest.argtypes = [
            f32p, ctypes.c_int64, f32p, ctypes.c_int64, i64p,
            ctypes.c_void_p,
        ]
        lib.fd_nearest.restype = None
        lib.fd_build_adjacency.argtypes = [
            i32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
        ]
        lib.fd_build_adjacency.restype = ctypes.c_int64
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


# ------------------------------------------------------------------ wrappers
def bfs_rings(
    indptr: np.ndarray, indices: np.ndarray, seeds: np.ndarray, max_edges: int
) -> Optional[np.ndarray]:
    """Native multi-source BFS; returns (V,) bool mask or None if no lib."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(indptr) - 1
    out = np.zeros(n, np.uint8)
    lib.fd_bfs_rings(
        np.ascontiguousarray(indptr, np.int64),
        np.ascontiguousarray(indices, np.int32),
        n,
        np.ascontiguousarray(seeds, np.int64),
        len(seeds),
        int(max_edges),
        out,
    )
    return out.astype(bool)


def nearest(points: np.ndarray, queries: np.ndarray) -> Optional[np.ndarray]:
    """Native KD-tree nearest-point indices; (M,) int64 or None if no lib."""
    lib = get_lib()
    if lib is None:
        return None
    points = np.ascontiguousarray(points, np.float32)
    queries = np.ascontiguousarray(np.atleast_2d(queries), np.float32)
    out = np.zeros(len(queries), np.int64)
    lib.fd_nearest(points, len(points), queries, len(queries), out, None)
    return out


def build_adjacency(
    faces: np.ndarray, n_points: int
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Native CSR adjacency from faces; (indptr, indices) or None if no lib."""
    lib = get_lib()
    if lib is None:
        return None
    faces = np.ascontiguousarray(faces, np.int32)
    n_faces, arity = faces.shape
    total = lib.fd_build_adjacency(faces, n_faces, arity, n_points, None, None, 0)
    indptr = np.zeros(n_points + 1, np.int64)
    indices = np.zeros(max(int(total), 1), np.int32)
    lib.fd_build_adjacency(
        faces, n_faces, arity, n_points,
        indptr.ctypes.data_as(ctypes.c_void_p),
        indices.ctypes.data_as(ctypes.c_void_p),
        total,
    )
    return indptr, indices[:total]
