"""ctypes binding for the native octree-core runtime (native/octree_core.cpp).

The reference's octree + scheduler bookkeeping is C++ (doctree.h,
CellProcessor.cpp); this loads the equivalent native hot path for the linear
Morton octree. Every entry point has a numpy fallback in core/octree.py, so
the library is an accelerator, not a hard dependency. Build with
`bash native/build.sh`.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
_u64p = np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS")
_f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "native",
        "libhpmvs_octree.so")
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None

    lib.morton_encode.argtypes = [ctypes.c_int64, _i64p, _i64p, _i64p, _u64p]
    lib.morton_decode.argtypes = [ctypes.c_int64, _u64p, _i64p, _i64p, _i64p]
    lib.keys_at_level.argtypes = [ctypes.c_int64, _f64p, ctypes.c_double,
                                  ctypes.c_double, ctypes.c_double,
                                  ctypes.c_double, ctypes.c_int64, _u64p]
    lib.structure_level.argtypes = [ctypes.c_int64, _u64p, ctypes.c_int64,
                                    _u64p, _i64p, _i64p]
    lib.containing_cell.argtypes = [ctypes.c_int64, _u64p, ctypes.c_int64,
                                    _u64p, _i64p, _i64p, _i64p]
    try:
        lib.structure_level_sorted.argtypes = lib.structure_level.argtypes
        lib.containing_cell_sorted.argtypes = lib.containing_cell.argtypes
    except AttributeError:  # pragma: no cover - stale .so without the merge path
        lib.structure_level_sorted = None
        lib.containing_cell_sorted = None
    lib.lookup_cells.argtypes = [ctypes.c_int64, _i64p, _u64p,
                                 ctypes.c_int64, _u64p, _i64p, _i64p, _i64p]
    lib.seed_pushdown.argtypes = [ctypes.c_int64, _f64p, ctypes.c_double,
                                  ctypes.c_double, ctypes.c_double,
                                  ctypes.c_double, ctypes.c_int64, _i64p,
                                  _u64p]
    lib.seed_pushdown.restype = ctypes.c_int64
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def morton_encode(ix, iy, iz):
    lib = _load()
    n = len(ix)
    out = np.empty(n, np.uint64)
    lib.morton_encode(n, np.ascontiguousarray(ix, np.int64),
                      np.ascontiguousarray(iy, np.int64),
                      np.ascontiguousarray(iz, np.int64), out)
    return out


def keys_at_level(pts, center, width, level):
    lib = _load()
    n = pts.shape[0]
    out = np.empty(n, np.uint64)
    lib.keys_at_level(n, np.ascontiguousarray(pts, np.float64),
                      float(center[0]), float(center[1]), float(center[2]),
                      float(width), int(level), out)
    return out


# above this many queries, one argsort + two-pointer level sweeps beat
# per-query binary searches (~5x at 1M queries; crossover measured ~4k)
_SORT_THRESHOLD = 4096


def structure_level(qkeys_max, max_level, anc_flat, anc_off):
    lib = _load()
    n = len(qkeys_max)
    q = np.ascontiguousarray(qkeys_max, np.uint64)
    out = np.empty(n, np.int64)
    if n >= _SORT_THRESHOLD and lib.structure_level_sorted is not None:
        order = np.argsort(q)
        lib.structure_level_sorted(n, np.ascontiguousarray(q[order]),
                                   int(max_level),
                                   np.ascontiguousarray(anc_flat, np.uint64),
                                   np.ascontiguousarray(anc_off, np.int64),
                                   out)
        inv = np.empty(n, np.int64)
        inv[order] = out
        return inv
    lib.structure_level(n, q, int(max_level),
                        np.ascontiguousarray(anc_flat, np.uint64),
                        np.ascontiguousarray(anc_off, np.int64), out)
    return out


def containing_cell(qkeys_max, max_level, occ_flat, occ_off, occ_cid):
    lib = _load()
    n = len(qkeys_max)
    q = np.ascontiguousarray(qkeys_max, np.uint64)
    out = np.empty(n, np.int64)
    if n >= _SORT_THRESHOLD and lib.containing_cell_sorted is not None:
        order = np.argsort(q)
        lib.containing_cell_sorted(n, np.ascontiguousarray(q[order]),
                                   int(max_level),
                                   np.ascontiguousarray(occ_flat, np.uint64),
                                   np.ascontiguousarray(occ_off, np.int64),
                                   np.ascontiguousarray(occ_cid, np.int64),
                                   out)
        inv = np.empty(n, np.int64)
        inv[order] = out
        return inv
    lib.containing_cell(n, q, int(max_level),
                        np.ascontiguousarray(occ_flat, np.uint64),
                        np.ascontiguousarray(occ_off, np.int64),
                        np.ascontiguousarray(occ_cid, np.int64), out)
    return out


def lookup_cells(qlevels, qkeys, max_level, occ_flat, occ_off, occ_cid):
    lib = _load()
    n = len(qkeys)
    out = np.empty(n, np.int64)
    lib.lookup_cells(n, np.ascontiguousarray(qlevels, np.int64),
                     np.ascontiguousarray(qkeys, np.uint64), int(max_level),
                     np.ascontiguousarray(occ_flat, np.uint64),
                     np.ascontiguousarray(occ_off, np.int64),
                     np.ascontiguousarray(occ_cid, np.int64), out)
    return out


def seed_pushdown(pts, center, width, max_level, levels):
    lib = _load()
    n = pts.shape[0]
    io_levels = np.ascontiguousarray(levels, np.int64).copy()
    out_keys = np.empty(n, np.uint64)
    lib.seed_pushdown(n, np.ascontiguousarray(pts, np.float64),
                      float(center[0]), float(center[1]), float(center[2]),
                      float(width), int(max_level), io_levels, out_keys)
    return io_levels, out_keys
