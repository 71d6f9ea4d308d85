"""Native host-side graph core (C++ via ctypes) with transparent fallback.

The shared library is compiled lazily on first use (g++ -O3, cached next to
the source); every entry point has a pure-numpy fallback, so the framework
works identically where no toolchain exists. ``GN_ODE_SIR_NO_NATIVE=1``
forces the fallback (used by tests to compare both paths).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "graphcore.cc")
_LIB = os.path.join(_HERE, "libgraphcore.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", _LIB, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load():
    global _lib, _tried
    # checked per call (not just at first load) so tests and users can flip
    # to the numpy fallback at any point in a process's life
    if os.environ.get("GN_ODE_SIR_NO_NATIVE"):
        return None
    if _lib is not None or _tried:
        return _lib
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
        i32p = ctypes.POINTER(ctypes.c_int32)
        i64p = ctypes.POINTER(ctypes.c_int64)
        i64 = ctypes.c_int64
        lib.gc_coalesce_undirected.restype = i64
        lib.gc_coalesce_undirected.argtypes = [i32p, i64, i64, i32p, i32p]
        lib.gc_csr_offsets.restype = i64
        lib.gc_csr_offsets.argtypes = [i32p, i64, i64, i64p]
        lib.gc_reverse_edge_index.restype = i64
        lib.gc_reverse_edge_index.argtypes = [i32p, i32p, i64, i64, i32p]
        lib.gc_degrees.restype = i64
        lib.gc_degrees.argtypes = [i32p, i64, i64, i32p]
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.gc_spmm_chunk_count.restype = i64
        lib.gc_spmm_chunk_count.argtypes = [i32p, i64, i64, i64]
        lib.gc_spmm_plan_fill.restype = i64
        lib.gc_spmm_plan_fill.argtypes = [
            i32p, i32p, f32p, i64, i64, i64, i32p, i32p, i32p, f32p,
        ]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


def _as_i32(a):
    return np.ascontiguousarray(a, dtype=np.int32)


def _ptr32(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _ptr64(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def coalesce_undirected(pairs: np.ndarray, n_nodes: int):
    """Raw (u, v) int pairs [m, 2] -> deduplicated symmetric COO sorted by
    (dst, src). Returns (src, dst) int32 arrays. None -> use caller fallback."""
    lib = _load()
    if lib is None:
        return None
    pairs = _as_i32(pairs).reshape(-1, 2)
    m = pairs.shape[0]
    out_src = np.empty(2 * max(m, 1), np.int32)
    out_dst = np.empty(2 * max(m, 1), np.int32)
    e = lib.gc_coalesce_undirected(
        _ptr32(np.ascontiguousarray(pairs)), m, n_nodes, _ptr32(out_src), _ptr32(out_dst)
    )
    if e < 0:
        return None
    return out_src[:e].copy(), out_dst[:e].copy()


def csr_offsets(dst: np.ndarray, n_nodes: int):
    lib = _load()
    if lib is None:
        return None
    dst = _as_i32(dst)
    offsets = np.empty(n_nodes + 1, np.int64)
    if lib.gc_csr_offsets(_ptr32(dst), dst.shape[0], n_nodes, _ptr64(offsets)) != 0:
        return None
    return offsets


def reverse_edge_index(src: np.ndarray, dst: np.ndarray, n_nodes: int):
    lib = _load()
    if lib is None:
        return None
    src, dst = _as_i32(src), _as_i32(dst)
    cave = np.empty(src.shape[0], np.int32)
    if lib.gc_reverse_edge_index(
        _ptr32(src), _ptr32(dst), src.shape[0], n_nodes, _ptr32(cave)
    ) != 0:
        return None
    return cave


def spmm_plan(src: np.ndarray, dst: np.ndarray, w, k_edges: int, r_rows: int):
    """Greedy (<=K edges, <R rows) chunk plan over a dst-sorted edge list —
    the host 'compile' step of the Pallas SpMM v2 kernel. Returns
    (src_padded [C*K] i32, dst_local [C, K] i32 with sentinel R padding,
    row_base [C] i32, w_padded [C*K] f32 or None); None -> caller fallback."""
    lib = _load()
    if lib is None:
        return None
    src, dst = _as_i32(src), _as_i32(dst)
    e = src.shape[0]
    c = lib.gc_spmm_chunk_count(_ptr32(dst), e, k_edges, r_rows)
    if c < 0:
        return None
    c = max(int(c), 0)
    src_p = np.empty(c * k_edges, np.int32)
    dloc = np.empty((c, k_edges), np.int32)
    base = np.empty(max(c, 1), np.int32)
    if w is None:
        w_arr, w_out, w_ptr = None, None, ctypes.POINTER(ctypes.c_float)()
    else:
        w_arr = np.ascontiguousarray(w, np.float32)
        w_out = np.empty(c * k_edges, np.float32)
        w_ptr = w_out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    w_in = (w_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
            if w_arr is not None else ctypes.POINTER(ctypes.c_float)())
    got = lib.gc_spmm_plan_fill(
        _ptr32(src), _ptr32(dst), w_in, e, k_edges, r_rows,
        _ptr32(src_p), _ptr32(dloc.reshape(-1)), _ptr32(base), w_ptr,
    )
    if got != c:
        return None
    return src_p, dloc, base[:c], w_out


def degrees(dst: np.ndarray, n_nodes: int):
    lib = _load()
    if lib is None:
        return None
    dst = _as_i32(dst)
    deg = np.empty(n_nodes, np.int32)
    if lib.gc_degrees(_ptr32(dst), dst.shape[0], n_nodes, _ptr32(deg)) != 0:
        return None
    return deg
