"""ctypes bindings for the native host-runtime core (native/femcore.cpp).

Builds libfemcore.so on first use (g++ -O3) and caches it next to the
source; every entry point has a pure-Python fallback in the library, so
the framework degrades gracefully without a toolchain.
"""
from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_SRC = Path(__file__).resolve().parent.parent.parent / "native" / "femcore.cpp"
_SO = _SRC.with_suffix(".so")
_lib = None
_tried = False


def load() -> ctypes.CDLL | None:
    """Load (building if needed) the native library, or None."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                 str(_SRC), "-o", str(_SO)],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(str(_SO))
        i32p = ctypes.POINTER(ctypes.c_int32)
        f64p = ctypes.POINTER(ctypes.c_double)
        lib.fem_adj_build.restype = ctypes.c_void_p
        lib.fem_adj_build.argtypes = [ctypes.c_int32, ctypes.c_int32, i32p]
        lib.fem_adj_free.argtypes = [ctypes.c_void_p]
        lib.fem_adj_ring_forces.argtypes = [
            ctypes.c_void_p, ctypes.c_int32, i32p, f64p, ctypes.c_int32, f64p,
        ]
        lib.fem_build_edges.restype = ctypes.c_int32
        lib.fem_build_edges.argtypes = [ctypes.c_int32, i32p, i32p, i32p]
        lib.fem_check_cells.restype = ctypes.c_int32
        lib.fem_check_cells.argtypes = [
            ctypes.c_int32, ctypes.c_int32, i32p, f64p, ctypes.c_double,
        ]
        lib.fem_components.restype = ctypes.c_int32
        lib.fem_components.argtypes = [
            ctypes.c_int32, ctypes.c_int32, i32p, i32p,
        ]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def _i32(a):
    return np.ascontiguousarray(a, np.int32).ctypes.data_as(
        ctypes.POINTER(ctypes.c_int32)
    )


def _f64(a):
    return np.ascontiguousarray(a, np.float64).ctypes.data_as(
        ctypes.POINTER(ctypes.c_double)
    )


class NativeAdjacency:
    """Node adjacency + BFS ring forces at native speed (the per-frame
    host hot path of haptics)."""

    def __init__(self, tets: np.ndarray, n_nodes: int):
        lib = load()
        if lib is None:
            raise RuntimeError("native femcore unavailable")
        self._lib = lib
        self.n_nodes = int(n_nodes)
        self._tets = np.ascontiguousarray(tets, np.int32)
        self._h = lib.fem_adj_build(
            self.n_nodes, len(self._tets), _i32(self._tets)
        )

    def ring_forces(self, contact_idx, contact_force, radius: int) -> np.ndarray:
        idx = np.ascontiguousarray(contact_idx, np.int32)
        frc = np.ascontiguousarray(contact_force, np.float64).reshape(-1, 3)
        out = np.zeros((self.n_nodes, 3), np.float64)
        self._lib.fem_adj_ring_forces(
            self._h, len(idx), _i32(idx), _f64(frc), int(radius), _f64(out)
        )
        return out

    def __del__(self):
        if getattr(self, "_h", None) and self._lib:
            self._lib.fem_adj_free(self._h)
            self._h = None


def build_edges(tets: np.ndarray):
    """(edges [E,2], cell_edges [T,6]) via native core, or None if
    unavailable."""
    lib = load()
    if lib is None:
        return None
    tets = np.ascontiguousarray(tets, np.int32)
    cap = 6 * len(tets)
    edges = np.zeros((cap, 2), np.int32)
    cell_edges = np.zeros((len(tets), 6), np.int32)
    n = lib.fem_build_edges(len(tets), _i32(tets), _i32(edges), _i32(cell_edges))
    return edges[:n].copy(), cell_edges


def check_cells(tets, pos=None, n_nodes=None, eps=1e-15):
    lib = load()
    if lib is None:
        return None
    tets = np.ascontiguousarray(tets, np.int32)
    n_nodes = int(n_nodes if n_nodes is not None else tets.max() + 1)
    if pos is not None:
        pos = np.ascontiguousarray(pos, np.float64)  # keep alive for the call
        pos_p = _f64(pos)
    else:
        pos_p = ctypes.POINTER(ctypes.c_double)()
    return int(
        lib.fem_check_cells(n_nodes, len(tets), _i32(tets), pos_p, eps)
    )


def components(tets, n_nodes=None):
    lib = load()
    if lib is None:
        return None
    tets = np.ascontiguousarray(tets, np.int32)
    n_nodes = int(n_nodes if n_nodes is not None else tets.max() + 1)
    labels = np.zeros(len(tets), np.int32)
    n = lib.fem_components(n_nodes, len(tets), _i32(tets), _i32(labels))
    return n, labels
