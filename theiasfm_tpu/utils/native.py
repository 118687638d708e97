"""ctypes bindings to the native host-ops library (C++).

Native counterparts for the host-side graph hot loops (union-find
track building, MFAS orderings, Kruskal MST) — the components that are
C++ in the reference (track_builder.cc, connected_components.h,
minimum_spanning_tree.h) and stay native here. Falls back to the numpy
implementations in math/graph.py when the library isn't built.

Build: make -C native  (done automatically on first import if g++ is
available).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _repo_root():
    return os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("THEIA_TPU_DISABLE_NATIVE"):
        return None
    so = os.path.join(_repo_root(), "native", "libhost_ops.so")
    if not os.path.exists(so):
        try:
            subprocess.run(["make", "-C",
                            os.path.join(_repo_root(), "native")],
                           check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    if not os.path.exists(so):
        return None
    lib = ctypes.CDLL(so)
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    lib.uf_connected_components.argtypes = [
        i64p, i64p, ctypes.c_int64, ctypes.c_int64, i64p]
    lib.uf_connected_components.restype = None
    lib.mfas_order.argtypes = [i64p, i64p, f64p, ctypes.c_int64,
                               ctypes.c_int64, i64p]
    lib.mfas_order.restype = None
    lib.kruskal_mst.argtypes = [i64p, i64p, f64p, ctypes.c_int64,
                                ctypes.c_int64, i64p]
    lib.kruskal_mst.restype = ctypes.c_int64

    # theia cereal-binary reader (theia_io.cc)
    u32p = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.theia_read.argtypes = [ctypes.c_char_p]
    lib.theia_read.restype = ctypes.c_void_p
    lib.theia_recon_free.argtypes = [ctypes.c_void_p]
    for fn in ("theia_num_views", "theia_num_tracks", "theia_num_obs",
               "theia_names_size"):
        getattr(lib, fn).argtypes = [ctypes.c_void_p]
        getattr(lib, fn).restype = ctypes.c_int64
    lib.theia_get_views.argtypes = [
        ctypes.c_void_p, u32p, u8p, i32p, f64p, f64p, i32p, u32p]
    lib.theia_get_names.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, i64p]
    lib.theia_get_priors.argtypes = [
        ctypes.c_void_p, i32p, i32p, u8p, f64p]
    lib.theia_get_tracks.argtypes = [
        ctypes.c_void_p, u32p, u8p, f64p, u8p]
    lib.theia_get_obs.argtypes = [ctypes.c_void_p, u32p, u32p, f64p]
    _LIB = lib
    return _LIB


def connected_components_native(num_nodes: int, edges_a, edges_b
                                ) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    a = np.ascontiguousarray(edges_a, np.int64)
    b = np.ascontiguousarray(edges_b, np.int64)
    out = np.empty(num_nodes, np.int64)
    lib.uf_connected_components(a, b, len(a), num_nodes, out)
    return out


def mfas_order_native(num_nodes: int, arcs_i, arcs_j, arc_w
                      ) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    i = np.ascontiguousarray(arcs_i, np.int64)
    j = np.ascontiguousarray(arcs_j, np.int64)
    w = np.ascontiguousarray(arc_w, np.float64)
    out = np.empty(num_nodes, np.int64)
    lib.mfas_order(i, j, w, len(i), num_nodes, out)
    return out


def kruskal_mst_native(num_nodes: int, edges, weights
                       ) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    e = np.ascontiguousarray(edges, np.int64)
    w = np.ascontiguousarray(weights, np.float64)
    out = np.empty(len(e), np.int64)
    n = lib.kruskal_mst(np.ascontiguousarray(e[:, 0]),
                        np.ascontiguousarray(e[:, 1]), w, len(e),
                        num_nodes, out)
    return out[:n]
