"""ctypes bindings for the native data-prep kernels (csrc/tgt_native.cpp).

Auto-builds the shared library on first import if a compiler is available;
importers fall back to the numpy implementations when unavailable
(tgt_tpu/data/structural.py gates on this module loading).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "libtgt_native.so")
_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc",
                    "tgt_native.cpp")


def _build() -> bool:
    if not os.path.exists(_SRC):
        return False
    try:
        subprocess.run(["g++", "-O3", "-march=native", "-shared", "-fPIC",
                        "-o", _LIB_PATH, _SRC], check=True,
                       capture_output=True, timeout=120)
        return True
    except Exception:
        return False


if not os.path.exists(_LIB_PATH) or (
        os.path.exists(_SRC)
        and os.path.getmtime(_SRC) > os.path.getmtime(_LIB_PATH)):
    if not _build():
        raise ImportError("native library unavailable and build failed")

_lib = ctypes.CDLL(_LIB_PATH)

_i16p = np.ctypeslib.ndpointer(np.int16, flags="C_CONTIGUOUS")
_i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
_u8p = ctypes.POINTER(ctypes.c_uint8)

_lib.floyd_warshall.argtypes = [_i16p, _i16p, ctypes.c_int]
_lib.preprocess_graph.argtypes = [
    ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    _i64p, _i16p, _i16p, _i16p, _i16p, _i16p]
_lib.pack_bins_multi.argtypes = [_u8p, _u8p, ctypes.c_int, ctypes.c_int,
                                 ctypes.c_int]
_lib.unpack_bins_multi.argtypes = [_u8p, _u8p, ctypes.c_int, ctypes.c_int,
                                   ctypes.c_int]
_lib.stack_with_pad.argtypes = [
    ctypes.POINTER(ctypes.c_char_p), _i64p, ctypes.c_int, ctypes.c_int,
    _i64p, _u8p, ctypes.c_int]


def floyd_warshall(adj: np.ndarray) -> np.ndarray:
    adj = np.ascontiguousarray(adj, np.int16)
    n = adj.shape[0]
    out = np.empty((n, n), np.int16)
    _lib.floyd_warshall(adj, out, n)
    return out


def preprocess_graph(num_nodes: int, edges: np.ndarray,
                     node_feats: np.ndarray, edge_feats: np.ndarray
                     ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    edges = np.ascontiguousarray(edges, np.int64).reshape(-1, 2)
    node_feats = np.ascontiguousarray(node_feats, np.int16)
    edge_feats = np.ascontiguousarray(edge_feats, np.int16)
    fn = node_feats.shape[-1]
    fe = edge_feats.shape[-1]
    m = edges.shape[0]
    node_out = np.empty((num_nodes, fn), np.int16)
    dist = np.empty((num_nodes, num_nodes), np.int16)
    featm = np.empty((num_nodes, num_nodes, fe), np.int16)
    _lib.preprocess_graph(num_nodes, fn, fe, m, edges, node_feats, node_out,
                          edge_feats, dist, featm)
    return node_out, dist, featm


def _u8view(a: np.ndarray):
    return a.ctypes.data_as(_u8p)


def pack_bins_multi(bins: np.ndarray) -> np.ndarray:
    bins = np.ascontiguousarray(bins)
    s, n, _ = bins.shape
    out = np.empty((s, n * (n - 1) // 2), bins.dtype)
    _lib.pack_bins_multi(_u8view(bins), _u8view(out), s, n,
                         bins.dtype.itemsize)
    return out


def unpack_bins_multi(packed: np.ndarray, num_nodes: int) -> np.ndarray:
    packed = np.ascontiguousarray(packed)
    s = packed.shape[0]
    out = np.empty((s, num_nodes, num_nodes), packed.dtype)
    _lib.unpack_bins_multi(_u8view(packed), _u8view(out), s, num_nodes,
                           packed.dtype.itemsize)
    return out


def stack_with_pad(arrays: List[np.ndarray],
                   pad_to: Optional[dict] = None) -> np.ndarray:
    """Native ragged stack (ranks 1-4). Same semantics as
    data/collate.stack_with_pad."""
    rank = arrays[0].ndim
    if rank == 0 or rank > 4:
        raise ValueError("native stack supports ranks 1-4")
    arrays = [np.ascontiguousarray(a) for a in arrays]
    # left-pad shapes to rank 4 so the innermost dim stays a memcpy row
    pad = 4 - rank
    shapes = np.asarray([(1,) * pad + a.shape for a in arrays], np.int64)
    maxs = shapes.max(axis=0)
    if pad_to:
        for d, size in pad_to.items():
            maxs[d + pad] = max(maxs[d + pad], size)
    out = np.zeros((len(arrays), *maxs), arrays[0].dtype)
    ptrs = (ctypes.c_char_p * len(arrays))(
        *[a.ctypes.data_as(ctypes.c_char_p) for a in arrays])
    _lib.stack_with_pad(ptrs, np.ascontiguousarray(shapes), len(arrays), 4,
                        np.ascontiguousarray(maxs, np.int64), _u8view(out),
                        arrays[0].dtype.itemsize)
    return out.reshape((len(arrays),) + tuple(maxs[pad:]))
