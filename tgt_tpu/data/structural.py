"""Structural preprocessing: hop-distance matrix + dense feature scatter.

Capability-parity with the reference's numba kernels
(lib/data/pcqm/structural_transform.py:8-75):
- ``floyd_warshall``: all-pairs hop distance over the molecular graph,
  unreachable pairs = 510, diagonal = 0 (int16).
- ``preprocess_graph``: offset-encodes node/edge features
  (feat + 1 + k*OFFSET, 0 reserved for padding) and scatters edge features
  into dense (N, N) matrices.

Implementation is vectorized numpy (the k-loop of Floyd-Warshall with a
rank-1 broadcast min-plus update — O(N^3) but BLAS-speed, no JIT warmup).
An optional C++ kernel (csrc/) accelerates batch preprocessing for
pod-scale input pipelines; `use_native=True` uses it when built.
"""
from __future__ import annotations

from typing import Dict

import numpy as np

NODE_FEATURES_OFFSET = 128
EDGE_FEATURES_OFFSET = 8
UNREACHABLE = 510

_native = None


def _load_native():
    global _native
    if _native is None:
        try:
            from tgt_tpu.data import _native as native_mod
            _native = native_mod
        except Exception:
            _native = False
    return _native


def floyd_warshall(adj: np.ndarray) -> np.ndarray:
    """All-pairs shortest hop counts; unreachable = 510 (int16).

    Matches reference semantics (structural_transform.py:8-28).
    """
    n = adj.shape[0]
    d = np.where(adj != 0, 1, UNREACHABLE).astype(np.int16)
    np.fill_diagonal(d, 0)
    for k in range(n):
        np.minimum(d, d[:, k:k + 1] + d[k:k + 1, :], out=d)
    return d


def preprocess_graph(num_nodes: int, edges: np.ndarray,
                     node_feats: np.ndarray, edge_feats: np.ndarray):
    """Offset-encode features and build dense hop/feature matrices.

    Returns (node_feats (N,Fn) int16, dist_matrix (N,N) int16,
    feature_matrix (N,N,Fe) int16). Reference: structural_transform.py:31-48.
    """
    native = _load_native()
    if native:
        return native.preprocess_graph(int(num_nodes),
                                       np.ascontiguousarray(edges, np.int64),
                                       np.ascontiguousarray(node_feats, np.int16),
                                       np.ascontiguousarray(edge_feats, np.int16))
    fn = node_feats.shape[-1]
    fe = edge_feats.shape[-1]
    node_out = (node_feats.astype(np.int16)
                + np.arange(1, fn * NODE_FEATURES_OFFSET + 1,
                            NODE_FEATURES_OFFSET, dtype=np.int16))
    edge_enc = (edge_feats.astype(np.int16)
                + np.arange(1, fe * EDGE_FEATURES_OFFSET + 1,
                            EDGE_FEATURES_OFFSET, dtype=np.int16))
    adj = np.zeros((num_nodes, num_nodes), np.int16)
    emat = np.zeros((num_nodes, num_nodes, fe), np.int16)
    if len(edges):
        ei, ej = edges[:, 0], edges[:, 1]
        adj[ei, ej] = 1
        emat[ei, ej] = edge_enc
    dist = floyd_warshall(adj)
    return node_out, dist, emat


class AddStructuralData:
    """Row transform: raw edge-list record -> dense structural matrices.

    Drop-in capability match for the reference transform
    (structural_transform.py:62-75).
    """

    def __init__(self,
                 num_nodes_key: str = "num_nodes",
                 node_features_key: str = "node_features",
                 edges_key: str = "edges",
                 edge_features_key: str = "edge_features",
                 distance_matrix_key: str = "distance_matrix",
                 feature_matrix_key: str = "feature_matrix"):
        self.num_nodes_key = num_nodes_key
        self.node_features_key = node_features_key
        self.edges_key = edges_key
        self.edge_features_key = edge_features_key
        self.distance_matrix_key = distance_matrix_key
        self.feature_matrix_key = feature_matrix_key

    def __call__(self, item: Dict) -> Dict:
        num_nodes = int(item[self.num_nodes_key])
        edges = item.pop(self.edges_key)
        node_feats = item.pop(self.node_features_key)
        edge_feats = item.pop(self.edge_features_key)
        nf, dist, fmat = preprocess_graph(num_nodes, edges, node_feats,
                                          edge_feats)
        item[self.node_features_key] = nf
        item[self.distance_matrix_key] = dist
        item[self.feature_matrix_key] = fmat
        return item
