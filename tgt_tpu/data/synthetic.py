"""Synthetic molecular-graph dataset for tests and benchmarks.

Generates random connected molecule-like graphs (spanning tree + extra ring
bonds), OGB-style integer features, 3D coordinates, and a scalar target
correlated with graph statistics — the same record schema the PCQM dataset
yields, so the whole pipeline (structural transform, collate, schemes,
training) runs hermetically without the real download.
"""
from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from tgt_tpu.data.structural import AddStructuralData


def make_molecule(rs: np.random.RandomState, num_nodes: int) -> Dict:
    # spanning tree + ~15% extra edges (rings)
    edges = []
    for j in range(1, num_nodes):
        i = rs.randint(0, j)
        edges.append((i, j))
    n_extra = max(0, int(0.15 * num_nodes))
    for _ in range(n_extra):
        i, j = rs.randint(0, num_nodes, 2)
        if i != j:
            edges.append((min(i, j), max(i, j)))
    edges = sorted(set(edges))
    # undirected: store both directions like OGB
    und = np.array(edges + [(j, i) for i, j in edges], np.int64)
    edge_feats = rs.randint(0, 5, size=(len(edges), 3)).astype(np.int16)
    edge_feats = np.concatenate([edge_feats, edge_feats], axis=0)

    node_feats = rs.randint(0, 60, size=(num_nodes, 9)).astype(np.int16)
    coords = (rs.randn(num_nodes, 3) * 1.5).astype(np.float32)
    target = float(np.tanh(node_feats[:, 0].mean() / 30.0) * 2.0
                   + 0.05 * num_nodes + rs.randn() * 0.01)
    return {
        "num_nodes": num_nodes,
        "edges": und,
        "node_features": node_feats,
        "edge_features": edge_feats,
        "dft_coords": coords,
        "rdkit_coords": coords + rs.randn(num_nodes, 3).astype(np.float32) * 0.2,
        "target": target,
    }


class SyntheticDataset:
    """Map-style dataset of random molecules with cached structural transforms."""

    def __init__(self, num_samples: int = 256, min_nodes: int = 4,
                 max_nodes: int = 16, seed: int = 0,
                 keep_coords: bool = True,
                 extra_transforms: Optional[List] = None):
        self.num_samples = num_samples
        self.transforms = [AddStructuralData()] + (extra_transforms or [])
        rs = np.random.RandomState(seed)
        self._rows = []
        for _ in range(num_samples):
            n = int(rs.randint(min_nodes, max_nodes + 1))
            row = make_molecule(rs, n)
            if not keep_coords:
                row.pop("dft_coords")
                row.pop("rdkit_coords")
            row["node_mask"] = np.ones(n, np.uint8)
            self._rows.append(row)
        # global row ids, like PCQM4Mv2Dataset(return_idx=True): predict
        # shards written by different ranks must carry non-colliding idx
        for i, r in enumerate(self._rows):
            r["idx"] = i
        # pre-apply structural transform (cache, like the reference row cache)
        self._cache = [self._transform(dict(r)) for r in self._rows]
        self.max_num_nodes = max(r["num_nodes"] for r in self._rows)
        self.sizes = np.asarray([r["num_nodes"] for r in self._rows])

    def _transform(self, row):
        for t in self.transforms:
            row = t(row)
        return row

    @property
    def max_nodes_index(self) -> int:
        return int(np.argmax([r["num_nodes"] for r in self._rows]))

    def __len__(self):
        return self.num_samples

    def __getitem__(self, idx: int) -> Dict:
        return dict(self._cache[idx])
