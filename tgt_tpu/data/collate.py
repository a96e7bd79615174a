"""Padded batching with XLA-friendly fixed bucket shapes.

The reference pads each batch to its own max node count
(lib/data/dataset/stack_with_pad.py) — fine for eager PyTorch, hostile to XLA
(every new shape recompiles). Here batches pad node axes to a fixed bucket
size chosen from a small ladder, so the whole training run touches only a
handful of compiled shapes; `allocate_max_batch` becomes "compile each bucket
up front" (SURVEY.md §7.1.5).
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

# Node-count axes per batch key: which dims (after the leading batch dim)
# scale with the number of nodes and must pad to the bucket size.
_NODE_AXES = {
    "node_features": (0,),
    "node_mask": (0,),
    "distance_matrix": (0, 1),
    "feature_matrix": (0, 1),
    "dist_input": (0, 1),
    "dist_target": (0, 1),
    "coords": (0,),
    "dft_coords": (0,),
    "rdkit_coords": (0,),
    "dist_bins": (1, 2),   # (S, N, N)
}

DEFAULT_BUCKETS = (16, 24, 32, 48, 64)


def pick_bucket(max_nodes: int, buckets: Sequence[int] = DEFAULT_BUCKETS) -> int:
    for b in buckets:
        if max_nodes <= b:
            return b
    return max_nodes  # oversize graph: its own (rare) shape


def stack_with_pad(arrays: List[np.ndarray],
                   pad_to: Optional[Dict[int, int]] = None) -> np.ndarray:
    """Stack ragged arrays into a zero-padded dense batch.

    ``pad_to`` maps axis -> minimum padded size (node axes to the bucket).
    """
    if np.ndim(arrays[0]) == 0:
        return np.stack(arrays)
    rank = arrays[0].ndim
    maxs = [max(a.shape[d] for a in arrays) for d in range(rank)]
    if pad_to:
        for d, size in pad_to.items():
            maxs[d] = max(maxs[d], size)
    out = np.zeros((len(arrays), *maxs), dtype=arrays[0].dtype)
    for i, a in enumerate(arrays):
        out[(i,) + tuple(slice(0, s) for s in a.shape)] = a
    return out


def padded_collate(batch: List[Dict[str, np.ndarray]],
                   buckets: Optional[Sequence[int]] = DEFAULT_BUCKETS,
                   ) -> Dict[str, np.ndarray]:
    """Batch list-of-row-dicts into padded dense arrays.

    With ``buckets`` (TPU mode) node axes pad to the bucket size; with
    ``buckets=None`` behavior matches the reference per-batch-max collate
    (lib/data/dataset/collate.py:7-17).
    """
    keys = batch[0].keys()
    bucket = None
    if buckets is not None:
        max_nodes = max(int(np.asarray(row["num_nodes"])) if "num_nodes" in row
                        else len(row["node_mask"]) for row in batch)
        bucket = pick_bucket(max_nodes, buckets)
    out = {}
    for k in keys:
        arrays = [np.asarray(row[k]) for row in batch]
        pad_to = None
        if bucket is not None and k in _NODE_AXES:
            pad_to = {d: bucket for d in _NODE_AXES[k]}
        out[k] = stack_with_pad(arrays, pad_to)
    return out


def add_edge_mask(batch: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """edge_mask = outer product of node_mask (reference:
    dist_pred/scheme.py:88-90, done on-device there; cheap on host)."""
    nm = batch["node_mask"].astype(np.float32)
    batch["edge_mask"] = nm[:, :, None] * nm[:, None, :]
    return batch


def repad_to_bucket(batch: Dict[str, np.ndarray], bucket: int,
                    allow_trim: bool = False) -> Dict[str, np.ndarray]:
    """Re-pad a batch's node axes to a different bucket size (used to
    pre-compile all bucket shapes up front — the TPU analog of the
    reference's allocate_max_batch). With ``allow_trim`` node axes LARGER
    than the bucket are sliced down instead of raising — the result is
    semantically garbage (real nodes truncated) but shape-exact, which is
    all compile-cache filling needs."""
    out = {}
    for k, v in batch.items():
        if k in _NODE_AXES:
            pad = [(0, 0)] * v.ndim
            idx = [slice(None)] * v.ndim
            for d in _NODE_AXES[k]:
                cur = v.shape[d + 1]
                if cur < bucket:
                    pad[d + 1] = (0, bucket - cur)
                elif cur > bucket:
                    if not allow_trim:
                        raise ValueError(
                            f"batch axis larger than bucket: {k}")
                    idx[d + 1] = slice(0, bucket)
            out[k] = np.pad(v[tuple(idx)], pad)
        else:
            out[k] = v
    return out


def pad_batch_dim(batch: Dict[str, np.ndarray], target_bsize: int
                  ) -> Tuple[Dict[str, np.ndarray], np.ndarray]:
    """Zero-pad the batch dimension to ``target_bsize``; returns the batch and
    a (target_bsize,) sample-validity mask. Needed for fixed-shape final
    batches and for even per-device sharding. Every value must carry the
    batch as its leading dim (Trainer.shard_device_batch re-implements the
    same zero-pad discipline for device batches with 0-d metadata entries —
    if the padding semantics ever change, change BOTH)."""
    b = len(next(iter(batch.values())))
    sample_mask = np.zeros(target_bsize, np.float32)
    sample_mask[:b] = 1
    if b == target_bsize:
        return batch, sample_mask
    out = {}
    for k, v in batch.items():
        pad_width = [(0, target_bsize - b)] + [(0, 0)] * (v.ndim - 1)
        out[k] = np.pad(v, pad_width)
    return out, sample_mask
