"""Device mesh construction and sharding rules.

TPU-native replacement for the reference's DDP/NCCL bootstrap
(lib/training/execute.py:61-146): no process spawning — one process per host,
``jax.distributed.initialize()`` for multi-host rendezvous, a named Mesh over
all devices, and GSPMD shardings instead of gradient-bucket all-reduce.

Axes:
- ``data``: data parallelism — batches shard on their leading axis; gradient
  all-reduce is inserted by XLA because the loss is a mean over the sharded
  batch (replaces DDP, SURVEY.md §5.8).
- ``pair``: edge-block model partitioning — the (N, N) pair grid of the edge
  channel shards over one node axis; triplet contractions all-gather the
  k-blocks over ICI (the new capability the reference lacks, SURVEY.md §5.7).
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
PAIR_AXIS = "pair"


def make_mesh(num_data: Optional[int] = None, num_pair: int = 1,
              devices=None) -> Mesh:
    """Build a (data, pair) mesh over the available devices."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if num_data is None:
        num_data = n // num_pair
    if num_data * num_pair != n:
        raise ValueError(f"mesh {num_data}x{num_pair} != {n} devices")
    return Mesh(devices.reshape(num_data, num_pair), (DATA_AXIS, PAIR_AXIS))


# Batch keys that hold (b, N, N, ...) node-pair tensors — the only ones
# eligible for 'pair' sharding. Keyed explicitly (not by square-shape
# heuristics) so a coincidentally square non-pair tensor — e.g. a bins stack
# whose sample axis equals N — is never silently mis-sharded.
# (note: finetune/gap_pred's 'dist_bins' is (b, S, N, N) — dim 1 is the MC
# sample axis, not a node axis — so it is deliberately NOT in this set)
PAIR_TENSOR_KEYS = frozenset({
    "distance_matrix", "feature_matrix", "dist_input", "edge_mask",
})


def batch_sharding(mesh: Mesh, pair_shard: bool = False) -> Dict[str, NamedSharding]:
    """NamedShardings for a batch dict: leading axis over 'data'; with
    ``pair_shard``, the first node axis of pair tensors also shards."""

    def ns(*axes):
        return NamedSharding(mesh, P(*axes))

    data_only = ns(DATA_AXIS)
    if not pair_shard:
        return {"__default__": data_only}
    out = {"__default__": data_only}
    for k in PAIR_TENSOR_KEYS:
        out[k] = ns(DATA_AXIS, PAIR_AXIS)
    return out


def shard_batch(mesh: Mesh, batch: Dict, pair_shard: bool = False) -> Dict:
    """Device-put a host batch with the standard shardings."""
    shardings = batch_sharding(mesh, pair_shard)
    default = shardings["__default__"]
    return {
        k: jax.device_put(v, shardings.get(k, default))
        for k, v in batch.items()
    }


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def spec_for_array(v, num_pair: int = 1, key: Optional[str] = None,
                   local_batch: Optional[int] = None) -> P:
    """PartitionSpec for one batch entry.

    Per-sample arrays (leading dim == the local batch size when known) shard
    over 'data'; the canonical pair tensors (``PAIR_TENSOR_KEYS``, by name —
    never by square-shape coincidence) additionally shard their first node
    axis over 'pair'; scalars and shared (non-per-sample) arrays replicate.

    ``local_batch``/``key`` are advisory: when omitted, every ndim>=1 array
    is treated as per-sample (the historical behavior, correct for all
    current scheme device batches, whose every array key is per-sample)."""
    ndim = np.ndim(v)
    if ndim == 0:
        return P()
    shape = np.shape(v)
    if local_batch is not None and shape[0] != local_batch:
        return P()  # shared array: replicate instead of mis-concatenating
    if num_pair > 1 and key in PAIR_TENSOR_KEYS and ndim >= 3 \
            and shape[1] == shape[2] and shape[1] % num_pair == 0:
        return P(DATA_AXIS, PAIR_AXIS)
    return P(DATA_AXIS)


def make_global_batch(mesh: Mesh, batch: Dict, num_pair: int = 1,
                      local_batch: Optional[int] = None) -> Dict:
    """Turn a host batch dict into globally-sharded device arrays.

    Single-process: a plain device_put with the standard shardings.
    Multi-process: each process contributes its local rows of the global
    batch (the distributed samplers already give each process a distinct
    shard) via ``jax.make_array_from_process_local_data`` — the jax-native
    replacement for DDP's per-rank batches (reference training.py:149-153).

    ``local_batch``: the per-process sample count; arrays whose leading dim
    differs are treated as shared and replicated (identical on every
    process) rather than concatenated across ranks.
    """
    multiproc = jax.process_count() > 1
    out = {}
    for k, v in batch.items():
        spec = spec_for_array(v, num_pair, key=k, local_batch=local_batch)
        sharding = NamedSharding(mesh, spec)
        arr = np.asarray(v)
        if multiproc and np.ndim(arr) >= 1 and spec != P():
            out[k] = jax.make_array_from_process_local_data(sharding, arr)
        elif multiproc:
            out[k] = jax.make_array_from_callback(
                arr.shape, sharding, lambda idx, a=arr: a[idx])
        else:
            out[k] = jax.device_put(arr, sharding)
    return out


def gather_predictions(preds: Dict[str, np.ndarray],
                       world_size: int) -> Dict[str, np.ndarray]:
    """Concatenate per-process prediction shards across hosts.

    The reference gathers with shape-all_reduce + zero-pad + sum-all_reduce
    over NCCL (training.py:746-774); here multihost process_allgather does the
    same in one call. Single-process: identity.
    """
    if world_size <= 1:
        return preds
    from jax.experimental import multihost_utils
    out = {}
    for k, v in preds.items():
        v = np.asarray(v)
        if v.ndim == 0:
            out[k] = np.asarray(multihost_utils.process_allgather(v))
            continue
        # per-rank leading dims differ whenever the split size is not
        # divisible by world_size (np.array_split in the test sampler) —
        # exchange lengths, zero-pad to the max, gather, then trim each
        # rank's shard back (mirrors the reference's zero-pad + all-reduce
        # gather, training.py:746-774)
        n_local = np.asarray(v.shape[0], np.int64)
        lengths = np.asarray(multihost_utils.process_allgather(n_local))
        n_max = int(lengths.max())
        if v.shape[0] < n_max:
            pad = np.zeros((n_max - v.shape[0],) + v.shape[1:], v.dtype)
            v = np.concatenate([v, pad], axis=0)
        gathered = np.asarray(multihost_utils.process_allgather(v,
                                                                tiled=False))
        out[k] = np.concatenate(
            [gathered[r, :int(lengths[r])] for r in range(len(lengths))],
            axis=0)
    return out


def initialize_distributed(coordinator: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> Tuple[int, int]:
    """Multi-host rendezvous. Returns (process_index, process_count).

    Single-host (the common case in tests/bench) skips initialization.
    """
    if num_processes and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
    return jax.process_index(), jax.process_count()
