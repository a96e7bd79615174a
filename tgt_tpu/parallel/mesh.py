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


def batch_sharding(mesh: Mesh, pair_shard: bool = False) -> Dict[str, NamedSharding]:
    """NamedShardings for a batch dict: leading axis over 'data'; with
    ``pair_shard``, the first node axis of pair tensors also shards."""

    def ns(*axes):
        return NamedSharding(mesh, P(*axes))

    data_only = ns(DATA_AXIS)
    if not pair_shard:
        return {"__default__": data_only}
    return {
        "__default__": data_only,
        "distance_matrix": ns(DATA_AXIS, PAIR_AXIS),
        "feature_matrix": ns(DATA_AXIS, PAIR_AXIS),
        "dist_input": ns(DATA_AXIS, PAIR_AXIS),
        "edge_mask": ns(DATA_AXIS, PAIR_AXIS),
    }


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
        gathered = multihost_utils.process_allgather(v, tiled=False)
        # (num_processes, per_rank, ...) -> concatenated
        out[k] = np.concatenate(list(np.asarray(gathered)), axis=0)
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
