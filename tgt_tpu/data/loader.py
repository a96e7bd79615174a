"""Samplers and a threaded prefetching batch loader.

Sharding semantics match the reference samplers (lib/training/samplers.py):
- train (DistributedTrainSampler): each rank owns a static contiguous slice of
  the dataset (enabling the per-rank cache-range optimization), shuffles
  within the slice each epoch, and wrap-pads so all ranks yield equal-length
  epochs.
- test (DistributedTestSampler): contiguous np.array_split chunks, iterated in
  fixed batches (last short batch kept).

The loader itself is a thread-pool prefetcher: rows -> transform -> bucketed
collate happen on host threads while the previous batch is on device. Fixed
bucket shapes (data/collate.py) keep XLA recompiles bounded.
"""
from __future__ import annotations

import queue
import threading
from typing import Callable, Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from tgt_tpu.data.collate import add_edge_mask, padded_collate


def slice_for_rank(length: int, rank: int, world_size: int) -> Tuple[int, int]:
    """Contiguous per-rank slice (reference: samplers.py:30-44)."""
    base = length // world_size
    rem = length % world_size
    start = rank * base + min(rank, rem)
    end = start + base + (1 if rank < rem else 0)
    return start, end


class DistributedTrainSampler:
    """Static contiguous slice + in-slice shuffle + wrap-pad to equal length."""

    def __init__(self, length: int, batch_size: int, rank: int = 0,
                 world_size: int = 1, seed: int = 0, shuffle: bool = True,
                 drop_last: bool = False):
        self.length = length
        self.batch_size = batch_size
        self.rank = rank
        self.world_size = world_size
        self.seed = seed
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.start, self.end = slice_for_rank(length, rank, world_size)
        # all ranks pad up to the same per-rank length
        self.per_rank = (length + world_size - 1) // world_size
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __iter__(self) -> Iterator[List[int]]:
        idx = np.arange(self.start, self.end)
        if self.shuffle:
            rs = np.random.RandomState(self.seed + self.epoch)
            rs.shuffle(idx)
        if len(idx) < self.per_rank and len(idx) > 0:
            idx = np.concatenate([idx, idx[:self.per_rank - len(idx)]])
        nb = len(idx) // self.batch_size if self.drop_last else \
            (len(idx) + self.batch_size - 1) // self.batch_size
        for i in range(nb):
            yield idx[i * self.batch_size:(i + 1) * self.batch_size].tolist()

    def __len__(self) -> int:
        if self.drop_last:
            return self.per_rank // self.batch_size
        return (self.per_rank + self.batch_size - 1) // self.batch_size


class SizeBucketedTrainSampler:
    """Batches molecules of similar size together so each batch collates to
    the smallest viable bucket — on PCQM-like size distributions (mean ~14
    atoms, max ~51) this cuts padded pair-entries several-fold vs random
    batching, directly multiplying N^2/N^3 throughput. Opt-in
    (``size_bucketed_batching`` in the scheme config): batch composition is
    size-correlated, a standard production tradeoff the reference doesn't
    offer.

    Keeps the per-rank contiguous-slice contract of DistributedTrainSampler
    (cache ranges still work); shuffles within size pools and shuffles the
    batch order each epoch.
    """

    def __init__(self, sizes, batch_size: int, buckets, rank: int = 0,
                 world_size: int = 1, seed: int = 0, drop_last: bool = False):
        self.sizes = np.asarray(sizes)
        self.batch_size = batch_size
        self.buckets = list(buckets)
        self.rank = rank
        self.world_size = world_size
        self.seed = seed
        self.drop_last = drop_last
        self.start, self.end = slice_for_rank(len(self.sizes), rank,
                                              world_size)
        self.per_rank = (len(self.sizes) + world_size - 1) // world_size
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def _bucket_of(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        return int(n)

    def __iter__(self) -> Iterator[List[int]]:
        rs = np.random.RandomState(self.seed + self.epoch)
        idx = np.arange(self.start, self.end)
        # out-of-shard entries of a cache-ranged dataset's `sizes` are -1;
        # reading one here means the sampler slice and the dataset's cache
        # range disagree — fail loudly rather than mis-bucket
        if len(idx) and self.sizes[idx].min() < 0:
            raise ValueError(
                f"sampler slice [{self.start},{self.end}) reads sizes "
                f"outside the dataset's cached shard (found -1 sentinel)")
        if len(idx) < self.per_rank and len(idx) > 0:
            idx = np.concatenate([idx, idx[:self.per_rank - len(idx)]])
        pools: Dict[int, List[int]] = {}
        for i in idx:
            pools.setdefault(self._bucket_of(int(self.sizes[i])),
                             []).append(int(i))
        batches = []
        for bucket in sorted(pools):
            pool = np.asarray(pools[bucket])
            rs.shuffle(pool)
            nb = len(pool) // self.batch_size if self.drop_last else \
                (len(pool) + self.batch_size - 1) // self.batch_size
            for k in range(nb):
                batches.append(pool[k * self.batch_size:
                                    (k + 1) * self.batch_size].tolist())
        order = rs.permutation(len(batches))
        for t in order:
            yield batches[t]

    def __len__(self) -> int:
        # upper bound (pool remainders can add up to len(buckets) batches)
        return (self.per_rank + self.batch_size - 1) // self.batch_size + \
            len(self.buckets)


class DistributedTestSampler:
    """Contiguous per-rank chunk, fixed-size batches (reference: samplers.py:5-13)."""

    def __init__(self, length: int, batch_size: int, rank: int = 0,
                 world_size: int = 1):
        chunks = np.array_split(np.arange(length), world_size)
        self.indices = chunks[rank]
        self.batch_size = batch_size

    def __iter__(self) -> Iterator[List[int]]:
        for i in range(0, len(self.indices), self.batch_size):
            yield self.indices[i:i + self.batch_size].tolist()

    def __len__(self) -> int:
        return (len(self.indices) + self.batch_size - 1) // self.batch_size


class DataLoader:
    """Prefetching loader: dataset rows -> collate -> (optional) post-fn."""

    def __init__(self, dataset, sampler,
                 collate_fn: Optional[Callable] = None,
                 post_fn: Optional[Callable] = None,
                 buckets: Optional[Sequence[int]] = None,
                 num_threads: int = 2, prefetch: int = 4):
        self.dataset = dataset
        self.sampler = sampler
        self.buckets = buckets
        self.collate_fn = collate_fn or (
            lambda rows: add_edge_mask(padded_collate(rows, buckets=buckets)))
        self.post_fn = post_fn
        self.num_threads = max(1, num_threads)
        self.prefetch = prefetch

    def _make_batch(self, batch_idx: List[int]) -> Dict[str, np.ndarray]:
        rows = [self.dataset[i] for i in batch_idx]
        batch = self.collate_fn(rows)
        if self.post_fn is not None:
            batch = self.post_fn(batch)
        return batch

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        batches = list(self.sampler)
        if self.num_threads == 1:
            for bi in batches:
                yield self._make_batch(bi)
            return

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def put(item) -> bool:
            """put that gives up when the consumer stopped (no thread leak
            on early consumer exit)."""
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.25)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                for bi in batches:
                    if stop.is_set():
                        return
                    if not put(self._make_batch(bi)):
                        return
            except Exception as exc:  # surface worker errors to the consumer
                put(exc)
            finally:
                put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()

    def __len__(self) -> int:
        return len(self.sampler)
