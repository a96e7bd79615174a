"""Can the host input pipeline feed the chip? (VERDICT r2 #6)

Measures host-side graphs/s through the production row path — cached raw
row -> AddStructuralData (Floyd-Warshall + offset-encode + dense scatter;
C++ native or numpy fallback) -> padded_collate (+edge mask) — on a
PCQM-like size mix, and compares against the chip's measured consumption
(CLAUDE.md: 43.3 graphs/s TGT-At, 112.5 TGT-Ag, 221 EGT; size-bucketed
batching raises demand up to ~1.9x).

The acceptance bar is loader >= 2x chip demand (SURVEY §7.3 hard part 5).

Run:  python benchmarks/loader_throughput.py [--mols 4096] [--b 8]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tgt_tpu.data import loader as loader_mod  # noqa: E402
from tgt_tpu.data.collate import add_edge_mask, padded_collate  # noqa: E402
from tgt_tpu.data.loader import (DataLoader, DistributedTrainSampler,  # noqa: E402
                                 SizeBucketedTrainSampler)
from tgt_tpu.data.structural import AddStructuralData, _load_native  # noqa: E402
from tgt_tpu.data.synthetic import make_molecule  # noqa: E402

BUCKETS = (16, 24, 32, 48, 64)


def pcqm_like_sizes(rs, m):
    """PCQM4Mv2-like heavy-atom counts: mean ~14, right tail to ~51."""
    return np.clip(rs.poisson(10, m) + 4, 4, 51)


class UncachedDataset:
    """Raw rows cached (like PCQM4Mv2Dataset's row cache); the structural
    transform runs per __getitem__ — the production hot path."""

    def __init__(self, rows, transform):
        self.rows = rows
        self.transform = transform
        self.sizes = np.asarray([r["num_nodes"] for r in rows])

    def __len__(self):
        return len(self.rows)

    def __getitem__(self, i):
        return self.transform(dict(self.rows[i]))


def time_it(fn, *, min_s=1.0):
    """Run fn (returns #graphs) repeatedly for >= min_s; returns graphs/s."""
    n, t0 = 0, time.perf_counter()
    while True:
        n += fn()
        dt = time.perf_counter() - t0
        if dt >= min_s:
            return n / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mols", type=int, default=4096)
    ap.add_argument("--b", type=int, default=8)
    ap.add_argument("--threads", type=int, default=2)
    args = ap.parse_args()

    rs = np.random.RandomState(7)
    sizes = pcqm_like_sizes(rs, args.mols)
    rows = []
    for i, n in enumerate(sizes):
        r = make_molecule(rs, int(n))
        r["node_mask"] = np.ones(int(n), np.uint8)
        r["idx"] = i
        rows.append(r)
    print(f"{args.mols} synthetic molecules, size mean={sizes.mean():.1f} "
          f"max={sizes.max()}", file=sys.stderr)

    transform = AddStructuralData()
    native_ok = bool(_load_native())
    out = {"native_available": native_ok, "batch_size": args.b,
           "size_mean": round(float(sizes.mean()), 1)}

    # --- stage microbenchmarks -------------------------------------------
    def bench_transform():
        order = rs.permutation(len(rows))[:512]
        for i in order:
            transform(dict(rows[i]))
        return len(order)

    out["transform_graphs_per_s"] = round(time_it(bench_transform), 1)

    if native_ok:
        import tgt_tpu.data.structural as st
        st._native = False  # force numpy fallback
        out["transform_numpy_graphs_per_s"] = round(time_it(bench_transform), 1)
        st._native = None   # restore autodetect

    pre = [transform(dict(r)) for r in rows[:512]]

    def bench_collate():
        order = rs.permutation(len(pre) - args.b)
        cnt = 0
        for k in order[:64]:
            add_edge_mask(padded_collate(pre[k:k + args.b], buckets=BUCKETS))
            cnt += args.b
        return cnt

    out["collate_graphs_per_s"] = round(time_it(bench_collate), 1)

    # --- end-to-end DataLoader -------------------------------------------
    ds = UncachedDataset(rows, transform)

    def bench_loader(sampler, num_threads):
        dl = DataLoader(ds, sampler, buckets=BUCKETS,
                        num_threads=num_threads, prefetch=8)
        def run():
            cnt = 0
            for batch in dl:
                cnt += batch["node_features"].shape[0]
            return cnt
        return round(time_it(run, min_s=2.0), 1)

    rand = DistributedTrainSampler(len(ds), args.b, seed=1)
    out["e2e_random_1thread_graphs_per_s"] = bench_loader(rand, 1)
    out["e2e_random_prefetch_graphs_per_s"] = bench_loader(rand, args.threads)
    buck = SizeBucketedTrainSampler(ds.sizes, args.b, BUCKETS, seed=1)
    out["e2e_bucketed_prefetch_graphs_per_s"] = bench_loader(buck, args.threads)

    # --- verdict vs chip demand ------------------------------------------
    demand = {"tgt_at": 43.3, "tgt_ag": 112.5, "egt": 221.0}
    fastest_chip = max(demand.values()) * 1.9  # bucketing headroom
    e2e = out["e2e_bucketed_prefetch_graphs_per_s"]
    out["chip_demand_graphs_per_s"] = demand
    out["worst_case_demand_with_bucketing"] = round(fastest_chip, 1)
    out["headroom_vs_worst_case"] = round(e2e / fastest_chip, 2)
    out["feeds_chip_2x"] = bool(e2e >= 2 * fastest_chip)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
