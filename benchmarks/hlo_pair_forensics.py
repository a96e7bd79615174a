"""HLO forensics for the pair-axis (edge-block) sharding (VERDICT r2 #5).

Question: when the production Trainer pair-shards the (N, N) edge channel
over the 'pair' mesh axis via GSPMD annotations, what collectives does XLA
actually insert on the O(N^3) triplet path — a single all-gather of the full
edge tensor (bandwidth-equivalent to not sharding it at all), or ring-able
collective-permute chains like the hand-written ring in parallel/ring.py?

Method: compile the SAME loss+grad step the Trainer runs, on the forced-CPU
virtual mesh ((2 data, 4 pair) by default), and parse `compiled.as_text()` —
the optimized post-SPMD-partitioner HLO — for collective ops. Replica-group
structure identifies the axis: with mesh devices laid out row-major
(data, pair), groups of 4 consecutive ids = the pair axis, groups of 2 with
stride 4 = the data axis.

Run:  python benchmarks/hlo_pair_forensics.py [--n 32] [--pair 4]
      [--triplet attention|aggregate] [--dump /tmp/hlo.txt]
"""
import argparse
import collections
import functools
import os
import re
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
import numpy as np  # noqa: E402

from tests.conftest import make_synthetic_batch  # noqa: E402
from tgt_tpu.models import TGTConfig, make_model  # noqa: E402
from tgt_tpu.parallel.mesh import (batch_sharding, make_mesh,  # noqa: E402
                                   replicated)

_SHAPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
                "pred": 1, "u8": 1, "s8": 1, "f64": 8, "s64": 8, "u64": 8}

_COLLECTIVES = ("all-gather", "all-reduce", "collective-permute",
                "all-to-all", "reduce-scatter")


def tensor_bytes(shape_str):
    """Bytes of one HLO shape string like 'f32[2,32,32,16]{...}'."""
    m = re.match(r"(\w+)\[([\d,]*)\]", shape_str)
    if not m:
        return 0
    dtype, dims = m.groups()
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * _SHAPE_BYTES.get(dtype, 4)


def axis_of(groups_str, num_pair):
    """Classify replica groups as 'pair', 'data', or 'mixed'.

    Mesh layout is row-major (data, pair): device id = d * num_pair + p.
    A pair-axis group is consecutive ids within one row; a data-axis group
    has constant stride num_pair. Handles both the explicit {{0,1},{2,3}}
    format and the iota v2 format [G,S]<=[dims...]T(perm)."""
    m = re.match(r"\[(\d+),(\d+)\]<=\[([\d,]+)\](T\(([\d,]+)\))?", groups_str)
    if m:
        ngroups, gsize = int(m.group(1)), int(m.group(2))
        dims = [int(x) for x in m.group(3).split(",")]
        perm = ([int(x) for x in m.group(5).split(",")]
                if m.group(5) else list(range(len(dims))))
        ids = np.arange(int(np.prod(dims))).reshape(dims).transpose(perm)
        groups = ids.reshape(ngroups, gsize).tolist()
    else:
        groups = [[int(x) for x in g.split(",") if x]
                  for g in re.findall(r"\{([\d,]+)\}", groups_str)]
    if not groups:
        return "all"
    kinds = set()
    for g in groups:
        if len(g) <= 1:
            continue
        strides = {b - a for a, b in zip(g, g[1:])}
        if strides == {1} and len(g) <= num_pair:
            kinds.add("pair")
        elif strides == {num_pair}:
            kinds.add("data")
        else:
            kinds.add("mixed")
    return "+".join(sorted(kinds)) or "single"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=32)
    ap.add_argument("--b", type=int, default=2)
    ap.add_argument("--pair", type=int, default=4)
    ap.add_argument("--triplet", default="attention")
    ap.add_argument("--edge_width", type=int, default=16)
    ap.add_argument("--dump", default=None,
                    help="also write the full optimized HLO here")
    args = ap.parse_args()

    cfg = TGTConfig(node_width=32, edge_width=args.edge_width, num_heads=4,
                    model_height=2, triplet_heads=2,
                    triplet_type=args.triplet, num_dist_bins=8)
    init, apply = make_model("distance")
    params = init(jax.random.PRNGKey(0), cfg)
    batch = make_synthetic_batch(jax.random.PRNGKey(0), b=args.b, n=args.n)

    mesh = make_mesh(num_data=8 // args.pair, num_pair=args.pair)
    shardings = batch_sharding(mesh, pair_shard=True)
    default = shardings["__default__"]
    in_b = {k: shardings.get(k, default) for k in batch}

    def loss(p, bt):
        return (apply(p, bt, cfg) ** 2).mean()

    lowered = jax.jit(jax.grad(loss),
                      in_shardings=(replicated(mesh), in_b)).lower(
                          params, batch)
    compiled = lowered.compile()
    hlo = compiled.as_text()
    if args.dump:
        with open(args.dump, "w") as f:
            f.write(hlo)

    stats = collections.defaultdict(lambda: [0, 0])  # (kind, axis) -> n, B
    lines = []
    for line in hlo.splitlines():
        ls = line.strip()
        m = re.match(r"%?[\w.\-]+ = ([\w\[\],\s():{}]+?) (all-gather|"
                     r"all-reduce|collective-permute|all-to-all|"
                     r"reduce-scatter)(-start)?\(", ls)
        if not m:
            continue
        shape_str, kind = m.group(1), m.group(2)
        if kind == "collective-permute":
            pairs = re.search(r"source_target_pairs=\{([^}]*(?:\},\{[^}]*)*)\}+",
                              ls)
            axis = "pair"  # ppermute only appears for ring schedules
            detail = (pairs.group(0)[:80] if pairs else "")
        else:
            rg = re.search(r"replica_groups=(\S+?),?\s", ls + " ")
            axis = axis_of(rg.group(1) if rg else "", args.pair)
            detail = (rg.group(1)[:60] if rg else "")
            dim = re.search(r"dimensions=\{(\d+)\}", ls)
            if dim:
                detail += f" dim={dim.group(1)}"
        nbytes = sum(tensor_bytes(s)
                     for s in re.findall(r"\w+\[[\d,]*\]", shape_str))
        stats[(kind, axis)][0] += 1
        stats[(kind, axis)][1] += nbytes
        lines.append(f"  {kind:<20s} axis={axis:<6s} "
                     f"{nbytes/1e3:9.1f} kB  {shape_str.strip()[:60]} {detail}")

    print(f"mesh=({8 // args.pair} data x {args.pair} pair)  "
          f"triplet={args.triplet}  b={args.b} N={args.n} "
          f"edge_width={args.edge_width}")
    print(f"{len(lines)} collective ops in optimized HLO:")
    for ln in lines:
        print(ln)
    print("\nsummary (kind, axis): count, total bytes")
    for (kind, axis), (n, nb) in sorted(stats.items()):
        print(f"  {kind:<20s} {axis:<6s} n={n:<3d} {nb/1e3:10.1f} kB")

    # reference points for interpretation
    ew = args.edge_width
    full_e = args.b * args.n * args.n * ew * 4
    print(f"\nfull edge tensor (b,N,N,ew) f32: {full_e/1e3:.1f} kB; "
          f"one pair-shard: {full_e/args.pair/1e3:.1f} kB")


if __name__ == "__main__":
    main()
