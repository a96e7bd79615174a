"""Profile the flagship train step and print a device-time op breakdown.

Reuses bench.py's model/step builder, captures a jax.profiler trace around a
few steps, then parses the trace protobuf/json for per-op-category device
time (copies vs fusions vs convolutions vs dots). This is the forensics tool
behind the N^3 layout work (CLAUDE.md round-2 item 1).

Usage: python benchmarks/profile_step.py [--small] [--steps 5] [--top 25]
"""
import argparse
import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def capture(small: bool, steps: int, logdir: str, dense: bool = False):
    import jax
    import jax.numpy as jnp
    import numpy as np
    import bench

    bench._enable_compile_cache()
    step, params, opt_state, bsz, n, pool = bench.build(small, dense)
    rs = np.random.RandomState(1)

    def one(i, params, opt_state):
        idx = jnp.asarray(rs.choice(pool, bsz, replace=False))
        rng = jax.random.fold_in(jax.random.PRNGKey(7), i)
        return step(params, opt_state, idx, rng)

    # warmup / compile
    params, opt_state, loss = one(0, params, opt_state)
    loss.block_until_ready()

    jax.profiler.start_trace(logdir)
    for i in range(steps):
        params, opt_state, loss = one(i + 1, params, opt_state)
    loss.block_until_ready()
    jax.profiler.stop_trace()
    return bsz, n


def parse_trace(logdir: str, top: int, steps: int):
    paths = glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        print("no trace found under", logdir)
        return
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])

    # find TPU device-op events: pid/tid named like "/device:TPU:0" lanes
    pid_names = {}
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev["args"].get("name", "")
    device_pids = {pid for pid, name in pid_names.items()
                   if "TPU" in name.upper() or "device" in name.lower()}

    per_op = collections.Counter()
    per_cat = collections.Counter()
    total = 0.0
    for ev in events:
        if ev.get("ph") != "X" or ev.get("pid") not in device_pids:
            continue
        name = ev.get("name", "")
        dur = ev.get("dur", 0) / 1e3  # us -> ms
        if not name or dur <= 0:
            continue
        per_op[name] += dur
        base = name.split(".")[0].split("(")[0]
        for cat in ("copy", "fusion", "convolution", "dot", "transpose",
                    "all-reduce", "scan", "while", "rng", "reduce",
                    "broadcast", "convert", "bitcast", "dynamic"):
            if base.startswith(cat):
                per_cat[cat] += dur
                break
        else:
            per_cat["other:" + base[:24]] += dur
        total += dur

    print(f"\n== device time by category (total {total:.1f} ms over "
          f"{steps} steps = {total/steps:.1f} ms/step) ==")
    for cat, ms in per_cat.most_common(20):
        print(f"  {cat:32s} {ms:9.1f} ms  ({ms/steps:7.2f} ms/step, "
              f"{100*ms/max(total,1e-9):5.1f}%)")
    print(f"\n== top {top} individual ops ==")
    for name, ms in per_op.most_common(top):
        print(f"  {ms:9.2f} ms  {name[:110]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--logdir", default="/tmp/tgt_profile")
    ap.add_argument("--parse-only", action="store_true")
    ap.add_argument("--dense", action="store_true",
                    help="profile the promoted lane-dense kernel config")
    args = ap.parse_args()
    if not args.parse_only:
        os.makedirs(args.logdir, exist_ok=True)
        capture(args.small, args.steps, args.logdir, args.dense)
    parse_trace(args.logdir, args.top, args.steps)


if __name__ == "__main__":
    main()
