"""Summarize a r3_campaign.sh output directory into one comparison table.

Usage: python benchmarks/summarize_campaign.py [/tmp/r3_campaign]

Parses the JSON lines that bench.py / sweep.py / triplet_variants.py /
aggregate_variants.py / serving_bench.py append to their logs and prints a
single table plus the headline deltas vs the round-2 records (CLAUDE.md):
TGT-At 184.8 ms/step (43.3 graphs/s), TGT-Ag 71.1 ms (112.5 graphs/s).
Pure stdlib; safe to run while the campaign is still in flight (it reports
whatever logs exist so far).
"""
import glob
import json
import os
import sys

R2_BASELINES = {"At_step_ms": 184.8, "At_graphs_s": 43.3,
                "Ag_step_ms": 71.1, "Ag_graphs_s": 112.5}


def json_lines(path):
    out = []
    with open(path, errors="replace") as f:
        for line in f:
            line = line.strip()
            if line.startswith("{") and line.endswith("}"):
                try:
                    out.append(json.loads(line))
                except json.JSONDecodeError:
                    pass
    return out


def main(outdir):
    logs = sorted(glob.glob(os.path.join(outdir, "*.log")))
    if not logs:
        print(f"no logs in {outdir}")
        return
    rows = []
    for path in logs:
        name = os.path.basename(path)[:-4]
        if name == "campaign":
            continue
        recs = json_lines(path)
        if not recs:
            tail = open(path, errors="replace").read().strip().splitlines()
            rows.append((name, None, tail[-1][:90] if tail else "(empty)"))
        else:
            rows.append((name, recs[-1], None))

    print(f"{'step':28s} {'step_ms':>8s} {'graphs/s':>9s}  detail")
    for name, rec, err in rows:
        if rec is None:
            print(f"{name:28s} {'-':>8s} {'-':>9s}  FAILED: {err}")
            continue
        def first_of(*keys):
            for key in keys:
                if rec.get(key) is not None:
                    return rec[key]
            return None

        ms = first_of("step_ms", "ms_per_step")
        gs = first_of("graphs_per_s", "graphs_s", "mol_per_s")
        detail = {k: v for k, v in rec.items()
                  if k in ("value", "unit", "vs_baseline", "mfu",
                           "sol_bandwidth", "b", "n", "remat", "pallas",
                           "type", "variant", "partial", "stage", "mc_mode",
                           "p50_s")}
        print(f"{name:28s} {ms if ms is not None else '-':>8} "
              f"{gs if gs is not None else '-':>9}  {detail}")

    # headline deltas
    def last_ms(step):
        for name, rec, _ in rows:
            if name == step and rec:
                return rec.get("step_ms")
        return None

    print()
    for label, base_key, prod, dense in (
            ("TGT-At", "At_step_ms", "sweep_base", "sweep_dense_noremat"),
            ("TGT-Ag", "Ag_step_ms", None, "sweep_ag_dense_noremat")):
        b = last_ms(prod) if prod else R2_BASELINES[base_key]
        d = last_ms(dense)
        r2 = R2_BASELINES[base_key]
        if d is not None and d > 0:
            ref = b if (b is not None and b > 0) else r2
            print(f"{label}: dense {d} ms vs prod {ref} ms "
                  f"({ref / d:.2f}x) | r2 record {r2} ms ({r2 / d:.2f}x)")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/r3_campaign")
