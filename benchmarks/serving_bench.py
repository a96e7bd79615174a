"""Serving throughput/latency benchmark on the real chip.

Measures `tgt_tpu.serving.GapPredictor.predict` end-to-end (host collate +
structural transform + MC-dropout device forward + fetch) on a PCQM-like
synthetic molecule-size mix, at flagship gap-model widths. Reports:

- warmup (per-bucket compile) time — near-zero on a warm persistent cache
- steady-state molecules/s and per-request latency for several request sizes

The tunnel caches identical executions, so every request uses fresh random
molecules (CLAUDE.md measurement rules), and the first timed request after
compile is discarded.

Usage: python benchmarks/serving_bench.py [--mc 10] [--batch 16] [--cpu]
       [--layers 24] [--requests 6] [--molecules 64]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_molecule(rs: np.random.RandomState, n: int):
    """A PCQM-plausible random molecule (same schema as serving.predict)."""
    m = max(n - 1, 0)
    edges = np.stack([np.arange(m), np.arange(1, n)], axis=1) if m else \
        np.zeros((0, 2), np.int64)
    coords = rs.randn(n, 3).astype(np.float32) * 2
    d = np.linalg.norm(coords[:, None] - coords[None, :], axis=-1)
    return {
        "num_nodes": n,
        "edges": edges.astype(np.int64),
        "node_features": rs.randint(1, 30, size=(n, 9)).astype(np.int64),
        "edge_features": rs.randint(0, 4, size=(m, 3)).astype(np.int64),
        "dist_input": d.astype(np.float32),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mc", type=int, default=10)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--layers", type=int, default=24)
    ap.add_argument("--requests", type=int, default=6)
    ap.add_argument("--molecules", type=int, default=64,
                    help="molecules per request")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--cache-dir", default=None)
    ap.add_argument("--mc-mode", default="map",
                    choices=["auto", "map", "vmap"],
                    help="MC-draw schedule: sequential lax.map vs "
                         "vmap-over-draws (VERDICT r2 #8 lever)")
    ap.add_argument("--dense", action="store_true",
                    help="lane-dense Mosaic triplet kernel "
                         "(use_pallas='dense'; all serving buckets qualify "
                         "at flagship widths)")
    args = ap.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from tgt_tpu.models import TGTConfig
    from tgt_tpu.models.heads import gap_model_init
    from tgt_tpu.serving import GapPredictor

    # flagship gap-model widths (configs/pcqm: node 768, edge 256, 32/16
    # heads; gap head is node-ended)
    cfg = TGTConfig(node_width=768, edge_width=256, num_heads=32,
                    model_height=args.layers, triplet_heads=16,
                    triplet_type="attention", num_dist_bins=256,
                    compute_dtype="bfloat16", remat=False, use_scan=True,
                    use_pallas="dense" if args.dense else False,
                    node_ended=True, edge_ended=False)
    params = gap_model_init(jax.random.PRNGKey(0), cfg)
    pred = GapPredictor(params, cfg, mc_samples=args.mc,
                        batch_size=args.batch, buckets=(16, 32, 48),
                        compilation_cache_dir=args.cache_dir,
                        mc_mode=args.mc_mode)

    t0 = time.time()
    pred.warmup()
    print(f"warmup (all bucket shapes): {time.time()-t0:.1f}s", flush=True)

    rs = np.random.RandomState(0)
    # PCQM-like size mix: lognormal around ~14 atoms, clipped to the ladder
    def request(k):
        sizes = np.clip(np.round(np.exp(rs.normal(2.6, 0.4, size=k))),
                        4, 48).astype(int)
        return [make_molecule(rs, int(n)) for n in sizes]

    # discard the first timed request (tunnel first-pass artifact)
    pred.predict(request(args.molecules))

    lat = []
    for _ in range(args.requests):
        mols = request(args.molecules)
        t0 = time.time()
        out = pred.predict(mols)
        lat.append(time.time() - t0)
        assert out.shape[0] == len(mols) and np.isfinite(out).all()
    lat = np.asarray(lat)
    thr = args.molecules / lat
    print(f"requests of {args.molecules} molecules, mc={args.mc}, "
          f"batch={args.batch}:")
    print(f"  latency  p50={np.percentile(lat,50)*1e3:.0f}ms  "
          f"min={lat.min()*1e3:.0f}ms  max={lat.max()*1e3:.0f}ms")
    print(f"  throughput best={thr.max():.1f} mol/s  "
          f"median={np.percentile(thr,50):.1f} mol/s")
    import json
    print(json.dumps({"mc_mode": args.mc_mode, "dense": args.dense,
                      "mc": args.mc, "molecules": args.molecules,
                      "mol_per_s": round(float(np.percentile(thr, 50)), 1),
                      "p50_s": round(float(np.percentile(lat, 50)), 3)}))


if __name__ == "__main__":
    main()
