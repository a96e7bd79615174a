"""Scaling sweep: step time vs batch, N, triplet on/off. Appends JSON lines."""
import argparse
import json
import os
import sys
import time

import numpy as np

# NOTE: do NOT use PYTHONPATH for TPU runs — any PYTHONPATH value breaks the
# container's axon backend registration. Self-insert the repo root instead.
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def measure(b, n, triplet, reps=5, layers=24, triplet_type="attention", use_pallas=False, remat=True, remat_policy="none"):
    import jax
    import jax.numpy as jnp
    from tgt_tpu.models import TGTConfig, make_model

    cfg = TGTConfig(node_width=768, edge_width=256, num_heads=64,
                    model_height=layers,
                    triplet_heads=16 if triplet else 0,
                    triplet_type=triplet_type, num_dist_bins=256,
                    use_pallas=use_pallas,
                    dense_min_nodes=0,  # harness MEASURES the kernel at any n
                    compute_dtype="bfloat16", use_scan=True, remat=remat,
                    remat_policy=remat_policy,
                    node_ended=False, edge_ended=True)
    init, apply = make_model("distance")
    params = init(jax.random.PRNGKey(0), cfg)
    rs = np.random.RandomState(0)
    feed = {
        "node_features": jnp.asarray(np.stack(
            [rs.randint(1, 33, size=(b, n)) + k * 128 for k in range(9)],
            -1).astype(np.int32)),
        "distance_matrix": jnp.asarray(
            rs.randint(0, 30, size=(b, n, n)).astype(np.int32)),
        "feature_matrix": jnp.asarray(np.stack(
            [rs.randint(1, 8, size=(b, n, n)) + k * 8 for k in range(3)],
            -1).astype(np.int32)),
        "node_mask": jnp.ones((b, n), jnp.float32),
        "edge_mask": jnp.ones((b, n, n), jnp.float32),
    }

    def loss_of(p, dist_input, rng):
        batch = dict(feed)
        batch["dist_input"] = dist_input
        logits = apply(p, batch, cfg, deterministic=False, rng=rng)
        return -jax.nn.log_softmax(logits.astype(jnp.float32), -1).mean()

    grad_fn = jax.jit(jax.grad(loss_of))

    def dist(seed):
        rs2 = np.random.RandomState(seed)
        c = rs2.randn(b, n, 3).astype(np.float32) * 2
        return jnp.asarray(np.linalg.norm(c[:, :, None] - c[:, None, :], axis=-1))

    t0 = time.time()
    g = grad_fn(params, dist(0), jax.random.PRNGKey(0))
    jax.tree.leaves(g)[0].block_until_ready()
    compile_s = time.time() - t0
    # PIPELINED measurement (block once at the end, two passes, min):
    # blocking per step pays the tunnel's 3-7 ms dispatch round trip per
    # step, which overstated short steps by up to 80% (EGT measured 66 ms
    # blocking vs 36.2 ms pipelined; TGT-Ag 96.5 vs 71.1 — 2026-08-17)
    times = []
    for p in range(2):
        t0 = time.time()
        for i in range(reps):
            g = grad_fn(params, dist(p * reps + i + 1), jax.random.PRNGKey(i))
        jax.tree.leaves(g)[0].block_until_ready()
        times.append((time.time() - t0) / reps)
    dt = min(times)
    return {"b": b, "n": n, "triplet": triplet, "type": triplet_type,
            "pallas": use_pallas, "remat": remat, "remat_policy": remat_policy,
            "layers": layers, "step_ms": round(dt * 1000, 1),
            "graphs_per_s": round(b / dt, 1), "compile_s": round(compile_s)}


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=8)
    ap.add_argument("--n", type=int, default=48)
    ap.add_argument("--no-triplet", action="store_true")
    ap.add_argument("--type", default="attention")
    ap.add_argument("--layers", type=int, default=24)
    ap.add_argument("--pallas", action="store_true")
    ap.add_argument("--dense", action="store_true",
                    help="lane-dense Mosaic triplet kernel (use_pallas='dense')")
    ap.add_argument("--no-remat", action="store_true")
    ap.add_argument("--remat-policy", default="none",
                    help="none|dots|tri_a|proj|tri_va (tri_va pairs with "
                         "--dense: saves kernel residuals + output)")
    ap.add_argument("--out", default="/tmp/sweep_results.jsonl")
    args = ap.parse_args()
    r = measure(args.b, args.n, not args.no_triplet, layers=args.layers,
                triplet_type=args.type,
                use_pallas=("dense" if args.dense else args.pallas),
                remat=not args.no_remat, remat_policy=args.remat_policy)
    print(json.dumps(r))
    with open(args.out, "a") as f:
        f.write(json.dumps(r) + "\n")
