"""Measure the real-data throughput effect of size-bucketed batching.

Simulates a PCQM-like molecule-size distribution (lognormal, mean ~14 atoms,
clipped to [4, 51]) and measures end-to-end training throughput with
(a) random batching (each batch pads to its max size bucket — the reference's
effective behavior) vs (b) size-bucketed batching (batches collate to the
smallest viable bucket).

Usage: python benchmarks/bucketing_bench.py [--layers 4] [--steps 30]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def pcqm_like_sizes(n, seed=0):
    rs = np.random.RandomState(seed)
    sizes = rs.lognormal(mean=2.6, sigma=0.35, size=n).astype(int)
    return np.clip(sizes, 4, 51)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--batch", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from tgt_tpu.data.collate import pick_bucket
    from tgt_tpu.data.loader import (DistributedTrainSampler,
                                     SizeBucketedTrainSampler)
    from tgt_tpu.models import TGTConfig, make_model
    from tgt_tpu.schemes.commons import discrete_dist_loss

    buckets = (16, 24, 32, 40, 48, 56)
    cfg = TGTConfig(node_width=768, edge_width=256, num_heads=64,
                    model_height=args.layers, triplet_heads=16,
                    triplet_type="attention", num_dist_bins=256,
                    compute_dtype="bfloat16", use_scan=True, remat=True,
                    node_ended=False, edge_ended=True)
    init, apply = make_model("distance")
    params = init(jax.random.PRNGKey(0), cfg)

    def make_batch(bucket, seed):
        rs = np.random.RandomState(seed)
        b, n = args.batch, bucket
        coords = (rs.randn(b, n, 3) * 2).astype(np.float32)
        return {
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
            "dist_input": jnp.asarray(np.linalg.norm(
                coords[:, :, None] - coords[:, None, :], axis=-1)),
        }

    from types import SimpleNamespace
    from tgt_tpu.training.harness import make_optimizer
    opt_init, opt_update = make_optimizer(
        SimpleNamespace(clip_grad_value=None, clip_grad_norm=None), None)
    opt_state0 = jax.jit(opt_init)(params)

    def loss_of(p, batch):
        logits = apply(p, batch, cfg)
        return discrete_dist_loss(logits, batch["dist_input"],
                                  batch["edge_mask"], cfg.num_dist_bins, 8.0)

    def train_step(p, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_of)(p, batch)
        updates, new_opt = opt_update(grads, opt_state, p, jnp.asarray(1e-4))
        new_p = jax.tree.map(lambda a, u: a + u, p, updates)
        return new_p, new_opt, loss

    # NOTE: steps CHAIN through the params/opt_state carry — on this
    # remote-execution stack only dependency-chained work measures honestly
    # (independent dispatches may never execute; see CLAUDE.md)
    step_fn = jax.jit(train_step)

    sizes = pcqm_like_sizes(4096)

    def bucket_sequence(sampler):
        return [pick_bucket(int(sizes[list(bi)].max()), buckets)
                for bi in sampler]

    random_buckets = bucket_sequence(
        DistributedTrainSampler(len(sizes), args.batch, shuffle=True))
    bucketed_buckets = bucket_sequence(
        SizeBucketedTrainSampler(sizes, args.batch, buckets))

    def run(seq, tag):
        # compile + warm each distinct bucket (incl. first-fetch path)
        distinct = sorted(set(seq))
        p, opt = params, opt_state0
        for bk in distinct:
            p, opt, loss = step_fn(p, opt, make_batch(bk, 0))
            float(loss)
        steps = seq[:args.steps]
        batches = [make_batch(bk, i + 1) for i, bk in enumerate(steps)]
        p, opt = params, opt_state0
        t0 = time.time()
        for batch in batches:
            p, opt, loss = step_fn(p, opt, batch)
        final = float(loss)  # chained carry forces every step to execute
        dt = time.time() - t0
        gps = args.batch * len(steps) / dt
        print(json.dumps({"mode": tag, "graphs_per_s": round(gps, 1),
                          "final_loss": round(final, 4),
                          "mean_bucket": round(float(np.mean(steps)), 1),
                          "distinct_buckets": distinct}))
        return gps

    g_rand = run(random_buckets, "random_batching")
    g_buck = run(bucketed_buckets, "size_bucketed")
    print(json.dumps({"speedup": round(g_buck / g_rand, 2)}))


if __name__ == "__main__":
    main()
