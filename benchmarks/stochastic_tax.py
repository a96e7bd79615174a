"""Decompose the stochastic-training tax on the flagship step.

MEASURED RESULT (TPU v5e, b=8 N=48, two-pass min, 2026-08-17): with
rng_impl='rbg' keys the published stochastic features are FREE —
  none 187.1 | +source_dropout 186.9 | +drop_path 186.4 | +act 186.6 |
  all 186.5 ms/step  (noise-level differences)
num_heads=64 vs 32 is also a wash (185.8 / 184.4 with all dropouts).
A dropout-free Trainer soak that measured ~67 ms/step was a different
MODEL (triplet_type defaulted to 'aggregate'), not a stochastic tax.

Usage: python benchmarks/stochastic_tax.py [--steps 10] [--features ...]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FEATURES = {
    "none": {},
    "source": dict(source_dropout=0.3),
    "droppath": dict(drop_path=0.2),
    "act": dict(node_act_dropout=0.1, edge_act_dropout=0.1),
    "all": dict(source_dropout=0.3, drop_path=0.2,
                node_act_dropout=0.1, edge_act_dropout=0.1),
}

# head-count probe: the dropout-free Trainer soak (num_heads=32) measured
# ~67 ms/step vs 187 ms with num_heads=64 — isolate the EGT head count
FEATURES["h32"] = dict(num_heads=32)
FEATURES["h32_all"] = dict(num_heads=32, source_dropout=0.3, drop_path=0.2,
                           node_act_dropout=0.1, edge_act_dropout=0.1)
# aggregate-variant A/B vs benchmarks/sweep.py (which blocks per step and
# skips the optimizer): same model, pipelined donated-state harness
FEATURES["agg64"] = dict(triplet_type="aggregate")
FEATURES["agg32"] = dict(triplet_type="aggregate", num_heads=32)
FEATURES["egt"] = dict(triplet_heads=0)
# the PUBLISHED TGT-Agx2 architecture: 12 layers x2 weight-shared reps
FEATURES["agx2"] = dict(triplet_type="aggregate", model_height=12,
                        layer_multiplier=2)
# in-kernel triplet dropout (round 5): the dense kernel's hash-mask
# dropout vs the dropout-0 dense kernel vs the jnp path with dropout —
# quantifies the in-kernel mask cost and the fallback it replaces
FEATURES["dense"] = dict(use_pallas="dense")
FEATURES["dense_tdrop"] = dict(use_pallas="dense", triplet_dropout=0.1)
FEATURES["tdrop"] = dict(triplet_dropout=0.1)


def run_one(name, overrides, steps):
    import jax
    import jax.numpy as jnp
    from types import SimpleNamespace
    from tgt_tpu.models import TGTConfig, make_model
    from tgt_tpu.schemes.commons import discrete_dist_loss
    from tgt_tpu.training.harness import make_optimizer

    base = dict(node_width=768, edge_width=256, num_heads=64,
                model_height=24, triplet_heads=16,
                triplet_type="attention", num_dist_bins=256,
                compute_dtype="bfloat16", use_scan=True, remat=True,
                node_ended=False, edge_ended=True)
    base.update(overrides)
    cfg = TGTConfig(**base)
    bsz, n = 8, 48
    init, apply = make_model("distance")
    params = init(jax.random.PRNGKey(0), cfg)
    opt_init, opt_update = make_optimizer(
        SimpleNamespace(clip_grad_value=None, clip_grad_norm=None), None)
    opt_state = jax.jit(opt_init)(params)

    pool = 4 * bsz
    rs = np.random.RandomState(0)
    coords = (rs.randn(pool, n, 3) * 2).astype(np.float32)
    dist = np.linalg.norm(coords[:, :, None] - coords[:, None, :],
                          axis=-1).astype(np.float32)
    pool_data = {
        "node_features": jnp.asarray(np.stack(
            [rs.randint(1, 33, size=(pool, n)) + k * 128 for k in range(9)],
            -1).astype(np.int32)),
        "distance_matrix": jnp.asarray(
            rs.randint(0, 30, size=(pool, n, n)).astype(np.int32)),
        "feature_matrix": jnp.asarray(np.stack(
            [rs.randint(1, 8, size=(pool, n, n)) + k * 8 for k in range(3)],
            -1).astype(np.int32)),
        "node_mask": jnp.ones((pool, n), jnp.float32),
        "edge_mask": jnp.ones((pool, n, n), jnp.float32),
        "dist_input": jnp.asarray(dist),
    }

    def train_step(params, opt_state, idx, rng):
        batch = {k: v[idx] for k, v in pool_data.items()}

        def loss_fn(p):
            logits = apply(p, batch, cfg, deterministic=False, rng=rng)
            return discrete_dist_loss(logits, batch["dist_input"],
                                      batch["edge_mask"], cfg.num_dist_bins,
                                      8.0)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, new_opt = opt_update(grads, opt_state, params,
                                      jnp.asarray(1e-4))
        return (jax.tree.map(lambda p, u: p + u, params, updates),
                new_opt, loss)

    step = jax.jit(train_step, donate_argnums=(0, 1))

    def one(i):
        idx = jnp.asarray(rs.choice(pool, bsz, replace=False))
        rng = jax.random.fold_in(jax.random.key(7, impl='rbg'), i)
        return step(params, opt_state, idx, rng)

    t0 = time.time()
    params, opt_state, loss = one(0)
    loss.block_until_ready()
    compile_s = time.time() - t0

    times = []
    for p in range(2):          # two passes; report min (tunnel first-pass
        t0 = time.time()        # artifact, CLAUDE.md measurement rule)
        for i in range(steps):
            params, opt_state, loss = one(1 + p * steps + i)
        loss.block_until_ready()
        times.append((time.time() - t0) / steps)
    print(f"{name:10s} {min(times)*1e3:7.2f} ms/step "
          f"(passes: {times[0]*1e3:.1f}, {times[1]*1e3:.1f}) "
          f"compile {compile_s:.0f}s", flush=True)
    return min(times)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--features", default=None,
                    help="comma list; default all of " + ",".join(FEATURES))
    args = ap.parse_args()
    import jax
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)

    names = (args.features.split(",") if args.features else list(FEATURES))
    for name in names:
        run_one(name, FEATURES[name], args.steps)


if __name__ == "__main__":
    main()
