"""Scaling-efficiency harness: edges/s (pair-entries/s) vs device count.

BASELINE.md target: >=85% edges/s scaling efficiency from 1 host to 4 hosts.
On a pod slice this runs with real devices per host; in this container it
exercises the same code path on the virtual CPU mesh (numbers are then about
the harness, not the hardware).

Usage:
  python benchmarks/scaling.py --devices 1 2 4 8 [--cpu] [--layers 4]

Reports per device-count: step_ms, graphs/s, pair_entries/s, efficiency vs
the 1-device run (weak scaling: global batch = per-device batch x devices).
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def build_step(cfg, apply, opt_update):
    import jax
    import jax.numpy as jnp

    def loss_of(params, batch):
        logits = apply(params, batch, cfg)
        return -jax.nn.log_softmax(logits.astype(jnp.float32), -1).mean()

    def train_step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_of)(params, batch)
        updates, new_opt = opt_update(grads, opt_state, params,
                                      jnp.asarray(1e-4))
        new_params = jax.tree.map(lambda p, u: p + u, params, updates)
        return new_params, new_opt, loss

    return train_step


def make_feed(b, n, seed=0):
    rs = np.random.RandomState(seed)
    coords = (rs.randn(b, n, 3) * 2).astype(np.float32)
    return {
        "node_features": np.stack([rs.randint(1, 33, size=(b, n)) + k * 128
                                   for k in range(9)], -1).astype(np.int32),
        "distance_matrix": rs.randint(0, 30, size=(b, n, n)).astype(np.int32),
        "feature_matrix": np.stack([rs.randint(1, 8, size=(b, n, n)) + k * 8
                                    for k in range(3)], -1).astype(np.int32),
        "node_mask": np.ones((b, n), np.float32),
        "edge_mask": np.ones((b, n, n), np.float32),
        "dist_input": np.linalg.norm(coords[:, :, None] - coords[:, None, :],
                                     axis=-1).astype(np.float32),
    }


def run(num_devices, per_device_b, n, cfg, reps):
    import jax
    import jax.numpy as jnp
    from types import SimpleNamespace
    from tgt_tpu.models import make_model
    from tgt_tpu.parallel.mesh import make_mesh, replicated, shard_batch
    from tgt_tpu.training.harness import make_optimizer

    init, apply = make_model("distance")
    params = init(jax.random.PRNGKey(0), cfg)
    opt_init, opt_update = make_optimizer(
        SimpleNamespace(clip_grad_value=None, clip_grad_norm=None), None)
    opt_state = jax.jit(opt_init)(params)

    mesh = make_mesh(num_data=num_devices, num_pair=1,
                     devices=jax.devices()[:num_devices])
    b = per_device_b * num_devices
    step = jax.jit(build_step(cfg, apply, opt_update), donate_argnums=(0, 1))

    params = jax.device_put(params, replicated(mesh))
    opt_state = jax.device_put(opt_state, replicated(mesh))
    feeds = [shard_batch(mesh, make_feed(b, n, seed=s)) for s in range(reps + 1)]

    with mesh:
        params, opt_state, loss = step(params, opt_state, feeds[0])
        loss.block_until_ready()
        t0 = time.time()
        for i in range(reps):
            params, opt_state, loss = step(params, opt_state, feeds[i + 1])
        loss.block_until_ready()
    dt = (time.time() - t0) / reps
    return {"devices": num_devices, "global_batch": b,
            "step_ms": round(dt * 1000, 1),
            "graphs_per_s": round(b / dt, 1),
            "pair_entries_per_s": round(b * n * n / dt, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--per-device-b", type=int, default=4)
    ap.add_argument("--n", type=int, default=32)
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--cpu", action="store_true",
                    help="force the virtual CPU mesh")
    args = ap.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", max(args.devices))

    from tgt_tpu.models import TGTConfig
    cfg = TGTConfig(node_width=128, edge_width=64, num_heads=16,
                    model_height=args.layers, triplet_heads=8,
                    triplet_type="attention", num_dist_bins=64,
                    compute_dtype="bfloat16", use_scan=True, remat=True,
                    node_ended=False, edge_ended=True)

    results = []
    for nd in args.devices:
        if nd > len(jax.devices()):
            print(f"skip {nd} devices (only {len(jax.devices())} available)")
            continue
        r = run(nd, args.per_device_b, args.n, cfg, args.reps)
        if results:
            base = results[0]
            r["efficiency"] = round(
                (r["pair_entries_per_s"] / base["pair_entries_per_s"])
                / (r["devices"] / base["devices"]), 3)
        else:
            r["efficiency"] = 1.0
        results.append(r)
        print(json.dumps(r))


if __name__ == "__main__":
    main()
