"""Pair-axis memory scaling at large N (VERDICT r4 item 5).

The pair axis exists to fit graphs whose O(N^2) edge state (with O(N^3)
triplet interactions) does not fit one chip. This harness produces the
evidence:

1. ``--virtual`` (default, forced-CPU mesh): compile the flagship-width
   train step (loss + grad) on a (1 x P) (data, pair) mesh for
   P in {1, 2, 4, 8} and report XLA's per-device compiled memory stats
   (`compiled.memory_analysis()`): peak / temp / argument bytes. The claim
   to verify: per-device TEMP (activation) memory drops ~1/P because the
   (b, N, N, w) edge tensors are i-row-sharded over 'pair'
   (parallel/mesh.py spec_for_array; the production Trainer uses the same
   specs via make_global_batch).

2. ``--tpu-oom``: probe the single-chip OOM boundary on the real TPU by
   compiling the full 24-layer flagship step at increasing N. Establishes
   the boundary the pair axis moves.

Run: python benchmarks/pair_memory.py [--n 128] [--b 2] [--layers 4]
     python benchmarks/pair_memory.py --tpu-oom [--b 8] [--layers 24]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def flagship_cfg(layers, n=None, use_pallas=False):
    from tgt_tpu.models import TGTConfig
    return TGTConfig(
        node_width=768, edge_width=256, num_heads=64, model_height=layers,
        triplet_heads=16, triplet_type="attention", num_dist_bins=256,
        upto_hop=32, compute_dtype="bfloat16", use_scan=True, remat=True,
        use_pallas=use_pallas, node_ended=False, edge_ended=True)


def make_feed_shapes(b, n):
    import jax
    return {
        "node_features": jax.ShapeDtypeStruct((b, n, 9), np.int32),
        "distance_matrix": jax.ShapeDtypeStruct((b, n, n), np.int32),
        "feature_matrix": jax.ShapeDtypeStruct((b, n, n, 3), np.int32),
        "node_mask": jax.ShapeDtypeStruct((b, n), np.float32),
        "edge_mask": jax.ShapeDtypeStruct((b, n, n), np.float32),
        "dist_input": jax.ShapeDtypeStruct((b, n, n), np.float32),
    }


def build_step(cfg):
    """Flagship train-step core: loss + grad (the memory-relevant part —
    Adam adds only param-sized streams, irrelevant at large N)."""
    import jax
    from tgt_tpu.models import make_model
    from tgt_tpu.schemes.commons import discrete_dist_loss

    _, apply = make_model("distance")

    def step(params, batch):
        def loss_fn(p):
            logits = apply(p, batch, cfg)
            return discrete_dist_loss(logits, batch["dist_input"],
                                      batch["edge_mask"], cfg.num_dist_bins,
                                      8.0)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        return loss, jax.tree.map(lambda g: g.astype(np.float32), grads)

    return step


def compile_sharded(step, params_shapes, feed, mesh, num_pair):
    """jit-compile with the production pair shardings (spec_for_array)."""
    import jax
    from jax.sharding import NamedSharding
    from tgt_tpu.parallel.mesh import spec_for_array

    def shard_of(k, v):
        spec = spec_for_array(v, num_pair, key=k)
        return NamedSharding(mesh, spec)

    from jax.sharding import PartitionSpec as P
    repl = NamedSharding(mesh, P())
    feed_sh = {k: jax.ShapeDtypeStruct(v.shape, v.dtype,
                                       sharding=shard_of(k, v))
               for k, v in feed.items()}
    params_sh = jax.tree.map(
        lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=repl),
        params_shapes)
    lowered = jax.jit(step, in_shardings=(repl, {
        k: shard_of(k, v) for k, v in feed.items()})).lower(
        params_sh, feed_sh)
    return lowered.compile()


def run_virtual(args):
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")
    import jax
    jax.config.update("jax_platforms", "cpu")
    from jax.sharding import Mesh
    from tgt_tpu.models import make_model
    from tgt_tpu.parallel.mesh import DATA_AXIS, PAIR_AXIS

    cfg = flagship_cfg(args.layers)
    init, _ = make_model("distance")
    params_shapes = jax.eval_shape(lambda: init(jax.random.PRNGKey(0), cfg))
    step = build_step(cfg)
    feed = make_feed_shapes(args.b, args.n)

    rows = []
    for p_ax in args.pair_sizes:
        mesh = Mesh(np.asarray(jax.devices()[:p_ax]).reshape(1, p_ax),
                    (DATA_AXIS, PAIR_AXIS))
        t0 = time.time()
        compiled = compile_sharded(step, params_shapes, feed, mesh, p_ax)
        ma = compiled.memory_analysis()
        row = {
            "pair": p_ax,
            "temp_mb": round(ma.temp_size_in_bytes / 2**20, 1),
            "arg_mb": round(ma.argument_size_in_bytes / 2**20, 1),
            "peak_mb": round(ma.peak_memory_in_bytes / 2**20, 1),
            "compile_s": round(time.time() - t0, 1),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    base = rows[0]["temp_mb"]
    for row in rows[1:]:
        print(f"pair={row['pair']}: temp x{row['temp_mb'] / base:.3f} "
              f"vs pair=1 (ideal {1.0 / row['pair']:.3f})", flush=True)
    return rows


def run_tpu_oom(args):
    import jax
    from tgt_tpu.models import make_model

    cfg = flagship_cfg(args.layers, use_pallas=False)
    init, _ = make_model("distance")
    step = build_step(cfg)

    for n in args.oom_sizes:
        feed = make_feed_shapes(args.b, n)
        try:
            t0 = time.time()
            params_shapes = jax.eval_shape(
                lambda: init(jax.random.PRNGKey(0), cfg))
            lowered = jax.jit(step).lower(
                jax.tree.map(lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype),
                             params_shapes), feed)
            compiled = lowered.compile()
            ma = compiled.memory_analysis()
            print(json.dumps({
                "n": n, "b": args.b, "ok": True,
                "temp_gb": round(ma.temp_size_in_bytes / 2**30, 2),
                "peak_gb": round(ma.peak_memory_in_bytes / 2**30, 2),
                "compile_s": round(time.time() - t0, 1)}), flush=True)
        except Exception as exc:  # XlaRuntimeError RESOURCE_EXHAUSTED
            msg = str(exc).splitlines()[0][:160]
            print(json.dumps({"n": n, "b": args.b, "ok": False,
                              "error": msg}), flush=True)
            if "RESOURCE_EXHAUSTED" in str(exc) or "memory" in str(exc).lower():
                break
            raise


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=128)
    ap.add_argument("--b", type=int, default=2)
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--pair-sizes", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--tpu-oom", action="store_true")
    ap.add_argument("--oom-sizes", type=int, nargs="+",
                    default=[96, 128, 160, 192, 256])
    args = ap.parse_args()
    if args.tpu_oom:
        run_tpu_oom(args)
    else:
        run_virtual(args)


if __name__ == "__main__":
    main()
