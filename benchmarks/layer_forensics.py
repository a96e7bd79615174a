"""Full TGT-layer stack microbenchmark — isolates which execution factor
(scan / remat / stochastic dropout / optimizer) re-introduces the N^3
layout tax that the k-minor logits spelling removed on the isolated triplet
core (benchmarks/triplet_variants.py: 2.98x; full model: no change).

Builds `layers` x tgt_layer_apply at flagship shapes (b=8, N=48, node 768,
edge 256, heads 64/16, bf16) exactly as the encoder does, times fwd+bwd,
and optionally prints the compiled HLO's copy volume.

Usage:
  python benchmarks/layer_forensics.py --layers 4 \
      [--scan] [--remat] [--stochastic] [--copies] [--steps 10]
"""
import argparse
import os
import re
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def hlo_copy_stats(compiled_text, top=12):
    def nbytes(shape):
        m = re.match(r"(\w+)\[([\d,]*)\]", shape)
        if not m:
            return 0
        dt, dims = m.groups()
        sz = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "pred": 1}.get(dt, 4)
        k = 1
        for d in dims.split(","):
            if d:
                k *= int(d)
        return k * sz

    copies = [(m.group(1), m.group(2)) for m in re.finditer(
        r"^\s*([%\w.\-]+) = ([^\s]+) copy\(", compiled_text, re.M)]
    copies.sort(key=lambda x: -nbytes(x[1]))
    total = sum(nbytes(s) for _, s in copies)
    print(f"  copies: {len(copies)} totalling {total/1e6:.1f} MB")
    for name, shape in copies[:top]:
        print(f"    {nbytes(shape)/1e6:8.1f} MB  {name}  {shape}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=8)
    ap.add_argument("--n", type=int, default=48)
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--scan", action="store_true")
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--policy", default="none",
                    choices=["none", "dots", "tri_a", "proj"])
    ap.add_argument("--stochastic", action="store_true")
    ap.add_argument("--copies", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    import jax.numpy as jnp
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from tgt_tpu.core.graph import Graph
    from tgt_tpu.models import TGTConfig
    from tgt_tpu.models.encoder import tgt_layer_init, tgt_layer_apply

    cfg = TGTConfig(node_width=768, edge_width=256, num_heads=64,
                    model_height=args.layers, triplet_heads=16,
                    triplet_type="attention", source_dropout=0.3,
                    drop_path=0.2, node_act_dropout=0.1,
                    edge_act_dropout=0.1, compute_dtype="bfloat16",
                    remat_policy=args.policy)
    dt = jnp.bfloat16
    b, n = args.b, args.n
    rng = jax.random.PRNGKey(0)
    one_layer = tgt_layer_init(rng, cfg, True, True)
    stacked = jax.tree.map(
        lambda x: jnp.stack([x] * args.layers).astype(dt), one_layer)
    params = jax.tree.map(lambda x: x.astype(dt), one_layer)

    h0 = (jax.random.normal(rng, (b, n, 768)) * 0.5).astype(dt)
    e0 = (jax.random.normal(rng, (b, n, n, 256)) * 0.5).astype(dt)
    mask = jnp.zeros((b, n, n, 1), dt)
    det = not args.stochastic

    def layer(p, g, key):
        return tgt_layer_apply(p, g, cfg, node_update=True, edge_update=True,
                               drop_path_rate=0.1, deterministic=det,
                               rng=None if det else key)

    from tgt_tpu.models.encoder import _remat_policy
    policy = _remat_policy(cfg)

    def loss(ps, h, e, key):
        g = Graph(h=h, e=e, mask=mask, node_mask=jnp.ones((b, n), dt))
        keys = jax.random.split(key, args.layers)
        if args.scan:
            def body(carry, xs):
                p, k = xs
                out = layer(p, carry, k)
                return out, None
            if args.remat:
                body = jax.checkpoint(body, policy=policy)
            g, _ = jax.lax.scan(body, g, (ps, keys))
        else:
            fn = layer
            if args.remat:
                fn = jax.checkpoint(fn, policy=policy)
            for i in range(args.layers):
                p = jax.tree.map(lambda x, i=i: x[i], ps)
                g = fn(p, g, keys[i])
        return (jnp.sum(g.e.astype(jnp.float32) ** 2)
                + jnp.sum(g.h.astype(jnp.float32) ** 2)) * 1e-6

    step = jax.jit(jax.value_and_grad(loss))
    t0 = time.time()
    val, _ = step(stacked, h0, e0, jax.random.PRNGKey(1))
    val.block_until_ready()
    print(f"compile {time.time()-t0:.0f}s "
          f"(scan={args.scan} remat={args.remat} stoch={args.stochastic})")
    # two timed passes, report min (first pass of a fresh executable reads
    # ~3x slow through the tunnel — CLAUDE.md measurement rule)
    passes = []
    for p_i in range(2):
        t0 = time.time()
        for i in range(args.steps):
            val, g = step(stacked, h0 * (1 + 1e-3 * (i + p_i)),
                          e0 * (1 + 1e-3 * (i + p_i)), jax.random.PRNGKey(i))
        val.block_until_ready()
        passes.append((time.time() - t0) / args.steps * 1000)
    ms = min(passes)
    print(f"{ms:.2f} ms/step (passes: "
          f"{', '.join(f'{p:.1f}' for p in passes)}) "
          f"for {args.layers} full TGT layers (fwd+bwd)"
          f" -> {ms/args.layers:.2f} ms/layer")
    if args.copies:
        txt = step.lower(stacked, h0, e0,
                         jax.random.PRNGKey(1)).compile().as_text()
        hlo_copy_stats(txt)


if __name__ == "__main__":
    main()
