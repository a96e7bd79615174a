"""Microbenchmark: alternative XLA spellings of the triplet-AGGREGATE core.

Same methodology as triplet_variants.py (which targets the attention
variant): isolated fwd+bwd of the gated-aggregate core at TGT-Ag flagship
shapes, comparing the production spelling against a native-dot-order
spelling that carries every tensor in the order XLA's dot_general emits:

  va = "bikh,bjkdh->bijdh" has batch dims (b,h), contract k, lhs-free i,
  rhs-free (j,d) -> native output (b,h,i,j,d). Producing the attention map
  a directly in (b,h,i,k) (one cheap N^2 transpose of the N^2 logits,
  softmax over the LANE axis) and contracting lin_O as
  "bhijd,dhw->bijw" (native output (b,i,j,w) -- no final transpose at all)
  leaves no relayout copy on the N^3 path.

Run: python benchmarks/aggregate_variants.py [--b 8] [--n 48] [--steps 20]
     [--variants prod,v1_native] [--check] [--cpu]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_params(rng, w, h):
    from tgt_tpu.ops.triplet import triplet_aggregate_init
    return triplet_aggregate_init(rng, w, h, gated=True)


def spell_prod(p, e, mask, *, num_heads):
    """Whatever ops/triplet.py currently ships."""
    from tgt_tpu.ops.triplet import triplet_aggregate
    return triplet_aggregate(p, e, mask, num_heads=num_heads)


def spell_v1_native(p, e, mask, *, num_heads):
    """Native dot-order end-to-end (see module docstring)."""
    import jax
    import jax.numpy as jnp
    from tgt_tpu.ops.common import layernorm, linear

    b, n, _, w = e.shape
    h = num_heads
    d = w // h
    e_ln = layernorm(p["tri_ln_e"], e)

    v_in, v_out = jnp.split(linear(p["lin_V"], e_ln), 2, axis=-1)
    e_in, g_in, e_out, g_out = jnp.split(linear(p["lin_EG"], e_ln), 4, axis=-1)
    v_in = v_in.reshape(b, n, n, d, h)
    v_out = v_out.reshape(b, n, n, d, h)

    w_o = p["lin_O"]["w"].astype(e.dtype).reshape(d, 2 * h, w)

    def direction(e_l, g_l, v, transpose_pair, masked, w_dir):
        if transpose_pair:
            # logits/gates indexed (k,i) in the reference out-direction:
            # bring (b,i,k,h) -> (b,h,i,k) AND pair-transpose in one go
            perm = (0, 3, 2, 1)
            v = jnp.swapaxes(v, 1, 2)
        else:
            perm = (0, 3, 1, 2)
        m = jnp.transpose(mask, perm) if masked else 0.0
        logits = jnp.transpose(e_l, perm)
        a = jax.nn.softmax(logits + m, axis=-1)   # over k, the lane axis
        a = a * jax.nn.sigmoid(jnp.transpose(g_l, perm) + m)
        va = jnp.einsum("bhik,bjkdh->bhijd", a, v)
        return jnp.einsum("bhijd,dhw->bijw", va, w_dir)

    # gated-aggregate reference quirk: out-direction unmasked
    out = (direction(e_in, g_in, v_in, False, True, w_o[:, :h])
           + direction(e_out, g_out, v_out, True, False, w_o[:, h:]))
    return out + p["lin_O"]["b"].astype(e.dtype)


def spell_dense(p, e, mask, *, num_heads):
    """Round-3 lane-dense fused aggregation kernel (triplet_dense.py)."""
    import jax
    from tgt_tpu.ops.pallas.triplet_dense import triplet_aggregate_dense
    return triplet_aggregate_dense(p, e, mask, num_heads=num_heads,
                                   gated=True,
                                   interpret=jax.default_backend() == "cpu")


SPELLS = {"prod": spell_prod, "v1_native": spell_v1_native,
          "dense_kernel": spell_dense}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=8)
    ap.add_argument("--n", type=int, default=48)
    ap.add_argument("--w", type=int, default=256)
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    ap.add_argument("--variants", default="prod,v1_native")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    import jax.numpy as jnp
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    b, n, w, h = args.b, args.n, args.w, args.heads
    rng = jax.random.PRNGKey(0)
    params = jax.tree.map(lambda x: x.astype(dtype), make_params(rng, w, h))
    pool = 4
    e_pool = (jax.random.normal(rng, (pool, b, n, n, w)) * 0.5).astype(dtype)
    mask = jnp.zeros((b, n, n, 1), dtype)

    results = {}
    for name in args.variants.split(","):
        fn = SPELLS[name]

        def loss(p, e):
            out = e
            for _ in range(args.layers):
                out = out + fn(p, out, mask, num_heads=h)
            return jnp.sum(out.astype(jnp.float32) ** 2) * 1e-6

        step = jax.jit(jax.value_and_grad(loss))
        if args.check:
            v_ref = spell_prod(params, e_pool[0], mask, num_heads=h)
            v_new = fn(params, e_pool[0], mask, num_heads=h)
            err = float(jnp.max(jnp.abs(v_ref.astype(jnp.float32)
                                        - v_new.astype(jnp.float32))))
            print(f"{name}: max|err| vs prod = {err:.3e}", flush=True)

        t0 = time.time()
        val, _ = step(params, e_pool[0])
        val.block_until_ready()
        compile_s = time.time() - t0

        # two timed passes, report min (tunnel first-pass rule, CLAUDE.md)
        passes = []
        for p_i in range(2):
            t0 = time.time()
            for i in range(args.steps):
                val, g = step(params, e_pool[i % pool]
                              * (1.0 + 1e-3 * (i + p_i)))
            val.block_until_ready()
            passes.append((time.time() - t0) / args.steps * 1000)
        dt = min(passes)
        results[name] = dt
        print(f"{name}: {dt:.2f} ms/step (passes: "
              f"{', '.join(f'{p:.1f}' for p in passes)}) "
              f"(x{args.layers} layers, fwd+bwd), compile {compile_s:.0f}s",
              flush=True)

    base = results.get("prod")
    if base:
        for k, v in results.items():
            print(f"{k}: {base / v:.2f}x vs prod")


if __name__ == "__main__":
    main()
