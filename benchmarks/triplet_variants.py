"""Microbenchmark: alternative XLA spellings of the triplet-attention core.

The round-1 profile (CLAUDE.md) shows the N^3 path taxed by layout copies
(~71ms/step) and elementwise fusions on h-minor (8x-lane-padded) N^3 tensors
(~63ms/step) while the actual matmuls take ~31ms. This harness measures
isolated fwd+bwd of the triplet-attention core at flagship shapes for
different einsum spellings / logits layouts, on the real chip.

Variants:
  v0_current   (b,i,j,k,h) logits, h minor (the production spelling)
  v1_khminor   (b,i,j,h,k) logits, k minor -> softmax over the lane axis
  v2_stacked   in+out directions stacked along the head axis (one einsum
               chain with 2h heads instead of two chains with h)
  v3_stacked_khminor  v1 + v2 combined

Run: python benchmarks/triplet_variants.py [--b 8] [--n 48] [--steps 20]
     [--dtype bf16] [--variants v0_current,v2_stacked,...] [--hlo]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_params(rng, w, h):
    from tgt_tpu.ops.triplet import triplet_attention_init
    return triplet_attention_init(rng, w, h, gated=True)


def spell_v0(p, e, mask, *, num_heads):
    """FROZEN round-1 h-minor (b,i,j,k,h) spelling — the historical baseline
    (the production op has since moved to k-minor; keep this verbatim so the
    comparison stays meaningful)."""
    import jax
    import jax.numpy as jnp
    from tgt_tpu.ops.common import layernorm, linear

    b, n, _, w = e.shape
    h = num_heads
    d = w // h
    scale = d ** -0.5
    e_ln = layernorm(p["tri_ln_e"], e)

    def direction(which, transpose_kv):
        q, k, v, e_b, g_b = _proj(p, e_ln, which, b, n, d, h, scale)
        m = mask
        if transpose_kv:
            k = jnp.swapaxes(k, 1, 2)
            v = jnp.swapaxes(v, 1, 2)
            e_b = jnp.swapaxes(e_b, 1, 2)
            g_b = jnp.swapaxes(g_b, 1, 2)
            m = jnp.swapaxes(mask, 1, 2)
        s = jnp.einsum("bijdh,bjkdh->bijkh", q, k) + (e_b + m)[:, :, None]
        a = jax.nn.softmax(s, axis=3)
        a = a * jax.nn.sigmoid(g_b + m)[:, :, None]
        return jnp.einsum("bijkh,bjkdh->bijdh", a, v)

    va_in = direction("in", False)
    va_out = direction("out", True)
    va = jnp.concatenate([va_in, va_out], axis=-1).reshape(b, n, n, w * 2)
    return linear(p["lin_O"], va)


def spell_prod(p, e, mask, *, num_heads):
    """Whatever ops/triplet.py currently ships."""
    from tgt_tpu.ops.triplet import triplet_attention
    return triplet_attention(p, e, mask, num_heads=num_heads)


def _proj(p, e_ln, which, b, n, d, h, scale):
    import jax.numpy as jnp
    from tgt_tpu.ops.common import linear
    q, k, v = jnp.split(linear(p[f"lin_QKV_{which}"], e_ln), 3, axis=-1)
    q = q.reshape(b, n, n, d, h) * scale
    k = k.reshape(b, n, n, d, h)
    v = v.reshape(b, n, n, d, h)
    e_b, g_b = jnp.split(linear(p[f"lin_EG_{which}"], e_ln), 2, axis=-1)
    return q, k, v, e_b, g_b


def spell_v1(p, e, mask, *, num_heads):
    """(b,i,j,h,k) logits: softmax over the minor (lane) axis."""
    import jax
    import jax.numpy as jnp
    from tgt_tpu.ops.common import layernorm, linear

    b, n, _, w = e.shape
    h = num_heads
    d = w // h
    scale = d ** -0.5
    e_ln = layernorm(p["tri_ln_e"], e)

    def direction(which, transpose_kv):
        q, k, v, e_b, g_b = _proj(p, e_ln, which, b, n, d, h, scale)
        m = mask
        if transpose_kv:
            k = jnp.swapaxes(k, 1, 2)
            v = jnp.swapaxes(v, 1, 2)
            e_b = jnp.swapaxes(e_b, 1, 2)
            g_b = jnp.swapaxes(g_b, 1, 2)
            m = jnp.swapaxes(mask, 1, 2)
        # logits (b, i, j, h, k): k minor
        s = jnp.einsum("bijdh,bjkdh->bijhk", q, k)
        bias = jnp.swapaxes(e_b + m, 2, 3)[:, :, None]      # (b,i,1,h,k)
        gate = jax.nn.sigmoid(jnp.swapaxes(g_b + m, 2, 3))[:, :, None]
        a = jax.nn.softmax(s + bias, axis=-1) * gate
        return jnp.einsum("bijhk,bjkdh->bijdh", a, v)

    va_in = direction("in", False)
    va_out = direction("out", True)
    va = jnp.concatenate([va_in, va_out], axis=-1).reshape(b, n, n, w * 2)
    return linear(p["lin_O"], va)


def _stacked_qkv(p, e_ln, mask, b, n, d, h, scale):
    import jax.numpy as jnp
    q1, k1, v1, e1, g1 = _proj(p, e_ln, "in", b, n, d, h, scale)
    q2, k2, v2, e2, g2 = _proj(p, e_ln, "out", b, n, d, h, scale)
    k2 = jnp.swapaxes(k2, 1, 2)
    v2 = jnp.swapaxes(v2, 1, 2)
    e2 = jnp.swapaxes(e2, 1, 2)
    g2 = jnp.swapaxes(g2, 1, 2)
    m2 = jnp.swapaxes(mask, 1, 2)
    q = jnp.concatenate([q1, q2], axis=-1)               # (b,i,j,d,2h)
    k = jnp.concatenate([k1, k2], axis=-1)
    v = jnp.concatenate([v1, v2], axis=-1)
    e_b = jnp.concatenate([e1 + mask, e2 + m2], axis=-1)  # (b,i,k,2h)
    g_b = jnp.concatenate([g1 + mask, g2 + m2], axis=-1)
    return q, k, v, e_b, g_b


def spell_v2(p, e, mask, *, num_heads):
    """One einsum chain with both directions stacked along heads."""
    import jax
    import jax.numpy as jnp
    from tgt_tpu.ops.common import layernorm, linear

    b, n, _, w = e.shape
    h = num_heads
    d = w // h
    scale = d ** -0.5
    e_ln = layernorm(p["tri_ln_e"], e)
    q, k, v, e_b, g_b = _stacked_qkv(p, e_ln, mask, b, n, d, h, scale)

    s = jnp.einsum("bijdh,bjkdh->bijkh", q, k) + e_b[:, :, None]
    a = jax.nn.softmax(s, axis=3) * jax.nn.sigmoid(g_b)[:, :, None]
    va = jnp.einsum("bijkh,bjkdh->bijdh", a, v)           # (b,i,j,d,2h)
    va_in, va_out = jnp.split(va, 2, axis=-1)
    va = jnp.concatenate([va_in, va_out], axis=-1).reshape(b, n, n, w * 2)
    return linear(p["lin_O"], va)


def spell_v3(p, e, mask, *, num_heads):
    """Stacked directions + k-minor logits."""
    import jax
    import jax.numpy as jnp
    from tgt_tpu.ops.common import layernorm, linear

    b, n, _, w = e.shape
    h = num_heads
    d = w // h
    scale = d ** -0.5
    e_ln = layernorm(p["tri_ln_e"], e)
    q, k, v, e_b, g_b = _stacked_qkv(p, e_ln, mask, b, n, d, h, scale)

    s = jnp.einsum("bijdh,bjkdh->bijhk", q, k)
    bias = jnp.swapaxes(e_b, 2, 3)[:, :, None]            # (b,i,1,2h,k)
    gate = jax.nn.sigmoid(jnp.swapaxes(g_b, 2, 3))[:, :, None]
    a = jax.nn.softmax(s + bias, axis=-1) * gate
    va = jnp.einsum("bijhk,bjkdh->bijdh", a, v)
    va_in, va_out = jnp.split(va, 2, axis=-1)
    va = jnp.concatenate([va_in, va_out], axis=-1).reshape(b, n, n, w * 2)
    return linear(p["lin_O"], va)


def spell_v4(p, e, mask, *, num_heads):
    """k-minor + lin_O split per direction: out = va_in·W_in + va_out·W_out
    + b, contracting (d,h) straight out of the AV einsum — removes the
    concat+reshape relayout copies the HLO forensics found hottest."""
    import jax
    import jax.numpy as jnp
    from tgt_tpu.ops.common import layernorm, linear

    b, n, _, w = e.shape
    h = num_heads
    d = w // h
    scale = d ** -0.5
    e_ln = layernorm(p["tri_ln_e"], e)

    # lin_O consumes concat([va_in, va_out], axis=h).reshape(..., 2w):
    # its rows are indexed (d, 2h) with h<num_heads -> in direction
    w_o = p["lin_O"]["w"].reshape(d, 2 * h, w)
    w_in = w_o[:, :h]
    w_out = w_o[:, h:]

    def direction(which, transpose_kv, w_dir):
        q, k, v, e_b, g_b = _proj(p, e_ln, which, b, n, d, h, scale)
        m = mask
        if transpose_kv:
            k = jnp.swapaxes(k, 1, 2)
            v = jnp.swapaxes(v, 1, 2)
            e_b = jnp.swapaxes(e_b, 1, 2)
            g_b = jnp.swapaxes(g_b, 1, 2)
            m = jnp.swapaxes(mask, 1, 2)
        s = jnp.einsum("bijdh,bjkdh->bijhk", q, k)
        bias = jnp.swapaxes(e_b + m, 2, 3)[:, :, None]
        gate = jax.nn.sigmoid(jnp.swapaxes(g_b + m, 2, 3))[:, :, None]
        a = jax.nn.softmax(s + bias, axis=-1) * gate
        va = jnp.einsum("bijhk,bjkdh->bijdh", a, v)
        return jnp.einsum("bijdh,dhw->bijw", va, w_dir)

    out = direction("in", False, w_in) + direction("out", True, w_out)
    return out + p["lin_O"]["b"]


def spell_v5(p, e, mask, *, num_heads):
    """Native dot_general orders end-to-end: carry the N^3 logits as
    (b,j,h,i,k) — exactly the order XLA's dot_general produces for
    "bijdh,bjkdh" (batch dims (b,j,h) first, then lhs-free i, rhs-free k) —
    so no transpose is inserted after QK, softmax, AV, or the split lin_O.
    Both directions come out pair-transposed (b,j,i,w); one N^2-channel
    transpose at the very end restores (b,i,j,w)."""
    import jax
    import jax.numpy as jnp
    from tgt_tpu.ops.common import layernorm

    b, n, _, w = e.shape
    h = num_heads
    d = w // h
    scale = d ** -0.5
    e_ln = layernorm(p["tri_ln_e"], e)

    w_o = p["lin_O"]["w"].astype(e.dtype).reshape(d, 2 * h, w)
    w_in = w_o[:, :h]
    w_out = w_o[:, h:]

    def direction(which, transpose_kv, w_dir):
        q, k, v, e_b, g_b = _proj(p, e_ln, which, b, n, d, h, scale)
        m = mask
        if transpose_kv:
            k = jnp.swapaxes(k, 1, 2)
            v = jnp.swapaxes(v, 1, 2)
            e_b = jnp.swapaxes(e_b, 1, 2)
            g_b = jnp.swapaxes(g_b, 1, 2)
            m = jnp.swapaxes(mask, 1, 2)
        # bias/gate live on (b,i,k,h): bring to (b,1,h,i,k) — N^2, cheap
        bias = jnp.transpose(e_b + m, (0, 3, 1, 2))[:, None]
        gate = jax.nn.sigmoid(jnp.transpose(g_b + m, (0, 3, 1, 2)))[:, None]
        s = jnp.einsum("bijdh,bjkdh->bjhik", q, k) + bias
        a = jax.nn.softmax(s, axis=-1) * gate
        va = jnp.einsum("bjhik,bjkdh->bjhid", a, v)
        return jnp.einsum("bjhid,dhw->bjiw", va, w_dir)

    out_t = direction("in", False, w_in) + direction("out", True, w_out)
    return jnp.swapaxes(out_t, 1, 2) + p["lin_O"]["b"].astype(e.dtype)


def spell_v6(p, e, mask, *, num_heads):
    """v5 + pair-transposes folded into the einsum SUBSCRIPTS: the out
    direction reads k/v as "bkjdh" directly instead of materializing
    swapaxes(k/v, 1, 2) (two 9.4MB relayout copies per layer in v5's HLO,
    benchmarks/layer_forensics.py), and bias/gate use one composed perm
    (0,3,2,1). Lets XLA's layout assignment fold the transpose into the
    operand layout it was going to pick anyway."""
    import jax
    import jax.numpy as jnp
    from tgt_tpu.ops.common import layernorm

    b, n, _, w = e.shape
    h = num_heads
    d = w // h
    scale = d ** -0.5
    e_ln = layernorm(p["tri_ln_e"], e)

    w_o = p["lin_O"]["w"].astype(e.dtype).reshape(d, 2 * h, w)

    def direction(which, transpose_pair, w_dir):
        q, k, v, e_b, g_b = _proj(p, e_ln, which, b, n, d, h, scale)
        if transpose_pair:
            perm = (0, 3, 2, 1)     # (b,i,k,h) -> (b,h,i,k) + pair-swap
            qk, av = "bijdh,bkjdh->bjhik", "bjhik,bkjdh->bjhid"
            m = jnp.transpose(mask, perm)
        else:
            perm = (0, 3, 1, 2)
            qk, av = "bijdh,bjkdh->bjhik", "bjhik,bjkdh->bjhid"
            m = jnp.transpose(mask, perm)
        bias = (jnp.transpose(e_b, perm) + m)[:, None]
        gate = jax.nn.sigmoid(jnp.transpose(g_b, perm) + m)[:, None]
        s = jnp.einsum(qk, q, k) + bias
        a = jax.nn.softmax(s, axis=-1) * gate
        va = jnp.einsum(av, a, v)
        return jnp.einsum("bjhid,dhw->bjiw", va, w_dir)

    out_t = (direction("in", False, w_o[:, :h])
             + direction("out", True, w_o[:, h:]))
    return jnp.swapaxes(out_t, 1, 2) + p["lin_O"]["b"].astype(e.dtype)


def spell_dense(p, e, mask, *, num_heads):
    """Round-3 lane-dense fused Mosaic kernel (ops/pallas/triplet_dense.py):
    the whole N^3 chain in VMEM, zero N^3 HBM traffic."""
    import jax
    from tgt_tpu.ops.pallas.triplet_dense import triplet_attention_dense
    return triplet_attention_dense(p, e, mask, num_heads=num_heads,
                                   gated=True,
                                   interpret=jax.default_backend() == "cpu")


SPELLS = {"v0_hminor": spell_v0, "v1_khminor": spell_v1,
          "v2_stacked": spell_v2, "v3_stacked_khminor": spell_v3,
          "v4_split_linO": spell_v4, "v5_native_dot": spell_v5,
          "v6_folded_T": spell_v6, "dense_kernel": spell_dense,
          "prod": spell_prod}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=8)
    ap.add_argument("--n", type=int, default=48)
    ap.add_argument("--w", type=int, default=256)
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--layers", type=int, default=4,
                    help="apply the op this many times per step (amortizes "
                         "dispatch overhead like the real 24-layer stack)")
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    ap.add_argument("--variants", default="v0_hminor,v1_khminor,v4_split_linO")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--hlo", action="store_true",
                    help="print compiled HLO op-name histogram per variant")
    ap.add_argument("--check", action="store_true",
                    help="verify numerics vs v0 before timing")
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
            v_ref = spell_v0(params, e_pool[0], mask, num_heads=h)
            v_new = fn(params, e_pool[0], mask, num_heads=h)
            err = float(jnp.max(jnp.abs(v_ref.astype(jnp.float32)
                                        - v_new.astype(jnp.float32))))
            print(f"{name}: max|err| vs v0 = {err:.3e}", flush=True)

        t0 = time.time()
        val, _ = step(params, e_pool[0])
        val.block_until_ready()
        compile_s = time.time() - t0

        # Two timed passes, report the best: the FIRST timed pass of a fresh
        # executable through the tunnel reads ~3x slow (observed v0=71ms /
        # v1-when-first=69.6ms vs the same variants at ~22-24ms when timed
        # later in the process) — warm each executable thoroughly before
        # trusting a number.
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

        if args.hlo:
            import collections
            txt = step.lower(params, e_pool[0]).compile().as_text()
            ops = collections.Counter()
            for line in txt.splitlines():
                ls = line.strip()
                for key in ("fusion", "copy", "convolution", "dot",
                            "transpose", "bitcast"):
                    if ls.startswith(f"%{key}") or f" = " in ls and (
                            f" {key}(" in ls or ls.split("=")[-1].strip()
                            .startswith(key)):
                        ops[key] += 1
                        break
            print(f"  HLO ops: {dict(ops)}", flush=True)

    base = results.get("v0_hminor")
    if base:
        for k, v in results.items():
            print(f"{k}: {base / v:.2f}x vs v0", flush=True)


if __name__ == "__main__":
    main()
