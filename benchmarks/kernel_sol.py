"""Per-kernel speed-of-light benchmark (BASELINE.md last target row).

Isolates the three hot kernels at flagship TGT-At geometry (node 768,
edge 256, 64 attn heads, 16 triplet heads, b=8, N=48) and reports each
against the chip's roofline:

  1. SDDMM-style gated attention  (ops/attention.py::egt_attention;
     reference lib/tgt/layers/layers.py:15-86)
  2. O(N^3) triplet attention     (ops/triplet.py::triplet_attention;
     reference lib/tgt/layers/triplet.py)
  3. gated edge update            (ops/attention.py::edge_update;
     reference lib/tgt/layers/layers.py:87-130)

For each kernel we compute ANALYTIC matmul FLOPs and the ALGORITHMIC
minimum HBM bytes (inputs + outputs + params once — every intermediate
assumed fused/in-VMEM), giving the speed-of-light time

    t_sol = max(flops / peak_flops, min_bytes / peak_hbm_bw)

and report measured-ms, sol-ms, and pct_sol = t_sol / t_measured. This is
the honest per-kernel analog of bench.py's whole-step roofline: pct_sol
is an upper bound on remaining headroom (XLA may move more than the
algorithmic minimum, but never needs less).

Measurement rules per CLAUDE.md: inputs vary per step, work is
dependency-chained, two timed passes, report min. `--layers` chains the
kernel serially to amortize the ~3-7 ms tunnel dispatch overhead.

Run: python benchmarks/kernel_sol.py [--b 8] [--n 48] [--steps 20]
     [--layers 8] [--grad] [--cpu] [--json]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NODE_W, EDGE_W, N_HEADS, T_HEADS = 768, 256, 64, 16

# public chip specs; keep in sync with bench.py's peak_tflops
PEAKS = {  # device_kind prefix -> (bf16 TFLOP/s, HBM GB/s)
    "TPU v5 lite": (197.0, 819.0),
    "TPU v5": (459.0, 1638.0),
    "TPU v4": (275.0, 1228.0),
    "TPU v6 lite": (918.0, 1640.0),
}


def chip_peaks(device):
    kind = getattr(device, "device_kind", "")
    for prefix in sorted(PEAKS, key=len, reverse=True):
        if kind.startswith(prefix):
            return PEAKS[prefix]
    return (197.0, 819.0)  # v5e default; CPU runs are code-path checks only


def attention_spec(b, n):
    """egt_attention: flops + min bytes (bf16=2B elements)."""
    f = 2 * b * n * NODE_W * 3 * NODE_W          # lin_QKV
    f += 2 * b * n * n * EDGE_W * 2 * N_HEADS    # lin_EG
    f += 2 * b * n * n * NODE_W                  # QK^T over (d,h)=768
    f += 2 * b * n * n * NODE_W                  # AV
    f += 2 * b * n * NODE_W * NODE_W             # lin_O_h
    f += 2 * b * n * n * N_HEADS * EDGE_W        # lin_O_e
    params = (NODE_W * 3 * NODE_W + EDGE_W * 2 * N_HEADS
              + NODE_W * NODE_W + N_HEADS * EDGE_W)
    io = b * n * NODE_W * 2 + b * n * n * EDGE_W * 2  # read h,e + write h,e
    return f, 2 * (io + params)


def triplet_spec(b, n):
    """triplet_attention (both directions), w=256 h=16."""
    w, h = EDGE_W, T_HEADS
    f = 2 * (2 * b * n * n * w * 3 * w)          # lin_QKV_{in,out}
    f += 2 * (2 * b * n * n * w * 2 * h)         # lin_EG_{in,out}
    f += 2 * (2 * b * n ** 3 * w)                # QK einsum per direction
    f += 2 * (2 * b * n ** 3 * w)                # AV einsum per direction
    f += 2 * b * n * n * 2 * w * w               # lin_O (2w -> w)
    params = 2 * (w * 3 * w + w * 2 * h) + 2 * w * w
    io = 2 * b * n * n * w                        # read e + write out
    return f, 2 * (io + params)


def edge_update_spec(b, n):
    f = 2 * b * n * NODE_W * 2 * NODE_W          # lin_QK
    f += 2 * b * n * n * EDGE_W * N_HEADS        # lin_E
    f += 2 * b * n * n * NODE_W                  # QK^T
    f += 2 * b * n * n * N_HEADS * EDGE_W        # lin_O_e
    params = (NODE_W * 2 * NODE_W + EDGE_W * N_HEADS + N_HEADS * EDGE_W)
    io = b * n * NODE_W + b * n * n * EDGE_W * 2  # read h,e + write e
    return f, 2 * (io + params)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=8)
    ap.add_argument("--n", type=int, default=48)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--grad", action="store_true",
                    help="time fwd+bwd instead of fwd (flops scaled 3x)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--dense", action="store_true",
                    help="time the promoted lane-dense Mosaic kernel for "
                         "the triplet entry instead of the jnp/XLA path")
    ap.add_argument("--json", action="store_true",
                    help="emit one JSON line per kernel")
    args = ap.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    import jax.numpy as jnp
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from tgt_tpu.ops.attention import (edge_update, edge_update_init,
                                       egt_attention, egt_attention_init)
    from tgt_tpu.ops.triplet import triplet_attention, triplet_attention_init

    b, n = args.b, args.n
    dt = jnp.bfloat16
    rng = jax.random.PRNGKey(0)
    cast = lambda t: jax.tree.map(lambda x: x.astype(dt), t)

    pool = 4
    h_pool = (jax.random.normal(rng, (pool, b, n, NODE_W)) * 0.5).astype(dt)
    e_pool = (jax.random.normal(rng, (pool, b, n, n, EDGE_W)) * 0.5).astype(dt)
    mask = jnp.zeros((b, n, n, 1), dt)

    p_att = cast(egt_attention_init(rng, NODE_W, EDGE_W, N_HEADS))
    p_tri = cast(triplet_attention_init(rng, EDGE_W, T_HEADS, gated=True))
    p_eu = cast(edge_update_init(rng, NODE_W, EDGE_W, N_HEADS))

    def att_layer(p, h, e):
        dh, de = egt_attention(p, h, e, mask, num_heads=N_HEADS)
        return h + dh, e + de

    if args.dense:
        from tgt_tpu.ops.pallas.triplet_dense import triplet_attention_dense

        def tri_layer(p, e):
            return e + triplet_attention_dense(p, e, mask, num_heads=T_HEADS)
    else:
        def tri_layer(p, e):
            return e + triplet_attention(p, e, mask, num_heads=T_HEADS)

    def eu_layer(p, h, e):
        _, de = edge_update(p, h, e, mask, num_heads=N_HEADS)
        return e + de

    kernels = {
        "sddmm_attention": (
            p_att, attention_spec(b, n),
            lambda p, h, e: _chain2(att_layer, p, h, e, args.layers)),
        "triplet_o_n3": (
            p_tri, triplet_spec(b, n),
            lambda p, h, e: _chain1(tri_layer, p, e, args.layers)),
        "gated_edge_update": (
            p_eu, edge_update_spec(b, n),
            lambda p, h, e: _chain1(lambda q, e_: eu_layer(q, h, e_),
                                    p, e, args.layers)),
    }

    peak_tf, peak_gbps = chip_peaks(jax.devices()[0])
    flop_mult = 3.0 if args.grad else 1.0  # bwd ~2x fwd matmul flops

    for name, (p, (flops1, bytes1), body) in kernels.items():
        flops = flops1 * args.layers * flop_mult
        # chained layers re-read/write the residual each layer; params once
        min_bytes = bytes1 * args.layers

        if args.grad:
            def run(p, h, e, _body=body):
                return sum(jnp.sum(x.astype(jnp.float32) ** 2)
                           for x in jax.tree.leaves(_body(p, h, e))) * 1e-6
            step = jax.jit(jax.grad(run))
        else:
            step = jax.jit(body)
        out_of = lambda r: jax.tree.leaves(r)[0]

        t0 = time.time()
        out_of(step(p, h_pool[0], e_pool[0])).block_until_ready()
        compile_s = time.time() - t0

        passes = []
        for p_i in range(2):
            t0 = time.time()
            r = None
            for i in range(args.steps):
                scale = 1.0 + 1e-3 * (i + p_i)
                r = step(p, h_pool[i % pool] * scale, e_pool[i % pool] * scale)
            out_of(r).block_until_ready()
            passes.append((time.time() - t0) / args.steps * 1000)
        meas_ms = min(passes)

        t_flops_ms = flops / (peak_tf * 1e12) * 1e3
        t_mem_ms = min_bytes / (peak_gbps * 1e9) * 1e3
        sol_ms = max(t_flops_ms, t_mem_ms)
        bound = "compute" if t_flops_ms >= t_mem_ms else "memory"
        rec = {
            "kernel": name, "b": b, "n": n, "layers": args.layers,
            "mode": "fwd+bwd" if args.grad else "fwd",
            "measured_ms": round(meas_ms, 3),
            "passes_ms": [round(x, 3) for x in passes],
            "sol_ms": round(sol_ms, 4), "sol_bound": bound,
            "pct_sol": round(100 * sol_ms / meas_ms, 1),
            "gflops": round(flops / 1e9, 2),
            "min_mbytes": round(min_bytes / 1e6, 2),
            "achieved_tflops": round(flops / (meas_ms / 1e3) / 1e12, 2),
            "compile_s": round(compile_s, 1),
            "device": str(jax.devices()[0]),
        }
        print(json.dumps(rec) if args.json else
              f"{name}: {meas_ms:.3f} ms measured vs {sol_ms:.4f} ms SoL "
              f"({bound}-bound) = {rec['pct_sol']}% of speed-of-light "
              f"[{rec['achieved_tflops']} TF/s, passes "
              f"{', '.join(f'{x:.2f}' for x in passes)}]", flush=True)


def _chain1(layer, p, e, nlayers):
    out = e
    for _ in range(nlayers):
        out = layer(p, out)
    return out


def _chain2(layer, p, h, e, nlayers):
    for _ in range(nlayers):
        h, e = layer(p, h, e)
    return h, e  # both channels stay live (jit materializes all outputs)


if __name__ == "__main__":
    main()
