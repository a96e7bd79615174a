"""Cycle-level attribution of the lane-dense triplet kernel (round 5).

VERDICT r4 item 1: before building a second-generation kernel, measure where
the time inside ops/pallas/triplet_dense.py actually goes. Each variant
ABLATES one component of the forward kernel (keeping everything else,
guarding against Mosaic DCE by consuming ablated buffers through cheap VPU
adds), so `full - variant` isolates that component's cost on the real chip:

  full           the production forward kernel body (reference point)
  minus_builds   kbig/vbig read pre-built from HBM inputs instead of the
                 per-j brep+mask VMEM build  -> build cost
  minus_mm       QK/AV MXU products replaced by slice-adds that still
                 consume the built operands  -> matmul cost
  minus_softmax  segmax rolls + exp + denominator dot + recip + gate
                 skipped (a = s)             -> softmax-chain cost
  g2_headsplit   the candidate second-gen design: grid split into G=2
                 head-groups of 8 so every matmul runs at depth 128 /
                 half cols (2x fewer MXU chunk passes), same h-minor
                 roll-softmax layout (n*hg=384, d*hg=128 lanes, 128-dense)
  g2_densebias   g2 + bias/gate pre-broadcast: not a variant here (bias is
                 already per-(i,(k,h)) and shared across j) — placeholder
                 documented for the table

Run (real TPU): python benchmarks/kernel_anatomy.py [--b 8] [--n 48]
                [--layers 8] [--steps 20] [--variants ...]
CPU check:      python benchmarks/kernel_anatomy.py --cpu --check
"""
import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_variant(name, *, b, n, d, h, jblk, dtype, interpret):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from tgt_tpu.ops.pallas.triplet_dense import (_brep, _hmask, _sel, _seg_max,
                                                  _dot)

    dh, kh = d * h, n * h

    def fwd_body(qp, kfl, vp, biasp, gatep, kbig, vbig, *, mm=True,
                 softmax=True, heads=h, lanes_k=kh, lanes_d=dh,
                 rowmax=False, hoisted_g=None):
        """One j-iteration of the forward math; kbig/vbig may be pre-built."""
        if mm:
            s = _dot(qp, kbig, dtype) + biasp
        else:
            # consume the built operand without the MXU (one VPU pass)
            s = biasp + kbig[0:n] * 1e-30
        g = (jax.nn.sigmoid(gatep) if hoisted_g is None else hoisted_g)
        if softmax:
            if rowmax:
                # softmax is shift-invariant per (i,h) group for any
                # constant over k; a per-ROW max (over all lanes) is such a
                # constant and costs one lane-reduce instead of the
                # log2(n) roll-doubling passes
                m = jnp.max(s, axis=1, keepdims=True)
            else:
                m = _seg_max(s, heads, n)
            p = jnp.exp(s - m)
            recip = 1.0 / _dot(p, _sel(lanes_k, heads, dtype), dtype)
            a = p * g
        else:
            recip = None
            a = s * g
        if mm:
            va = _dot(a, vbig, dtype)
        else:
            va = a[:, 0:lanes_d] + vbig[0:n] * 1e-30
        if softmax:
            va = va * pltpu.repeat(recip, lanes_d // heads, axis=1)
        return va

    def make_kernel(build=True, mm=True, softmax=True, heads=h,
                    lanes_k=kh, lanes_d=dh, rowmax=False, hoist_g=False):
        av_mask_shape = (lanes_k, lanes_d)

        def kernel(qp_ref, kfl_ref, vp_ref, biasp_ref, gatep_ref,
                   kbig_ref, vbig_ref, va_ref):
            biasp = biasp_ref[0].astype(jnp.float32)
            gatep = gatep_ref[0].astype(jnp.float32)
            g_h = jax.nn.sigmoid(gatep) if hoist_g else None
            qk_mask = _hmask(lanes_d, lanes_k, heads, dtype)
            av_mask = _hmask(*av_mask_shape, heads, dtype)

            def body(j, _):
                if build:
                    kbig = _brep(kfl_ref[0, j], heads) * qk_mask
                    vbig = _brep(vp_ref[0, j], heads) * av_mask
                else:
                    kbig = kbig_ref[0].astype(dtype)
                    vbig = vbig_ref[0].astype(dtype)
                va = fwd_body(qp_ref[0, j], kfl_ref[0, j], vp_ref[0, j],
                              biasp, gatep, kbig, vbig, mm=mm,
                              softmax=softmax, heads=heads,
                              lanes_k=lanes_k, lanes_d=lanes_d,
                              rowmax=rowmax, hoisted_g=g_h)
                va_ref[0, j] = va.astype(va_ref.dtype)
                return 0

            jax.lax.fori_loop(0, qp_ref.shape[1], body, 0)

        return kernel

    nj = n  # no j padding at n=48
    blk = pl.BlockSpec((1, jblk, n, dh), lambda bb, jc: (bb, jc, 0, 0))
    kfl_blk = pl.BlockSpec((1, jblk, d, kh), lambda bb, jc: (bb, jc, 0, 0))
    bias_blk = pl.BlockSpec((1, n, kh), lambda bb, jc: (bb, 0, 0))
    kbig_blk = pl.BlockSpec((1, dh, kh), lambda bb, jc: (bb, 0, 0))
    vbig_blk = pl.BlockSpec((1, kh, dh), lambda bb, jc: (bb, 0, 0))
    grid = (b, nj // jblk)

    def call(kernel, extra_specs_override=None):
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[blk, kfl_blk, blk, bias_blk, bias_blk,
                      kbig_blk, vbig_blk],
            out_specs=blk,
            out_shape=jax.ShapeDtypeStruct((b, nj, n, dh), dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel")),
            interpret=interpret,
        )

    if name == "full":
        return call(make_kernel(build=True)), None
    if name == "minus_builds":
        return call(make_kernel(build=False)), None
    if name == "minus_mm":
        return call(make_kernel(build=True, mm=False)), None
    if name == "minus_softmax":
        return call(make_kernel(build=True, softmax=False)), None
    if name == "opt_hoistg":
        return call(make_kernel(hoist_g=True)), None
    if name == "opt_rowmax":
        return call(make_kernel(rowmax=True)), None
    if name == "opt_both":
        return call(make_kernel(rowmax=True, hoist_g=True)), None
    if name == "prod":
        # whatever ops/pallas/triplet_dense.py currently ships (its own
        # adaptive j-block; extra args accepted-and-ignored so the caller's
        # uniform input tuple works). The frozen variants above are the
        # round-5 bodies — keep comparing against THIS to track drift.
        from tgt_tpu.ops.pallas.triplet_dense import _call_fwd, _jpad

        def prod_fn(qp, kfl, vp, biasp, gatep, *_unused):
            # _call_fwd assumes a JBLK-padded j axis (the public entries
            # pad before calling it) — mirror that here or non-multiple
            # --n values would silently skip trailing j rows
            import jax.numpy as jnp
            njp = _jpad(qp.shape[1])
            if njp != qp.shape[1]:
                pj = ((0, 0), (0, njp - qp.shape[1]), (0, 0), (0, 0))
                qp, kfl, vp = (jnp.pad(x, pj) for x in (qp, kfl, vp))
            return _call_fwd(qp, kfl, vp, biasp, gatep, gated=True,
                             interpret=interpret)[:, :n]

        return prod_fn, None
    if name == "g2_headsplit":
        # two head-groups of hg=8: panels sliced per group on the XLA side,
        # grid grows a G axis; lanes stay 128-dense (n*hg=384, d*hg=128)
        g = 2
        hg = h // g
        khg, dhg = n * hg, d * hg
        if khg % 128 or dhg % 128:
            raise ValueError("head-split needs 128-dense half lanes")
        blk_g = pl.BlockSpec((1, None, jblk, n, dhg),
                             lambda bb, gg, jc: (bb, gg, jc, 0, 0))
        kfl_g = pl.BlockSpec((1, None, jblk, d, khg),
                             lambda bb, gg, jc: (bb, gg, jc, 0, 0))
        bias_g = pl.BlockSpec((1, None, n, khg),
                              lambda bb, gg, jc: (bb, gg, 0, 0))
        kern = make_kernel(build=True, heads=hg, lanes_k=khg, lanes_d=dhg)

        def kernel_g(qp_ref, kfl_ref, vp_ref, biasp_ref, gatep_ref, va_ref):
            import jax.numpy as jnp
            biasp = biasp_ref[0].astype(jnp.float32)
            gatep = gatep_ref[0].astype(jnp.float32)
            qk_mask = _hmask(dhg, khg, hg, dtype)
            av_mask = _hmask(khg, dhg, hg, dtype)

            def body(j, _):
                kbig = _brep(kfl_ref[0, j], hg) * qk_mask
                vbig = _brep(vp_ref[0, j], hg) * av_mask
                va = fwd_body(qp_ref[0, j], kfl_ref[0, j],
                              vp_ref[0, j], biasp, gatep, kbig, vbig,
                              heads=hg, lanes_k=khg, lanes_d=dhg)
                va_ref[0, j] = va.astype(va_ref.dtype)
                return 0

            jax.lax.fori_loop(0, qp_ref.shape[1], body, 0)

        del kern
        fn = pl.pallas_call(
            kernel_g,
            grid=(b, g, nj // jblk),
            in_specs=[blk_g, kfl_g, blk_g, bias_g, bias_g],
            out_specs=blk_g,
            out_shape=jax.ShapeDtypeStruct((b, g, nj, n, dhg), dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "parallel")),
            interpret=interpret,
        )
        return fn, g
    raise KeyError(name)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=8)
    ap.add_argument("--n", type=int, default=48)
    ap.add_argument("--d", type=int, default=16)
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--jblk", type=int, default=16)
    ap.add_argument("--layers", type=int, default=8,
                    help="sequential chained calls per step")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--variants",
                    default="full,minus_builds,minus_mm,minus_softmax,"
                            "g2_headsplit")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--check", action="store_true",
                    help="verify full/g2 numerics against each other")
    args = ap.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    import jax.numpy as jnp
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    interpret = jax.default_backend() != "tpu"

    b, n, d, h = args.b, args.n, args.d, args.heads
    dh, kh = d * h, n * h
    dtype = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    qp = (jax.random.normal(ks[0], (b, n, n, dh)) * 0.3).astype(dtype)
    kfl = (jax.random.normal(ks[1], (b, n, d, kh)) * 0.3).astype(dtype)
    vp = (jax.random.normal(ks[2], (b, n, n, dh)) * 0.3).astype(dtype)
    biasp = (jax.random.normal(ks[3], (b, n, kh)) * 0.3).astype(jnp.float32)
    gatep = (jax.random.normal(ks[4], (b, n, kh)) * 0.3).astype(jnp.float32)
    kbig = jnp.zeros((b, dh, kh), jnp.float32)
    vbig = jnp.zeros((b, kh, dh), jnp.float32)

    def split_heads(x, lane_h, g):
        """(…, L*h) -> (b, g, …, L*hg) by slicing the h-minor lane axis."""
        hg = h // g
        *lead, lanes = x.shape
        L = lanes // h
        xs = x.reshape(*lead, L, h)
        parts = [xs[..., gg * hg:(gg + 1) * hg].reshape(*lead, L * hg)
                 for gg in range(g)]
        return jnp.stack(parts, axis=1)

    results = {}
    for name in args.variants.split(","):
        fn, g = build_variant(name, b=b, n=n, d=d, h=h, jblk=args.jblk,
                              dtype=dtype, interpret=interpret)
        if g:
            ins = (split_heads(qp, n, g), split_heads(kfl, n, g),
                   split_heads(vp, d, g), split_heads(biasp, n, g),
                   split_heads(gatep, n, g))
        else:
            ins = (qp, kfl, vp, biasp, gatep, kbig, vbig)

        def step(scale, ins=ins, fn=fn, g=g):
            out = None
            x = ins[0] * scale
            for _ in range(args.layers):
                out = fn(x, *ins[1:])
                x = x + out.astype(x.dtype) * 0.01  # chain: forced sequential
            return out

        jstep = jax.jit(step)
        t0 = time.time()
        jstep(1.0).block_until_ready()
        compile_s = time.time() - t0

        passes = []
        for p_i in range(2):
            t0 = time.time()
            for i in range(args.steps):
                out = jstep(1.0 + 1e-3 * (i + p_i * args.steps))
            out.block_until_ready()
            passes.append((time.time() - t0) / args.steps * 1000)
        dt = min(passes)
        results[name] = dt
        print(f"{name}: {dt:.3f} ms/step ({dt / args.layers * 1000:.1f} "
              f"us/call, passes {', '.join(f'{p:.2f}' for p in passes)}), "
              f"compile {compile_s:.0f}s", flush=True)

    if args.check and "full" in results:
        fn_full, _ = build_variant("full", b=b, n=n, d=d, h=h,
                                   jblk=args.jblk, dtype=dtype,
                                   interpret=interpret)
        ref = fn_full(qp, kfl, vp, biasp, gatep, kbig, vbig)
        for name in ("opt_hoistg", "opt_rowmax", "opt_both"):
            if name not in results:
                continue
            fn_o, _ = build_variant(name, b=b, n=n, d=d, h=h,
                                    jblk=args.jblk, dtype=dtype,
                                    interpret=interpret)
            out_o = fn_o(qp, kfl, vp, biasp, gatep, kbig, vbig)
            err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                        - out_o.astype(jnp.float32))))
            print(f"{name} vs full: max|err| = {err:.3e}", flush=True)

    if args.check and "full" in results and "g2_headsplit" in results:
        fn_full, _ = build_variant("full", b=b, n=n, d=d, h=h,
                                   jblk=args.jblk, dtype=dtype,
                                   interpret=interpret)
        fn_g2, g = build_variant("g2_headsplit", b=b, n=n, d=d, h=h,
                                 jblk=args.jblk, dtype=dtype,
                                 interpret=interpret)
        ref = fn_full(qp, kfl, vp, biasp, gatep, kbig, vbig)
        out = fn_g2(split_heads(qp, n, g), split_heads(kfl, n, g),
                    split_heads(vp, d, g), split_heads(biasp, n, g),
                    split_heads(gatep, n, g))
        # re-interleave the head groups back into the h-minor lane axis
        hg = h // g
        o = out.reshape(b, g, n, n, d, hg).transpose(0, 2, 3, 4, 1, 5)
        o = o.reshape(b, n, n, dh)
        err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                    - o.astype(jnp.float32))))
        print(f"g2_headsplit vs full: max|err| = {err:.3e}", flush=True)

    full = results.get("full")
    if full:
        for k, v in results.items():
            if k != "full":
                tag = ("component cost" if k.startswith("minus_")
                       else "speedup")
                delta = (full - v) if k.startswith("minus_") else full / v
                unit = "ms" if k.startswith("minus_") else "x"
                print(f"{k}: {delta:.3f}{unit} ({tag})", flush=True)


if __name__ == "__main__":
    main()
