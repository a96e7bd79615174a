"""Go/no-go microbench: Pallas fused softmax+gate vs XLA's fusions.

The N^3 gated-softmax chain a = softmax(s + bias)*sigmoid(glog) on the
native dot-order layout s[b,j,h,i,k] is elementwise+lane-reduce work that
XLA splits into several HBM passes. A one-pass Pallas kernel (tile
[h,i,k] resident in VMEM per (b,j) grid cell; bias/gate tiles reused
across j) bounds the traffic at read-s + write-a. This harness measures
FORWARD ONLY at flagship shapes to decide whether to productionize.

Usage: python benchmarks/softmax_gate_kernel.py [--steps 30] [--cpu]
"""
import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def jnp_chain(s, bias, glog):
    import jax
    import jax.numpy as jnp
    a = jax.nn.softmax(s + bias[:, None], axis=-1)
    return a * jax.nn.sigmoid(glog)[:, None]


def make_kernel():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    def kernel(s_ref, bias_ref, glog_ref, o_ref):
        # f32 inside the kernel: Mosaic's bf16 logistic lowering is broken
        # (vector.broadcast f32->bf16 verify error), and f32 softmax is
        # numerically what the torch reference does under AMP anyway
        s = s_ref[0, 0].astype(jnp.float32)          # (h, i, k)
        z = s + bias_ref[0].astype(jnp.float32)      # one bias block per b
        z = z - jnp.max(z, axis=-1, keepdims=True)
        e = jnp.exp(z)
        a = e / jnp.sum(e, axis=-1, keepdims=True)
        g = jax.nn.sigmoid(glog_ref[0].astype(jnp.float32))
        o_ref[0, 0] = (a * g).astype(o_ref.dtype)

    interpret = jax.default_backend() == "cpu"

    def fused(s, bias, glog):
        b, j, h, i, k = s.shape
        return pl.pallas_call(
            kernel,
            interpret=interpret,
            grid=(b, j),
            in_specs=[
                pl.BlockSpec((1, 1, h, i, k), lambda bi, ji: (bi, ji, 0, 0, 0)),
                pl.BlockSpec((1, h, i, k), lambda bi, ji: (bi, 0, 0, 0)),
                pl.BlockSpec((1, h, i, k), lambda bi, ji: (bi, 0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, h, i, k),
                                   lambda bi, ji: (bi, ji, 0, 0, 0)),
            out_shape=jax.ShapeDtypeStruct(s.shape, s.dtype),
        )(s, bias, glog)

    return fused


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--b", type=int, default=8)
    ap.add_argument("--n", type=int, default=48)
    ap.add_argument("--h", type=int, default=16)
    args = ap.parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    import jax.numpy as jnp
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    b, n, h = args.b, args.n, args.h
    rs = np.random.RandomState(0)
    pool = 4
    ss = jnp.asarray(rs.randn(pool, b, n, h, n, n).astype(np.float32)
                     ).astype(jnp.bfloat16)
    bb = jnp.asarray(rs.randn(pool, b, h, n, n).astype(np.float32)
                     ).astype(jnp.bfloat16)
    gg = jnp.asarray(rs.randn(pool, b, h, n, n).astype(np.float32)
                     ).astype(jnp.bfloat16)

    fused = make_kernel()
    # numerical parity first (interpret-safe shapes)
    ref = np.asarray(jnp_chain(ss[0], bb[0], gg[0]).astype(jnp.float32))
    got = np.asarray(fused(ss[0], bb[0], gg[0]).astype(jnp.float32))
    err = np.abs(ref - got).max()
    print(f"max |err| vs jnp: {err:.2e}", flush=True)
    assert err < 2e-2, "kernel wrong"

    for name, fn in (("jnp", jnp_chain), ("pallas", fused)):
        f = jax.jit(fn)
        f(ss[0], bb[0], gg[0]).block_until_ready()  # compile
        times = []
        for p in range(2):
            t0 = time.time()
            for i in range(args.steps):
                q = (p * args.steps + i) % pool
                out = f(ss[q], bb[q], gg[q])
            out.block_until_ready()
            times.append((time.time() - t0) / args.steps)
        print(f"{name:7s} {min(times)*1e3:7.3f} ms/call "
              f"(passes {times[0]*1e3:.2f}, {times[1]*1e3:.2f})", flush=True)


if __name__ == "__main__":
    main()
