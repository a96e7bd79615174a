"""Lane-DENSE fused Mosaic kernel for triplet attention (round-3 design).

Why: at flagship shapes (N=48, H=16 triplet heads, d=16) the XLA path keeps
the O(N^3) logits in HBM with the node axis k in the lane (minor) dimension —
48 lanes padded to 128, a 2.67x physical inflation on every N^3 byte, which
DESIGN.md's roofline isolates as the reason TGT-At runs at 30% of HBM
speed-of-light while the N^2-only EGT stack runs at 94%. This kernel keeps
the N^3 data lane-dense end-to-end and never writes any N^3 tensor to HBM.

Layout ("k-major" lane packing): logits tiles are (i, k*H + h) — at the
flagship geometry 48 x 768 lanes, an exact multiple of the 128-lane vreg.
Value/query panels are (i, d*H + h) = 48 x 256. Requirements: N*H % 128 == 0
and d*H % 128 == 0 (EVERY production bucket 24..56 with H=16 qualifies; the
wrapper falls back to the jnp path otherwise). Buckets that are not JBLK
multiples run with the j grid axis zero-padded to the next JBLK multiple —
exact, because j rows are independent in the forward and the padded rows'
cotangents are zero in every cross-j accumulation (dbias/dgate/dK/dV); cost
is (pad/n) extra j-blocks on one axis, never cubic.

Matmuls use the MXU via h-BLOCK-DIAGONAL operands built in VMEM with zero
transposes: an operand like K_big[(d,h'),(k,h)] = K[k,d,h] * (h'==h) is an
element-row-repeat (broadcast+reshape, free-ish) of a pre-packed (d, k*H+h)
panel times a constant iota mask. The 16x MAC-slot waste of the block
diagonal is affordable because the dense FLOPs are tiny (0.23 GMAC per
layer-direction); what the kernel buys is the elimination of ~1.5 GB/layer
of padded N^3 HBM traffic and relayout copies.

Softmax stabilization (round-5): a per-ROW max over all (k,h) lanes — one
lane-reduce. Softmax is invariant to any shift constant over its k
reduction and a per-i constant qualifies, so this is exact in real
arithmetic (the old per-(i,h) roll-doubling segmax, kept as `_seg_max` for
the anatomy benchmark, cost ~12 VPU passes and was the largest single
component in the round-5 kernel anatomy). The denominator (not idempotent)
is an MXU product with a constant (k*H+h, h) selector, broadcast back with
a tile-like `pltpu.repeat`.

Semantics match ops/triplet._triplet_attention_impl (reference:
lib/tgt/layers/triplet.py:205-250) without attention dropout (the published
configs run triplet dropout 0; the wrapper falls back to jnp otherwise).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

JBLK = 16  # j-padding granule (divides every production bucket's padded j)


def _pick_jblk(njp: int, n: int, dh: int, nblocks: int,
               itemsize: int = 2) -> int:
    """Largest j-block per grid step that divides the padded j-range and
    keeps the program's j-sized VMEM blocks within budget.

    Round-5 anatomy (benchmarks/campaign_r5/anatomy_jblk*.log): at n=48 a
    48-j block (grid 24 -> 8 programs) ran the fwd kernel 8% faster than
    16-j blocks — per-program dispatch/pipeline overhead was 27% of fwd.
    `nblocks` is how many j-sized panels the kernel holds at once (fwd 4:
    qp/kfl/vp/out; bwd 9), so the backward naturally picks smaller blocks.
    """
    # Budget is for a SINGLE copy of the j-sized panels; Pallas double-
    # buffers grid-varying blocks, so the real footprint is ~2x this plus
    # the working tiles (s/p/a, masks, bias/gate). 6MB measured safe: the
    # n=48 bwd at jblk=24 (5.3MB) compiles and runs; the n=64 bwd at
    # jblk=32 (9.4MB) OOMed scoped vmem by 0.9MB on chip
    # (campaign_r5/sweep_dense_n64.log) — it now falls back to 16.
    budget = 6 * 2**20
    for cand in (48, 32, 24, 16):
        if njp % cand == 0 and nblocks * cand * n * dh * itemsize <= budget:
            return cand
    return JBLK

# -- data-parallel composition ------------------------------------------------
# Mosaic kernels cannot be partitioned by GSPMD at all — even a batch-axis
# data-parallel sharding raises NotImplementedError('wrap the call in a
# shard_map') at TPU lowering. When a data mesh is registered here, the
# kernel cores route through jax.shard_map over the batch axis (every kernel
# operand is batch-leading, so the wrap is exact: no cross-shard math).
_DATA_MESH = None  # (Mesh, axis_name) | None


def set_dense_data_mesh(mesh, axis_name: str = "data") -> None:
    """Register (or clear, with None) the mesh the dense kernels shard over.

    Process-global: set by the Trainer when `use_pallas='dense'` runs on a
    data-parallel mesh; the registered mesh applies to every dense-kernel
    call traced afterwards, so clear it (None) before tracing single-device
    programs in the same process (e.g. serving)."""
    global _DATA_MESH
    _DATA_MESH = None if mesh is None else (mesh, axis_name)


def _maybe_shard_map(core, nargs: int):
    """Wrap `core` (nargs batch-leading array args) in shard_map over the
    registered data mesh, or return it unchanged."""
    if _DATA_MESH is None:
        return core
    from jax.sharding import PartitionSpec
    mesh, ax = _DATA_MESH
    spec = PartitionSpec(ax)
    return jax.shard_map(core, mesh=mesh, in_specs=(spec,) * nargs,
                         out_specs=spec, check_vma=False)


def _hmask(rows: int, cols: int, h: int, dtype):
    """(rows, cols) 0/1 mask selecting (row % h) == (col % h)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1)
    return ((r % h) == (c % h)).astype(dtype)


def _sel(kh: int, h: int, dtype):
    """(kh, h) selector: sel[k*h + h', h''] = (h' == h'')."""
    r = jax.lax.broadcasted_iota(jnp.int32, (kh, h), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (kh, h), 1)
    return ((r % h) == c).astype(dtype)


def _brep(x, times: int):
    """Element-repeat rows: (r, c) -> (r*times, c), row i = x[i // times]."""
    r, c = x.shape
    return jnp.broadcast_to(x[:, None, :], (r, times, c)).reshape(r * times, c)


def _seg_max(s, h: int, n: int):
    """Exact per-(row, h) max over the k groups of a (rows, n*h) k-major
    tile via circular roll doubling (max is idempotent, so overlap is
    harmless once the window covers n groups)."""
    m = s
    span = 1
    while span < n:
        m = jnp.maximum(m, pltpu.roll(m, shift=span * h, axis=1))
        span *= 2
    return m


def _hash_keepf(lin, seed, rate: float):
    """Inverted-dropout keep mask from a stateless integer hash.

    `lin` int32 element indices (any shape), `seed` int32 scalar (traced),
    `rate` static python float. Returns f32 of {0, 1/(1-rate)}.

    murmur3's 32-bit finalizer over (lin mixed with seed): wrapping int32
    multiplies + LOGICAL right shifts — all plain VPU integer ops, so the
    same code lowers through Mosaic on TPU AND the Pallas interpreter on
    CPU (pltpu.prng_random_bits has no interpreter lowering, which is what
    blocked the stateful design — see docs/DESIGN.md round-5 note). The
    mask is a pure function of (seed, element index): the backward kernel
    reproduces the forward's mask exactly even though it partitions the j
    grid into different block sizes, and masks never touch HBM."""
    h = lin * jnp.int32(-1640531527) + seed          # 0x9E3779B9 golden mix
    h = h ^ jax.lax.shift_right_logical(h, 16)
    h = h * jnp.int32(-2048144789)                   # 0x85EBCA6B
    h = h ^ jax.lax.shift_right_logical(h, 13)
    h = h * jnp.int32(-1028477387)                   # 0xC2B2AE35
    h = h ^ jax.lax.shift_right_logical(h, 16)
    u = h & jnp.int32(0x7FFFFFFF)                    # uniform in [0, 2^31)
    keep = 1.0 - rate
    thresh = jnp.int32(min(int(keep * 2.0**31), 0x7FFFFFFF))
    return jnp.where(u < thresh, jnp.float32(1.0 / keep), jnp.float32(0.0))


def _keep_tile(seed, j_global, n: int, kh: int, rate: float):
    """(n, kh) keep mask for one j iteration: element (i, k*H+h) of j-row
    `j_global` hashes index (j_global*n + i)*kh + c under this batch row's
    `seed` (uniqueness across b comes from per-b seeds, which keeps the
    mask invariant under batch sharding — the kernel's b index is shard-
    LOCAL under shard_map, a per-b seed panel is not)."""
    i = jax.lax.broadcasted_iota(jnp.int32, (n, kh), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (n, kh), 1)
    lin = (j_global * n + i) * kh + c
    return _hash_keepf(lin, seed, rate)


def _dot(a, b, dtype):
    return jax.lax.dot_general(
        a.astype(dtype), b.astype(dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _dot_t(a, b, dtype):
    """Contract dim 0 of both: (m, x)^T @ (m, y) -> (x, y)."""
    return jax.lax.dot_general(
        a.astype(dtype), b.astype(dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _attn_tile(qp, kfl, biasp, g, h, n, dtype, qk_mask):
    """Shared forward math for one j: returns (p_exp, recip_denom, a).

    p_exp: exp(s - rowmax) (N, N*H) f32; recip: (N, H) f32; a: gated
    UNNORMALIZED weights (N, N*H) f32. `g` is the PRE-COMPUTED
    sigmoid(gate) panel (hoisted out of the j loop — it is shared across
    j) or None when ungated; `qk_mask` is the hoisted (d*H, N*H) h-block
    selector.

    Round-5 anatomy finding (benchmarks/kernel_anatomy.py): the softmax
    chain was the largest kernel component (33% of fwd). Softmax is
    invariant to any shift constant over the k reduction, and a per-ROW
    max (over all (k,h) lanes) is such a constant — one lane-reduce
    replaces the log2(n) roll-doubling passes of the old exact segmax.
    Exact in real arithmetic; the float hazard (unlike the old per-head
    segmax, which could never underflow a whole row) is a head whose
    logits ALL sit ~88+ below the cross-head row max: its exp row flushes
    to exact 0 and an unguarded 1/0 denominator would turn 0*inf into
    NaN. The denominator clamp below makes that head output exact zeros
    instead — graceful degradation at a logit spread no trained model
    approaches (precision already saturates by spread ~80)."""
    kbig = _brep(kfl, h) * qk_mask
    s = _dot(qp, kbig, dtype) + biasp
    p = jnp.exp(s - jnp.max(s, axis=1, keepdims=True))
    denom = jnp.maximum(_dot(p, _sel(n * h, h, dtype), dtype), 1e-30)
    recip = 1.0 / denom
    a = p * g if g is not None else p
    return p, recip, a


def _fwd_kernel(*refs, h: int, gated: bool, rate: float = 0.0):
    if rate > 0.0:
        seed_ref, qp_ref, kfl_ref, vp_ref, biasp_ref, gatep_ref, va_ref = refs
    else:
        qp_ref, kfl_ref, vp_ref, biasp_ref, gatep_ref, va_ref = refs
        seed_ref = None
    n = qp_ref.shape[2]
    dh = qp_ref.shape[3]
    jblk = qp_ref.shape[1]
    dtype = qp_ref.dtype
    biasp = biasp_ref[0].astype(jnp.float32)
    # sigmoid(gate) hoisted: the gate panel is per-b, shared by every j of
    # this grid step (round-5 anatomy: the per-j transcendental was ~7% fwd)
    g = (jax.nn.sigmoid(gatep_ref[0].astype(jnp.float32)) if gated else None)
    qk_mask = _hmask(dh, n * h, h, dtype)
    av_mask = _hmask(n * h, dh, h, dtype)
    # hoisted: program_id has no lowering INSIDE a fori_loop body on the
    # interpret path (it works at kernel top level, cf. the bwd's pl.when)
    j_base = pl.program_id(1) * jblk if rate > 0.0 else 0

    def body(j, _):
        _, recip, a = _attn_tile(qp_ref[0, j], kfl_ref[0, j], biasp, g,
                                 h, n, dtype, qk_mask)
        if rate > 0.0:
            # dropout on the gated weights (jnp-path order: softmax, gate,
            # dropout); commutes with the per-(i,h) recip normalization
            a = a * _keep_tile(seed_ref[0, 0], j_base + j, n, n * h, rate)
        vbig = _brep(vp_ref[0, j], h) * av_mask
        va_u = _dot(a, vbig, dtype)
        va_ref[0, j] = (va_u * pltpu.repeat(recip, dh // h, axis=1)
                        ).astype(va_ref.dtype)
        return 0

    jax.lax.fori_loop(0, qp_ref.shape[1], body, 0)


def _bwd_kernel(*refs, h: int, gated: bool, rate: float = 0.0):
    if rate > 0.0:
        (seed_ref, qp_ref, kfl_ref, vp_ref, kp_ref, vfl_ref, biasp_ref,
         gatep_ref, dva_ref, dqp_ref, dkp_ref, dvp_ref, dbias_ref,
         dgate_ref) = refs
    else:
        (qp_ref, kfl_ref, vp_ref, kp_ref, vfl_ref, biasp_ref, gatep_ref,
         dva_ref, dqp_ref, dkp_ref, dvp_ref, dbias_ref, dgate_ref) = refs
        seed_ref = None
    n = qp_ref.shape[2]
    dh = qp_ref.shape[3]
    jblk = qp_ref.shape[1]
    d = dh // h
    dtype = qp_ref.dtype
    biasp = biasp_ref[0].astype(jnp.float32)
    g = (jax.nn.sigmoid(gatep_ref[0].astype(jnp.float32)) if gated else None)
    qk_mask = _hmask(dh, n * h, h, dtype)
    av_mask = _hmask(n * h, dh, h, dtype)
    sel = _sel(n * h, h, jnp.float32)
    # d sigmoid = g*(1-g): j-invariant like g itself, hoist out of the loop
    g1mg = g * (1.0 - g) if gated else None
    # hoisted out of the loop body like the forward's (interpret lowering)
    j_base = pl.program_id(1) * jblk if rate > 0.0 else 0

    @pl.when(pl.program_id(1) == 0)
    def _init():
        dbias_ref[0] = jnp.zeros_like(dbias_ref[0])
        if gated:
            dgate_ref[0] = jnp.zeros_like(dgate_ref[0])

    def body(j, _):
        qp = qp_ref[0, j]
        p, recip, _ = _attn_tile(qp, kfl_ref[0, j], biasp, g, h, n, dtype,
                                 qk_mask)
        pn = p * pltpu.repeat(recip, n, axis=1)        # normalized probs
        a = pn * g if gated else pn
        dva = dva_ref[0, j].astype(jnp.float32)

        # dA = dva @ V^T (h-block-diag from the (d, k*H+h) panel)
        vtbig = _brep(vfl_ref[0, j], h) * qk_mask
        da = _dot(dva, vtbig, dtype)
        if rate > 0.0:
            # the index hash is partition-independent, so this reproduces
            # the forward's mask exactly despite the backward's different
            # j-block size; mask the dV operand AND the dA chain
            keepf = _keep_tile(seed_ref[0, 0], j_base + j, n, n * h, rate)
            a = a * keepf
            da = da * keepf
        if gated:
            dgate_ref[0] += (da * pn * g1mg).astype(dgate_ref.dtype)
            dp = da * g
        else:
            dp = da
        rs = _dot(dp * pn, sel, jnp.float32)           # (N, H) rowsum over k
        ds = pn * (dp - pltpu.repeat(rs, n, axis=1))
        dbias_ref[0] += ds.astype(dbias_ref.dtype)

        ktbig = _brep(kp_ref[0, j], h) * av_mask       # (N*H, D*H)
        dqp_ref[0, j] = _dot(ds, ktbig, dtype).astype(dqp_ref.dtype)

        dkfull = _dot_t(ds, qp, dtype) * av_mask       # (N*H, D*H)
        dkp_ref[0, j] = jnp.sum(dkfull.reshape(n, h, dh),
                                axis=1).astype(dkp_ref.dtype)
        dvfull = _dot_t(a, dva, dtype) * av_mask
        dvp_ref[0, j] = jnp.sum(dvfull.reshape(n, h, dh),
                                axis=1).astype(dvp_ref.dtype)
        return 0

    del d
    jax.lax.fori_loop(0, qp_ref.shape[1], body, 0)


# ---------------------------------------------------------------------------
# packing (XLA side, all N^2-sized relayouts)
# ---------------------------------------------------------------------------

def _pack(q, k, v, bias, gate):
    """(b,ni,nj,d,h)/(b,ni,ni,h) -> lane-dense kernel panels.

    The j axis (q dim 2; k/v dim 1) may be zero-padded to a JBLK multiple
    by the public entries — i/k stay at the true n, so bias/gate panels and
    every lane dimension are unaffected."""
    b, ni, nj, d, h = q.shape
    qp = q.transpose(0, 2, 1, 3, 4).reshape(b, nj, ni, d * h)  # [b,j,i,(dh)]
    kfl = k.transpose(0, 1, 3, 2, 4).reshape(b, nj, d, ni * h)  # [b,j,d,(kh)]
    vp = v.reshape(b, nj, ni, d * h)                           # [b,j,k,(dh)]
    biasp = bias.reshape(b, ni, ni * h)                        # [b,i,(kh)]
    gatep = gate.reshape(b, ni, ni * h) if gate is not None else None
    return qp, kfl, vp, biasp, gatep


def _specs(n, d, dh, kh, jblk=JBLK):
    blk = pl.BlockSpec((1, jblk, n, dh), lambda bb, jc: (bb, jc, 0, 0))
    kfl_blk = pl.BlockSpec((1, jblk, d, kh), lambda bb, jc: (bb, jc, 0, 0))
    bias_blk = pl.BlockSpec((1, n, kh), lambda bb, jc: (bb, 0, 0))
    return blk, kfl_blk, bias_blk


def _seed_spec():
    """BlockSpec for the per-batch-row (b, 1) int32 dropout-seed panel:
    one (1, 1) SMEM scalar per b grid row, shared by every j block."""
    return pl.BlockSpec((1, 1), lambda bb, jc: (bb, 0),
                        memory_space=pltpu.SMEM)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def _dense_core(q, k, v, bias, gate, seed, gated, interpret, rate=0.0):
    va, _ = _dense_core_fwd(q, k, v, bias, gate, seed, gated, interpret,
                            rate)
    return va


def _call_fwd(qp, kfl, vp, biasp, gatep, gated, interpret, seed=None,
              rate=0.0):
    b, nj, n, dh = qp.shape
    kh = biasp.shape[-1]
    h = kh // n
    jblk = _pick_jblk(nj, n, dh, nblocks=4,  # qp/vp/out + kfl per program
                      itemsize=qp.dtype.itemsize)
    blk, kfl_blk, bias_blk = _specs(n, dh // h, dh, kh, jblk)
    gate_in = gatep if gated else biasp  # placeholder ref when ungated
    in_specs = [blk, kfl_blk, blk, bias_blk, bias_blk]
    inputs = (qp, kfl, vp, biasp, gate_in)
    if rate > 0.0:  # static: dropout-0 programs stay byte-identical
        in_specs = [_seed_spec()] + in_specs
        inputs = (seed,) + inputs
    return pl.pallas_call(
        functools.partial(_fwd_kernel, h=h, gated=gated, rate=rate),
        grid=(b, nj // jblk),
        in_specs=in_specs,
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct(qp.shape, qp.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(*inputs)


def _dense_core_fwd(q, k, v, bias, gate, seed, gated, interpret, rate=0.0):
    qp, kfl, vp, biasp, gatep = _pack(q, k, v, bias, gate)
    va = _call_fwd(qp, kfl, vp, biasp, gatep, gated, interpret,
                   seed=seed, rate=rate)
    return va, (q, k, v, bias, gate, seed)


def _dense_core_bwd(gated, interpret, rate, res, dva):
    q, k, v, bias, gate, seed = res
    b, n, nj, d, h = q.shape
    qp, kfl, vp, biasp, gatep = _pack(q, k, v, bias, gate)
    kp = k.reshape(b, nj, n, d * h)                            # [b,j,k,(dh)]
    vfl = v.transpose(0, 1, 3, 2, 4).reshape(b, nj, d, n * h)  # [b,j,d,(kh)]
    kh = n * h
    jblk = _pick_jblk(nj, n, d * h, nblocks=9,  # 6 in + 3 out j-panels
                      itemsize=q.dtype.itemsize)
    blk, kfl_blk, bias_blk = _specs(n, d, d * h, kh, jblk)
    gate_in = gatep if gated else biasp
    in_specs = [blk, kfl_blk, blk, blk, kfl_blk, bias_blk, bias_blk, blk]
    inputs = (qp, kfl, vp, kp, vfl, biasp, gate_in, dva)
    if rate > 0.0:
        in_specs = [_seed_spec()] + in_specs
        inputs = (seed,) + inputs
    dqp, dkp, dvp, dbias, dgate = pl.pallas_call(
        functools.partial(_bwd_kernel, h=h, gated=gated, rate=rate),
        grid=(b, nj // jblk),
        in_specs=in_specs,
        out_specs=[blk, blk, blk, bias_blk, bias_blk],
        out_shape=[
            jax.ShapeDtypeStruct(qp.shape, qp.dtype),
            jax.ShapeDtypeStruct(kp.shape, kp.dtype),
            jax.ShapeDtypeStruct(vp.shape, vp.dtype),
            jax.ShapeDtypeStruct(biasp.shape, jnp.float32),
            jax.ShapeDtypeStruct(biasp.shape, jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(*inputs)

    # unpack to the (possibly j-padded) primal layouts
    dq = dqp.reshape(b, nj, n, d, h).transpose(0, 2, 1, 3, 4)
    dk = dkp.reshape(b, nj, n, d, h)
    dv = dvp.reshape(b, nj, n, d, h)
    dbias = dbias.reshape(b, n, n, h).astype(bias.dtype)
    dgate = (dgate.reshape(b, n, n, h).astype(gate.dtype) if gated else None)
    return dq, dk, dv, dbias, dgate, None


_dense_core.defvjp(_dense_core_fwd, _dense_core_bwd)


# ---------------------------------------------------------------------------
# aggregate variant: N^2 attention weights computed in XLA (softmax, gate,
# dropout all stay outside), only the O(N^3) k-aggregation runs in the kernel
# ---------------------------------------------------------------------------

def _agg_fwd_kernel(ap_ref, vp_ref, va_ref, *, h: int):
    n = vp_ref.shape[2]
    dh = vp_ref.shape[3]
    dtype = vp_ref.dtype
    av_mask = _hmask(n * h, dh, h, dtype)
    ap = ap_ref[0]

    def body(j, _):
        vbig = _brep(vp_ref[0, j], h) * av_mask
        va_ref[0, j] = _dot(ap, vbig, dtype).astype(va_ref.dtype)
        return 0

    jax.lax.fori_loop(0, vp_ref.shape[1], body, 0)


def _agg_bwd_kernel(ap_ref, vfl_ref, dva_ref, da_ref, dvp_ref, *, h: int):
    n = dva_ref.shape[2]
    dh = dva_ref.shape[3]
    dtype = dva_ref.dtype
    qk_mask = _hmask(dh, n * h, h, dtype)
    av_mask = _hmask(n * h, dh, h, dtype)
    ap = ap_ref[0]

    @pl.when(pl.program_id(1) == 0)
    def _init():
        da_ref[0] = jnp.zeros_like(da_ref[0])

    def body(j, _):
        dva = dva_ref[0, j]
        vtbig = _brep(vfl_ref[0, j], h) * qk_mask
        da_ref[0] += _dot(dva, vtbig, dtype).astype(da_ref.dtype)
        dvfull = _dot_t(ap, dva, dtype) * av_mask
        dvp_ref[0, j] = jnp.sum(dvfull.reshape(n, h, dh),
                                axis=1).astype(dvp_ref.dtype)
        return 0

    jax.lax.fori_loop(0, dva_ref.shape[1], body, 0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _agg_core(ap, v, interpret):
    va, _ = _agg_core_fwd(ap, v, interpret)
    return va


def _agg_core_fwd(ap, v, interpret):
    b, nj, n, d, h = v.shape  # j (dim 1) may be padded to a JBLK multiple
    vp = v.reshape(b, nj, n, d * h)
    jblk = _pick_jblk(nj, n, d * h, nblocks=2,  # vp + out j-panels
                      itemsize=v.dtype.itemsize)
    blk, _, bias_blk = _specs(n, d, d * h, n * h, jblk)
    va = pl.pallas_call(
        functools.partial(_agg_fwd_kernel, h=h),
        grid=(b, nj // jblk),
        in_specs=[bias_blk, blk],
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct(vp.shape, vp.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(ap, vp)
    return va, (ap, v)


def _agg_core_bwd(interpret, res, dva):
    ap, v = res
    b, nj, n, d, h = v.shape
    vfl = v.transpose(0, 1, 3, 2, 4).reshape(b, nj, d, n * h)
    jblk = _pick_jblk(nj, n, d * h, nblocks=3,  # vfl/dva/dvp j-panels
                      itemsize=v.dtype.itemsize)
    blk, kfl_blk, bias_blk = _specs(n, d, d * h, n * h, jblk)
    da, dvp = pl.pallas_call(
        functools.partial(_agg_bwd_kernel, h=h),
        grid=(b, nj // jblk),
        in_specs=[bias_blk, kfl_blk, blk],
        out_specs=[bias_blk, blk],
        out_shape=[
            jax.ShapeDtypeStruct(ap.shape, jnp.float32),
            jax.ShapeDtypeStruct((b, nj, n, d * h), v.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(ap, vfl, dva)
    return da.astype(ap.dtype), dvp.reshape(b, nj, n, d, h)


_agg_core.defvjp(_agg_core_fwd, _agg_core_bwd)


def triplet_aggregate_dense(p, e, mask, *, num_heads: int, gated: bool = True,
                            attention_dropout: float = 0.0,
                            deterministic: bool = True, rng=None,
                            interpret=None) -> jnp.ndarray:
    """Lane-dense fused aggregation for the (un)gated aggregate variants.

    The N^2 logits/softmax/gate/dropout stay in XLA (cheap, and keeps exact
    dropout semantics); the O(N^3) k-aggregation runs in the kernel reading
    v panels in their natural layout — no relayout copies, no conv-emitter
    batched dots. Same parameters/semantics as ops/triplet.triplet_aggregate
    (incl. the unmasked-out-direction quirk of the gated variant).
    """
    from tgt_tpu.ops.common import dropout, layernorm, linear

    b, n, _, w = e.shape
    h = num_heads
    interpret = _resolve_interpret(interpret)
    reason = dense_unsupported_reason(n, w, h, itemsize=e.dtype.itemsize,
                                      bwd_nblocks=3,
                                      check_vmem=not interpret)
    if reason:
        raise ValueError(f"dense aggregate kernel unsupported: {reason}. "
                         f"Use the jnp path (ops/triplet).")
    d = w // h
    e_ln = layernorm(p["tri_ln_e"], e)
    v_in, v_out = jnp.split(linear(p["lin_V"], e_ln), 2, axis=-1)
    if gated:
        e_in, g_in, e_out, g_out = jnp.split(linear(p["lin_EG"], e_ln), 4,
                                             axis=-1)
    else:
        e_in, e_out = jnp.split(linear(p["lin_E"], e_ln), 2, axis=-1)
        g_in = g_out = None
    r_in, r_out = (None, None) if deterministic else jax.random.split(rng)
    w_o = p["lin_O"]["w"].astype(e.dtype)
    w_o = w_o.reshape(d, 2 * h, w_o.shape[1])

    def direction(e_l, g_l, v, r_dir, w_dir, transpose_pair, masked):
        if transpose_pair:
            e_l = jnp.swapaxes(e_l, 1, 2)
            g_l = None if g_l is None else jnp.swapaxes(g_l, 1, 2)
            v = jnp.swapaxes(v, 1, 2)
        m = (jnp.swapaxes(mask, 1, 2) if transpose_pair else mask) \
            if masked else 0.0
        a = jax.nn.softmax(e_l + m, axis=2)            # (b, i, k, h)
        if g_l is not None:
            a = a * jax.nn.sigmoid(g_l + m)
        if not deterministic and attention_dropout > 0.0:
            # draw the mask in the jnp path's (b,h,i,k) layout so both
            # implementations are bitwise-identical for the same key
            a = jnp.transpose(dropout(r_dir, jnp.transpose(a, (0, 3, 1, 2)),
                                      attention_dropout, deterministic),
                              (0, 2, 3, 1))
        core = _maybe_shard_map(
            lambda a_, v_: _agg_core(a_, v_, interpret), 2)
        njp = _jpad(n)
        vj = v.reshape(b, n, n, d, h)
        if njp != n:  # pad the j grid axis only (exact, see dense_supported)
            vj = jnp.pad(vj, ((0, 0), (0, njp - n), (0, 0), (0, 0), (0, 0)))
        va = core(a.reshape(b, n, n * h), vj)[:, :n]
        va = va.reshape(b, n, n, d, h)
        return jnp.einsum("bjidh,dhw->bjiw", va, w_dir)

    # out-direction unmasked for the gated variant (reference quirk,
    # triplet.py:63-64); the ungated variant masks both directions
    out_t = (direction(e_in, g_in, v_in, r_in, w_o[:, :h], False, True)
             + direction(e_out, g_out, v_out, r_out, w_o[:, h:], True,
                         not gated))
    return jnp.swapaxes(out_t, 1, 2) + p["lin_O"]["b"].astype(e.dtype)


def _resolve_interpret(interpret):
    """interpret=None means auto: compiled Mosaic on TPU, interpret mode on
    every other backend — so configs that set use_pallas='dense' (the
    published TGT-At flagship configs since round 4) keep working on the
    hermetic forced-CPU test mesh without callers threading the flag."""
    if interpret is None:
        return jax.default_backend() != "tpu"
    return interpret


def _jpad(n: int) -> int:
    """j-axis length rounded up to the JBLK grid multiple."""
    return -(-n // JBLK) * JBLK


def dense_unsupported_reason(n: int, edge_width: int, num_heads: int, *,
                             itemsize: int = 2, bwd_nblocks: int = 9,
                             check_vmem: bool = True) -> Optional[str]:
    """Why this geometry cannot run the dense kernel, or None if it can.

    Two requirements. (1) Lane density: the (k*H) and (d*H) lane dims must
    be 128-dense. The j grid axis is zero-padded to a JBLK multiple by the
    public entries (exact: padded-j rows receive zero cotangents, so every
    cross-j accumulation — dbias/dgate/da — gets a zero contribution), so
    n % JBLK is NOT required. (2) VMEM feasibility: the backward kernel
    holds `bwd_nblocks` j-sized panels (attention 9, aggregate 3),
    double-buffered, plus ~4MB of working tiles — at the minimum block
    (JBLK=16) that caps n*d*H*itemsize; past it Mosaic OOMs scoped vmem at
    COMPILE time, so such geometries fall back to the jnp path (with the
    fallback warning) instead. `itemsize` is the compute dtype's bytes
    (bf16 2, f32 4 — f32 programs halve the feasible n). All production
    buckets (24..64, h=16, bf16) pass both."""
    d = edge_width // num_heads
    if (n * num_heads) % 128 or (d * num_heads) % 128:
        return (f"geometry N={n}, W={edge_width}, H={num_heads} is not "
                f"128-lane-dense (needs N*H % 128 == 0 and "
                f"(W/H)*H % 128 == 0)")
    panel_bytes = 2 * bwd_nblocks * JBLK * n * (d * num_heads) * itemsize
    # check_vmem=False for interpret-mode runs (no VMEM exists there; the
    # CPU oracle tests run the flagship geometry in f32 for precision)
    if check_vmem and panel_bytes > 12 * 2**20:
        return (f"geometry N={n}, W={edge_width}, H={num_heads} at "
                f"itemsize={itemsize} needs {panel_bytes / 2**20:.1f}MB of "
                f"double-buffered backward panels even at the minimum "
                f"j-block — over the ~12MB VMEM budget (Mosaic would OOM "
                f"scoped vmem at compile)")
    return None


def dense_supported(n: int, edge_width: int, num_heads: int, *,
                    itemsize: int = 2, bwd_nblocks: int = 9,
                    check_vmem: bool = True) -> bool:
    """True if the dense kernel can run this geometry (see
    dense_unsupported_reason for the two requirements)."""
    return dense_unsupported_reason(n, edge_width, num_heads,
                                    itemsize=itemsize,
                                    bwd_nblocks=bwd_nblocks,
                                    check_vmem=check_vmem) is None


def triplet_attention_dense(p, e, mask, *, num_heads: int, gated: bool = True,
                            attention_dropout: float = 0.0,
                            deterministic: bool = True, rng=None,
                            interpret=None) -> jnp.ndarray:
    """Drop-in lane-dense fused triplet attention (both directions).

    Same parameters/semantics as ops/triplet.triplet_attention — including
    attention dropout, which runs IN-KERNEL: a hash-based keep mask
    (`_hash_keepf`) applied to the gated weights in the jnp path's order
    (softmax, gate, dropout), drawn per direction from an rng split like
    the jnp path (the mask BITS differ from jax.random.bernoulli's — same
    Bernoulli(1-rate) distribution, different stream — so dropout>0 runs
    are statistically, not bitwise, equivalent across the two paths; both
    paths agree bitwise at dropout 0). Projections + split lin_O run in
    XLA; the whole N^3 logits/softmax/gate/AV(/dropout) chain runs in the
    kernel with zero N^3 HBM traffic.
    """
    from tgt_tpu.ops.common import layernorm, linear

    b, n, _, w = e.shape
    h = num_heads
    interpret = _resolve_interpret(interpret)
    rate = float(attention_dropout) if not deterministic else 0.0
    if rate > 0.0:
        # per-direction rng split mirrors the jnp path; per-BATCH-ROW seeds
        # (not one scalar) so masks decorrelate across samples even under
        # a batch-sharded shard_map, where the kernel's b index is local
        r_in, r_out = jax.random.split(rng)
        seeds = {
            which: jax.random.randint(r, (b, 1), 0, jnp.iinfo(jnp.int32).max,
                                      dtype=jnp.int32)
            for which, r in (("in", r_in), ("out", r_out))
        }
    else:
        seeds = {"in": None, "out": None}
    reason = dense_unsupported_reason(n, w, h, itemsize=e.dtype.itemsize,
                                      bwd_nblocks=9,
                                      check_vmem=not interpret)
    if reason:
        raise ValueError(f"dense attention kernel unsupported: {reason}. "
                         f"Use the jnp path (ops/triplet).")
    d = w // h
    scale = d ** -0.5
    e_ln = layernorm(p["tri_ln_e"], e)
    w_o = p["lin_O"]["w"].astype(e.dtype)
    w_o = w_o.reshape(d, 2 * h, w_o.shape[1])

    def direction(which, w_dir, transpose_pair):
        q, k, v = jnp.split(linear(p[f"lin_QKV_{which}"], e_ln), 3, axis=-1)
        q = q.reshape(b, n, n, d, h) * scale
        k = k.reshape(b, n, n, d, h)
        v = v.reshape(b, n, n, d, h)
        if gated:
            e_b, g_b = jnp.split(linear(p[f"lin_EG_{which}"], e_ln), 2,
                                 axis=-1)
        else:
            e_b = linear(p[f"lin_E_{which}"], e_ln)
            g_b = None
        m = mask
        if transpose_pair:
            k = jnp.swapaxes(k, 1, 2)
            v = jnp.swapaxes(v, 1, 2)
            e_b = jnp.swapaxes(e_b, 1, 2)
            g_b = None if g_b is None else jnp.swapaxes(g_b, 1, 2)
            m = jnp.swapaxes(mask, 1, 2)
        bias = e_b + m
        gate = (g_b + m) if gated else None
        # named for selective remat (cfg.remat_policy='tri_va'): saving
        # these N^2 panels + the kernel output lets the backward pass feed
        # the custom-VJP residuals directly and prune BOTH the projections
        # and the kernel forward from the remat recompute
        from jax.ad_checkpoint import checkpoint_name
        q = checkpoint_name(q, "tri_proj")
        k = checkpoint_name(k, "tri_proj")
        v = checkpoint_name(v, "tri_proj")
        bias = checkpoint_name(bias, "tri_proj")
        gate = checkpoint_name(gate, "tri_proj") if gated else None
        njp = _jpad(n)
        if njp != n:
            # pad the j grid axis only (q dim 2; k/v dim 1) — exact, see
            # dense_supported; bias/gate/lane dims stay at the true n
            pj = (0, njp - n)
            q = jnp.pad(q, ((0, 0), (0, 0), pj, (0, 0), (0, 0)))
            k = jnp.pad(k, ((0, 0), pj, (0, 0), (0, 0), (0, 0)))
            v = jnp.pad(v, ((0, 0), pj, (0, 0), (0, 0), (0, 0)))
        if rate > 0.0:
            core = _maybe_shard_map(
                lambda q_, k_, v_, b_, g_, s_: _dense_core(
                    q_, k_, v_, b_, g_, s_, gated, interpret, rate), 6)
            va = core(q, k, v, bias, gate, seeds[which])
        else:
            core = _maybe_shard_map(
                lambda q_, k_, v_, b_, g_: _dense_core(
                    q_, k_, v_, b_, g_, None, gated, interpret), 5)
            va = core(q, k, v, bias, gate)
        va = checkpoint_name(va[:, :n], "tri_va")
        # va: (b, j, i, (d*H+h)) -> contract split lin_O -> (b, j, i, w)
        va = va.reshape(b, n, n, d, h)
        return jnp.einsum("bjidh,dhw->bjiw", va, w_dir)

    out_t = (direction("in", w_o[:, :h], False)
             + direction("out", w_o[:, h:], True))
    return jnp.swapaxes(out_t, 1, 2) + p["lin_O"]["b"].astype(e.dtype)
