"""Triplet interaction layers — third-order edge-channel ops, pure-jnp reference.

Six variants with semantics matching the reference registry
(lib/tgt/layers/triplet.py:6-20): ``aggregate``, ``aggregate_ungated``,
``attention``, ``attention_ungated``, ``triangular_update``, ``axial_attention``.
(The reference registry key for triangular update is the typo
'tiangular_update' — we accept both spellings.)

All operate on the edge channel e in (b, N, N, W) with additive mask
(b, N, N, 1). For a pair (i, j), the "in" direction aggregates over edges
(j, k) weighted by information at (i, k); the "out" direction mirrors with
transposed indexing.

Quirk replicated deliberately for checkpoint parity: in the *gated aggregate*
variant the out-direction softmax/gates are NOT masked
(lib/tgt/layers/triplet.py:63-64), so padded rows contribute (their weights
come from layernormed padding states). This makes outputs depend on padding
content exactly as the reference does.

These are the correctness oracles AND the default production path (XLA's
conv-based batched-dot lowering wins at PCQM sizes — measured in CLAUDE.md).
A fused blockwise Pallas kernel for the attention variants lives in
ops/pallas/triplet_attention.py (opt-in via TGTConfig.use_pallas; useful in
memory-bound regimes since it avoids materializing the (b,N,N,N,h) logits).
"""
from __future__ import annotations

import warnings
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from tgt_tpu.ops.common import (Params, dropout, layernorm, layernorm_init,
                                linear, linear_init, siglin)

# One-time (per distinct reason) warning when a requested Pallas kernel
# silently falls back to the jnp path — a user tweaking triplet dropout on
# the promoted `use_pallas: dense` configs would otherwise lose the measured
# 1.22x with no signal. Fires at trace time, once per reason string.
_pallas_fallback_warned: set = set()


def _warn_pallas_fallback(reason: str) -> None:
    if reason in _pallas_fallback_warned:
        return
    _pallas_fallback_warned.add(reason)
    warnings.warn(
        f"use_pallas requested but the triplet kernel fell back to the jnp "
        f"path: {reason}. The measured dense-kernel speedup (~1.22x at "
        f"flagship shapes) does not apply to this program.",
        RuntimeWarning, stacklevel=3)


# NOTE on the SPLIT lin_O used throughout this module: lin_O's stored weight
# is (2*edge_width, out) consuming ``concat([va_in, va_out],
# axis=h).reshape(..., 2*edge_width)`` — its rows are indexed (d, 2h).
# Splitting it into per-direction (d, h, out) blocks and contracting (d, h)
# straight out of each direction's aggregation einsum removes the
# concat+reshape relayout copies that dominated the N^3 path's copy time
# (HLO forensics: 18.9MB bf16[b,N,N,d,2h] copies at the concat,
# benchmarks/layer_forensics.py). Bitwise-equivalent in f32 (pure
# reassociation; bf16 differs in rounding only).


# ---------------------------------------------------------------------------
# aggregate (gated / ungated) — O(N^3 * d) with N^2 logits
# ---------------------------------------------------------------------------

def triplet_aggregate_init(rng: jax.Array, edge_width: int, num_heads: int,
                           gated: bool = True) -> Dict[str, Params]:
    ks = jax.random.split(rng, 3)
    p = {
        "tri_ln_e": layernorm_init(edge_width),
        "lin_V": linear_init(ks[0], edge_width, edge_width * 2),
        "lin_O": linear_init(ks[2], edge_width * 2, edge_width),
    }
    if gated:
        p["lin_EG"] = linear_init(ks[1], edge_width, num_heads * 4)
    else:
        p["lin_E"] = linear_init(ks[1], edge_width, num_heads * 2)
    return p


def _aggregate_dense_or_none(p, e, mask, *, num_heads, gated,
                             attention_dropout, deterministic, rng,
                             use_pallas):
    """Route to the lane-dense kernel when requested and supported."""
    if use_pallas != "dense":
        return None
    from tgt_tpu.ops.pallas.triplet_dense import (dense_unsupported_reason,
                                                  triplet_aggregate_dense)
    reason = dense_unsupported_reason(
        e.shape[1], e.shape[-1], num_heads, itemsize=e.dtype.itemsize,
        bwd_nblocks=3,
        # VMEM feasibility only binds when the kernel actually compiles
        # (interpret mode on non-TPU backends has no VMEM)
        check_vmem=jax.default_backend() == "tpu")
    if reason:
        _warn_pallas_fallback(f"aggregate {reason}")
        return None
    return triplet_aggregate_dense(p, e, mask, num_heads=num_heads,
                                   gated=gated,
                                   attention_dropout=attention_dropout,
                                   deterministic=deterministic, rng=rng)


def triplet_aggregate(p: Dict[str, Params], e: jnp.ndarray, mask: jnp.ndarray,
                      *, num_heads: int, attention_dropout: float = 0.0,
                      deterministic: bool = True,
                      rng: Optional[jax.Array] = None,
                      use_pallas=False) -> jnp.ndarray:
    """Gated triplet aggregation (reference: triplet.py:22-73).

    Carried in XLA's NATIVE dot_general order end-to-end: the attention map
    lives in (b,h,i,k) (softmax over the LANE axis k), the aggregation
    "bhik,bjkdh->bhijd" has batch dims (b,h) exactly as the TPU batched-dot
    emitter produces, and the split lin_O contraction "bhijd,dhw->bijw"
    lands directly in the output order — no relayout copy anywhere on the
    N^3 path and no final transpose. Measured 1.23x on the isolated 4-layer
    core (7.44 -> 6.06 ms fwd+bwd, TPU v5e, b=8 N=48;
    benchmarks/aggregate_variants.py); pure reassociation (f32 max err 6e-8).
    """
    dense = _aggregate_dense_or_none(p, e, mask, num_heads=num_heads,
                                     gated=True,
                                     attention_dropout=attention_dropout,
                                     deterministic=deterministic, rng=rng,
                                     use_pallas=use_pallas)
    if dense is not None:
        return dense
    b, n, _, w = e.shape
    d = w // num_heads
    e_ln = layernorm(p["tri_ln_e"], e)

    v_in, v_out = jnp.split(linear(p["lin_V"], e_ln), 2, axis=-1)
    e_in, g_in, e_out, g_out = jnp.split(linear(p["lin_EG"], e_ln), 4, axis=-1)

    v_in = v_in.reshape(b, n, n, d, num_heads)
    v_out = v_out.reshape(b, n, n, d, num_heads)

    r_in, r_out = (None, None) if deterministic else jax.random.split(rng)

    w_o = p["lin_O"]["w"].astype(e.dtype)
    w_o = w_o.reshape(d, 2 * num_heads, w_o.shape[1])

    def direction(e_l, g_l, v, r_dir, w_dir, transpose_pair, masked):
        if transpose_pair:
            # (b,i,k,h) -> (b,h,i,k) AND pair-transpose (k,i)->(i,k) in one
            # permute; V pair-transposed to match
            perm = (0, 3, 2, 1)
            v = jnp.swapaxes(v, 1, 2)
        else:
            perm = (0, 3, 1, 2)
        m = jnp.transpose(mask, perm) if masked else 0.0
        a = jax.nn.softmax(jnp.transpose(e_l, perm) + m, axis=-1)
        a = a * jax.nn.sigmoid(jnp.transpose(g_l, perm) + m)
        a = dropout(r_dir, a, attention_dropout, deterministic)
        va = jnp.einsum("bhik,bjkdh->bhijd", a, v)
        return jnp.einsum("bhijd,dhw->bijw", va, w_dir)

    # out-direction deliberately unmasked (reference quirk, see module doc)
    out = (direction(e_in, g_in, v_in, r_in, w_o[:, :num_heads], False, True)
           + direction(e_out, g_out, v_out, r_out, w_o[:, num_heads:],
                       True, False))
    return out + p["lin_O"]["b"].astype(e.dtype)


def triplet_aggregate_ungated(p: Dict[str, Params], e: jnp.ndarray,
                              mask: jnp.ndarray, *, num_heads: int,
                              attention_dropout: float = 0.0,
                              deterministic: bool = True,
                              rng: Optional[jax.Array] = None,
                              use_pallas=False) -> jnp.ndarray:
    """Ungated triplet aggregation (reference: triplet.py:77-127) — both
    directions masked here, unlike the gated variant. Same native dot-order
    layout as :func:`triplet_aggregate` (see its docstring)."""
    dense = _aggregate_dense_or_none(p, e, mask, num_heads=num_heads,
                                     gated=False,
                                     attention_dropout=attention_dropout,
                                     deterministic=deterministic, rng=rng,
                                     use_pallas=use_pallas)
    if dense is not None:
        return dense
    b, n, _, w = e.shape
    d = w // num_heads
    e_ln = layernorm(p["tri_ln_e"], e)

    v_in, v_out = jnp.split(linear(p["lin_V"], e_ln), 2, axis=-1)
    e_in, e_out = jnp.split(linear(p["lin_E"], e_ln), 2, axis=-1)

    v_in = v_in.reshape(b, n, n, d, num_heads)
    v_out = v_out.reshape(b, n, n, d, num_heads)

    r_in, r_out = (None, None) if deterministic else jax.random.split(rng)

    w_o = p["lin_O"]["w"].astype(e.dtype)
    w_o = w_o.reshape(d, 2 * num_heads, w_o.shape[1])

    def direction(e_l, v, r_dir, w_dir, transpose_pair):
        if transpose_pair:
            perm = (0, 3, 2, 1)
            v = jnp.swapaxes(v, 1, 2)
        else:
            perm = (0, 3, 1, 2)
        a = jax.nn.softmax(jnp.transpose(e_l, perm)
                           + jnp.transpose(mask, perm), axis=-1)
        a = dropout(r_dir, a, attention_dropout, deterministic)
        va = jnp.einsum("bhik,bjkdh->bhijd", a, v)
        return jnp.einsum("bhijd,dhw->bijw", va, w_dir)

    out = (direction(e_in, v_in, r_in, w_o[:, :num_heads], False)
           + direction(e_out, v_out, r_out, w_o[:, num_heads:], True))
    return out + p["lin_O"]["b"].astype(e.dtype)


# ---------------------------------------------------------------------------
# triangular update — AlphaFold-style gated triangle multiplication
# ---------------------------------------------------------------------------

def triangular_update_init(rng: jax.Array, edge_width: int,
                           num_heads: int) -> Dict[str, Params]:
    ks = jax.random.split(rng, 3)
    return {
        "tri_ln_e": layernorm_init(edge_width),
        "lin_V": linear_init(ks[0], edge_width, num_heads * 4),
        "lin_E": linear_init(ks[1], edge_width, num_heads * 4),
        "lin_O": linear_init(ks[2], num_heads * 2, edge_width * 2),
    }


def triangular_update(p: Dict[str, Params], e: jnp.ndarray, mask: jnp.ndarray,
                      *, num_heads: int, attention_dropout: float = 0.0,
                      deterministic: bool = True,
                      rng: Optional[jax.Array] = None) -> jnp.ndarray:
    """Gated linear triangle multiplication (reference: triplet.py:134-176)."""
    e_ln = layernorm(p["tri_ln_e"], e)

    v_in_g, v_in_l, v_out_g, v_out_l = jnp.split(linear(p["lin_V"], e_ln), 4, axis=-1)
    e_in_g, e_in_l, e_out_g, e_out_l = jnp.split(linear(p["lin_E"], e_ln), 4, axis=-1)

    v_in = siglin(v_in_g + mask, v_in_l)
    v_out = siglin(v_out_g + mask, v_out_l)
    e_in = siglin(e_in_g + mask, e_in_l)
    e_out = siglin(e_out_g + mask, e_out_l)

    va_in = jnp.einsum("bikh,bjkh->bijh", e_in, v_in)
    va_out = jnp.einsum("bkih,bkjh->bijh", e_out, v_out)

    va = jnp.concatenate([va_in, va_out], axis=-1)
    out_g, out_l = jnp.split(linear(p["lin_O"], va), 2, axis=-1)
    return siglin(out_g, out_l)


# ---------------------------------------------------------------------------
# attention (gated / ungated) and axial attention — O(N^3) logits
# ---------------------------------------------------------------------------

def triplet_attention_init(rng: jax.Array, edge_width: int, num_heads: int,
                           gated: bool = True) -> Dict[str, Params]:
    ks = jax.random.split(rng, 5)
    bias_dim = num_heads * 2 if gated else num_heads
    bias_name = "lin_EG" if gated else "lin_E"
    return {
        "tri_ln_e": layernorm_init(edge_width),
        "lin_QKV_in": linear_init(ks[0], edge_width, edge_width * 3),
        f"{bias_name}_in": linear_init(ks[1], edge_width, bias_dim),
        "lin_QKV_out": linear_init(ks[2], edge_width, edge_width * 3),
        f"{bias_name}_out": linear_init(ks[3], edge_width, bias_dim),
        "lin_O": linear_init(ks[4], edge_width * 2, edge_width),
    }


def _triplet_attention_impl(p, e, mask, *, num_heads, gated, attention_dropout,
                            deterministic, rng, use_pallas=False):
    if use_pallas == "dense":
        from tgt_tpu.ops.pallas.triplet_dense import (
            dense_unsupported_reason, triplet_attention_dense)
        reason = dense_unsupported_reason(
            e.shape[1], e.shape[-1], num_heads,
            itemsize=e.dtype.itemsize, bwd_nblocks=9,
            check_vmem=jax.default_backend() == "tpu")
        if reason is None:
            # attention dropout runs IN-KERNEL (hash-based keep mask, same
            # Bernoulli(1-rate) law as the jnp path's bernoulli draws but a
            # different bit stream) — no dropout fallback for 'dense'
            return triplet_attention_dense(p, e, mask,
                                           num_heads=num_heads,
                                           gated=gated,
                                           attention_dropout=attention_dropout,
                                           deterministic=deterministic,
                                           rng=rng)
        # unsupported geometry: fall through to the jnp path
        _warn_pallas_fallback(reason)
    elif use_pallas and (deterministic or attention_dropout == 0.0):
        from tgt_tpu.ops.pallas.triplet_attention import (
            triplet_attention_fused)
        return triplet_attention_fused(p, e, mask, num_heads=num_heads,
                                       gated=gated)
    elif use_pallas:
        # legacy fused kernel requested but attention_dropout > 0 in
        # training mode — only the dense kernel implements in-kernel dropout
        _warn_pallas_fallback(
            f"triplet attention_dropout={attention_dropout} > 0 in training "
            f"mode (the legacy fused kernel runs without in-kernel dropout; "
            f"set triplet_dropout: 0 or use_pallas: dense to keep a kernel)")
    b, n, _, w = e.shape
    d = w // num_heads
    scale = d ** -0.5
    e_ln = layernorm(p["tri_ln_e"], e)
    r_in, r_out = (None, None) if deterministic else jax.random.split(rng)

    # N^3 logits carried in XLA's NATIVE dot_general output order end-to-end:
    # "bijdh,bjkdh->bjhik" puts batch dims (b,j,h) first, then lhs-free i,
    # rhs-free k — exactly what the TPU batched-dot emitter produces — so no
    # relayout copy is inserted after QK, softmax, AV, or the split lin_O.
    # Both directions come out pair-transposed (b,j,i,w); ONE N^2-channel
    # transpose at the very end restores (b,i,j,w). Measured 18.87 vs 19.68
    # ms for the previous k-minor spelling on the isolated 4-layer core
    # (fwd+bwd, TPU v5e, b=8 N=48; benchmarks/triplet_variants.py v5 vs v4),
    # bitwise-equal numerics.
    w_o = p["lin_O"]["w"].astype(e.dtype)
    w_o = w_o.reshape(d, 2 * num_heads, w_o.shape[1])

    def direction(which, r_dir, w_dir, transpose_pair):
        # "in": for (i,j) attend over k via edges (j,k), biased/gated by
        # (i,k). "out": same computation on pair-transposed K/V/bias/mask
        # (bitwise-equal to the reference's direct bkijh form).
        q, k, v = jnp.split(linear(p[f"lin_QKV_{which}"], e_ln), 3, axis=-1)
        # named for selective remat (cfg.remat_policy='proj'): saving the
        # N^2-sized projection outputs lets the backward recompute skip the
        # QKV/EG matmuls + layernorm while still recomputing the N^3 chain
        q = checkpoint_name(q.reshape(b, n, n, d, num_heads) * scale,
                            "tri_proj")
        k = checkpoint_name(k.reshape(b, n, n, d, num_heads), "tri_proj")
        v = checkpoint_name(v.reshape(b, n, n, d, num_heads), "tri_proj")
        if gated:
            e_b, g_b = jnp.split(linear(p[f"lin_EG_{which}"], e_ln), 2, axis=-1)
            e_b = checkpoint_name(e_b, "tri_proj")
            g_b = checkpoint_name(g_b, "tri_proj")
        else:
            e_b = checkpoint_name(linear(p[f"lin_E_{which}"], e_ln),
                                  "tri_proj")
            g_b = None
        m = mask
        if transpose_pair:
            k = jnp.swapaxes(k, 1, 2)
            v = jnp.swapaxes(v, 1, 2)
            e_b = jnp.swapaxes(e_b, 1, 2)
            g_b = None if g_b is None else jnp.swapaxes(g_b, 1, 2)
            m = jnp.swapaxes(mask, 1, 2)
        # bias/gate live on (b,i,k,h): bring to (b,1,h,i,k) — N^2, cheap
        s = jnp.einsum("bijdh,bjkdh->bjhik", q, k) \
            + jnp.transpose(e_b + m, (0, 3, 1, 2))[:, None]
        a = jax.nn.softmax(s, axis=-1)
        if gated:
            a = a * jax.nn.sigmoid(
                jnp.transpose(g_b + m, (0, 3, 1, 2)))[:, None]
        a = dropout(r_dir, a, attention_dropout, deterministic)
        # named for selective rematerialization (cfg.remat_policy='tri_a'):
        # saving the gated attention weights lets the backward pass reuse
        # them instead of recomputing the N^3 softmax chain
        a = checkpoint_name(a, "tri_a")
        va = jnp.einsum("bjhik,bjkdh->bjhid", a, v)
        # split lin_O: contract (d,h) straight out of this direction's
        # aggregation (see the SPLIT lin_O note at the top of this module)
        return jnp.einsum("bjhid,dhw->bjiw", va, w_dir)

    out_t = (direction("in", r_in, w_o[:, :num_heads], False)
             + direction("out", r_out, w_o[:, num_heads:], True))
    return jnp.swapaxes(out_t, 1, 2) + p["lin_O"]["b"].astype(e.dtype)


def triplet_attention(p, e, mask, *, num_heads, attention_dropout=0.0,
                      deterministic=True, rng=None, use_pallas=False):
    """Gated triplet attention (reference: triplet.py:179-250)."""
    return _triplet_attention_impl(p, e, mask, num_heads=num_heads, gated=True,
                                   attention_dropout=attention_dropout,
                                   deterministic=deterministic, rng=rng,
                                   use_pallas=use_pallas)


def triplet_attention_ungated(p, e, mask, *, num_heads, attention_dropout=0.0,
                              deterministic=True, rng=None, use_pallas=False):
    """Ungated triplet attention (reference: triplet.py:253-322)."""
    return _triplet_attention_impl(p, e, mask, num_heads=num_heads, gated=False,
                                   attention_dropout=attention_dropout,
                                   deterministic=deterministic, rng=rng,
                                   use_pallas=use_pallas)


def axial_attention_init(rng: jax.Array, edge_width: int,
                         num_heads: int) -> Dict[str, Params]:
    ks = jax.random.split(rng, 3)
    return {
        "tri_ln_e": layernorm_init(edge_width),
        "lin_QKV_in": linear_init(ks[0], edge_width, edge_width * 3),
        "lin_QKV_out": linear_init(ks[1], edge_width, edge_width * 3),
        "lin_O": linear_init(ks[2], edge_width * 2, edge_width),
    }


def axial_attention(p, e, mask, *, num_heads, attention_dropout=0.0,
                    deterministic=True, rng=None):
    """Row/column attention without E/G bias (reference: triplet.py:325-387)."""
    b, n, _, w = e.shape
    d = w // num_heads
    scale = d ** -0.5
    e_ln = layernorm(p["tri_ln_e"], e)
    r_in, r_out = (None, None) if deterministic else jax.random.split(rng)

    # native dot-order (b,j,h,i,k) logits layout, see _triplet_attention_impl
    w_o = p["lin_O"]["w"].astype(e.dtype)
    w_o = w_o.reshape(d, 2 * num_heads, w_o.shape[1])

    def direction(which, r_dir, w_dir, transpose_pair):
        q, k, v = jnp.split(linear(p[f"lin_QKV_{which}"], e_ln), 3, axis=-1)
        q = q.reshape(b, n, n, d, num_heads) * scale
        k = k.reshape(b, n, n, d, num_heads)
        v = v.reshape(b, n, n, d, num_heads)
        m = mask
        if transpose_pair:
            k = jnp.swapaxes(k, 1, 2)
            v = jnp.swapaxes(v, 1, 2)
            m = jnp.swapaxes(mask, 1, 2)
        # mask (b,i,k,1) -> (b,1,1,i,k), broadcast over (j,h)
        s = jnp.einsum("bijdh,bjkdh->bjhik", q, k) \
            + jnp.transpose(m, (0, 3, 1, 2))[:, None]
        a = jax.nn.softmax(s, axis=-1)
        a = dropout(r_dir, a, attention_dropout, deterministic)
        va = jnp.einsum("bjhik,bjkdh->bjhid", a, v)
        return jnp.einsum("bjhid,dhw->bjiw", va, w_dir)

    out_t = (direction("in", r_in, w_o[:, :num_heads], False)
             + direction("out", r_out, w_o[:, num_heads:], True))
    return jnp.swapaxes(out_t, 1, 2) + p["lin_O"]["b"].astype(e.dtype)


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

TRIPLET_VARIANTS = ("aggregate", "aggregate_ungated", "attention",
                    "attention_ungated", "triangular_update", "axial_attention")


def get_triplet_init(variant: str) -> Callable:
    variant = _canon(variant)
    return {
        "aggregate": lambda rng, w, h: triplet_aggregate_init(rng, w, h, gated=True),
        "aggregate_ungated": lambda rng, w, h: triplet_aggregate_init(rng, w, h, gated=False),
        "attention": lambda rng, w, h: triplet_attention_init(rng, w, h, gated=True),
        "attention_ungated": lambda rng, w, h: triplet_attention_init(rng, w, h, gated=False),
        "triangular_update": triangular_update_init,
        "axial_attention": axial_attention_init,
    }[variant]


def get_triplet_apply(variant: str) -> Callable:
    variant = _canon(variant)
    return {
        "aggregate": triplet_aggregate,
        "aggregate_ungated": triplet_aggregate_ungated,
        "attention": triplet_attention,
        "attention_ungated": triplet_attention_ungated,
        "triangular_update": triangular_update,
        "axial_attention": axial_attention,
    }[variant]


def _canon(variant: str) -> str:
    # accept the reference's registry typo (triplet.py:15)
    if variant == "tiangular_update":
        return "triangular_update"
    if variant not in TRIPLET_VARIANTS:
        raise ValueError(f"invalid triplet variant: {variant}")
    return variant
