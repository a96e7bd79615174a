"""Fused Pallas TPU kernel for triplet attention.

The O(N^3) triplet attention (reference: lib/tgt/layers/triplet.py:179-250)
decomposes per (batch, j): both the "in" and "out" directions are standard
biased-gated attention over k for each query i, with the (i, k)-indexed
bias/gate shared across j:

  in : S[i,k] = Q[i,j]·K[j,k]·scale + E_in[i,k];  softmax_k; gate σ(G_in[i,k])
  out: S[i,k] = Q[i,j]·K[k,j]·scale + E_out[k,i]; softmax_k; gate σ(G_out[k,i])

After pre-transposing operands to a head-major per-j layout
  q_t, k_t, v_t: (b, h, Nj, N, d),  bias, gate: (b, h, Ni, Nk)
one kernel serves both directions. The (b, N, N, N, h) logits tensor never
exists in HBM — logit tiles live in VMEM registers only.

Kernel geometry: grid (b, h) — coarse on purpose. Each cell DMAs its whole
(Nj, N, d) q/k/v slabs (~10-100KB — large enough to amortize DMA fixed cost;
a per-(b,h,j) grid issues thousands of ~1.5KB DMAs and is DMA-latency-bound)
and loops over j with `fori_loop`, computing (N, N) logits + masked softmax +
sigmoid gate + V-aggregation per step. dbias/dgate accumulate in VMEM across
the j loop inside the cell (each (b, h) owns its bias gradient block).

The backward pass is a second recompute-style kernel (no N^3 residuals).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fwd_kernel(q_ref, k_ref, v_ref, bias_ref, gate_ref, o_ref, *, scale):
    nj = q_ref.shape[2]
    bias = bias_ref[0, 0].astype(jnp.float32)
    gate = jax.nn.sigmoid(gate_ref[0, 0].astype(jnp.float32))

    def body(j, _):
        q = q_ref[0, 0, j]
        k = k_ref[0, 0, j]
        v = v_ref[0, 0, j]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale + bias
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        a = (e / jnp.sum(e, axis=-1, keepdims=True)) * gate
        o_ref[0, 0, j] = jnp.dot(a.astype(v.dtype), v,
                                 preferred_element_type=jnp.float32
                                 ).astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, nj, body, 0)


def _bwd_kernel(q_ref, k_ref, v_ref, bias_ref, gate_ref, do_ref,
                dq_ref, dk_ref, dv_ref, dbias_ref, dgate_ref, *, scale):
    nj = q_ref.shape[2]
    bias = bias_ref[0, 0].astype(jnp.float32)
    g = jax.nn.sigmoid(gate_ref[0, 0].astype(jnp.float32))

    dbias_ref[0, 0] = jnp.zeros(dbias_ref.shape[2:], dbias_ref.dtype)
    dgate_ref[0, 0] = jnp.zeros(dgate_ref.shape[2:], dgate_ref.dtype)

    def body(j, _):
        q = q_ref[0, 0, j]
        k = k_ref[0, 0, j]
        v = v_ref[0, 0, j]
        do = do_ref[0, 0, j].astype(jnp.float32)

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale + bias
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        a = p * g

        dv_ref[0, 0, j] = jax.lax.dot_general(
            a.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dv_ref.dtype)
        da = jax.lax.dot_general(
            do, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dgate_ref[0, 0] += (da * p * g * (1.0 - g)).astype(dgate_ref.dtype)
        dp = da * g
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dbias_ref[0, 0] += ds.astype(dbias_ref.dtype)

        dsv = ds.astype(q.dtype)
        dq_ref[0, 0, j] = (jnp.dot(dsv, k, preferred_element_type=jnp.float32)
                           * scale).astype(dq_ref.dtype)
        dk_ref[0, 0, j] = (jax.lax.dot_general(
            dsv, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale).astype(dk_ref.dtype)
        return 0

    jax.lax.fori_loop(0, nj, body, 0)


def _specs(nj, n, d):
    qkv = pl.BlockSpec((1, 1, nj, n, d), lambda b, h: (b, h, 0, 0, 0))
    bias = pl.BlockSpec((1, 1, n, n), lambda b, h: (b, h, 0, 0))
    return qkv, bias


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _triplet_core(q_t, k_t, v_t, bias, gate, scale):
    return _triplet_core_fwd_impl(q_t, k_t, v_t, bias, gate, scale)


def _triplet_core_fwd_impl(q_t, k_t, v_t, bias, gate, scale):
    b, h, nj, n, d = q_t.shape
    qkv_spec, bias_spec = _specs(nj, n, d)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale),
        grid=(b, h),
        in_specs=[qkv_spec, qkv_spec, qkv_spec, bias_spec, bias_spec],
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct(q_t.shape, q_t.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
    )(q_t, k_t, v_t, bias, gate)


def _triplet_core_fwd(q_t, k_t, v_t, bias, gate, scale):
    out = _triplet_core_fwd_impl(q_t, k_t, v_t, bias, gate, scale)
    return out, (q_t, k_t, v_t, bias, gate)


def _triplet_core_bwd(scale, res, g_out):
    q_t, k_t, v_t, bias, gate = res
    b, h, nj, n, d = q_t.shape
    qkv_spec, bias_spec = _specs(nj, n, d)
    dq, dk, dv, dbias, dgate = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale),
        grid=(b, h),
        in_specs=[qkv_spec, qkv_spec, qkv_spec, bias_spec, bias_spec,
                  qkv_spec],
        out_specs=[qkv_spec, qkv_spec, qkv_spec, bias_spec, bias_spec],
        out_shape=[
            jax.ShapeDtypeStruct(q_t.shape, q_t.dtype),
            jax.ShapeDtypeStruct(k_t.shape, k_t.dtype),
            jax.ShapeDtypeStruct(v_t.shape, v_t.dtype),
            jax.ShapeDtypeStruct(bias.shape, jnp.float32),
            jax.ShapeDtypeStruct(gate.shape, jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
    )(q_t, k_t, v_t, bias, gate, g_out)
    return dq, dk, dv, dbias.astype(bias.dtype), dgate.astype(gate.dtype)


_triplet_core.defvjp(_triplet_core_fwd, _triplet_core_bwd)


def triplet_biased_attention(q_t: jnp.ndarray, k_t: jnp.ndarray,
                             v_t: jnp.ndarray, bias: jnp.ndarray,
                             gate: jnp.ndarray, scale: float) -> jnp.ndarray:
    """Per-j biased gated attention.

    q_t/k_t/v_t: (b, h, Nj, N, d); bias/gate: (b, h, Ni, Nk) with the additive
    mask already folded in. Returns (b, h, Nj, Ni, d) f32-accumulated outputs
    in q_t.dtype.
    """
    return _triplet_core(q_t, k_t, v_t, bias, gate, scale)


# ---------------------------------------------------------------------------
# model-facing wrapper: same params/semantics as ops/triplet.triplet_attention
# ---------------------------------------------------------------------------

def _split_heads(x, d, h):
    """(b, N, N, d*h) -> (b, N, N, d, h) with head-fastest layout (parity with
    the reference's .view, lib/tgt/layers/triplet.py:213-215)."""
    b, n, _, _ = x.shape
    return x.reshape(b, n, n, d, h)


def triplet_attention_fused(p, e, mask, *, num_heads: int,
                            gated: bool = True) -> jnp.ndarray:
    """Drop-in fused forward for gated/ungated triplet attention.

    Projections and the output linear run in XLA (they are MXU-friendly
    GEMMs); the O(N^3) logit/softmax/aggregate core runs in the Pallas kernel
    for both directions. Numerics match ops/triplet.triplet_attention
    (without attention dropout — the published configs use
    triplet_dropout=0; the jnp path handles the dropout>0 case).
    """
    from tgt_tpu.ops.common import layernorm, linear

    b, n, _, w = e.shape
    h = num_heads
    d = w // h
    scale = d ** -0.5
    e_ln = layernorm(p["tri_ln_e"], e)
    mask3 = mask[..., 0]                               # (b, N, N) additive

    def direction_operands(qkv_name, bias_name, transpose_bias):
        """Build the kernel operands for one direction (no kernel call)."""
        q, k, v = jnp.split(linear(p[qkv_name], e_ln), 3, axis=-1)
        q = _split_heads(q, d, h)
        k = _split_heads(k, d, h)
        v = _split_heads(v, d, h)
        if gated:
            e_b, g_b = jnp.split(linear(p[bias_name], e_ln), 2, axis=-1)
        else:
            e_b = linear(p[bias_name], e_ln)
            g_b = None
        if transpose_bias:
            e_b = jnp.swapaxes(e_b, 1, 2)
            if g_b is not None:
                g_b = jnp.swapaxes(g_b, 1, 2)
            m = jnp.swapaxes(mask3, 1, 2)
        else:
            m = mask3
        bias = (e_b + m[..., None]).transpose(0, 3, 1, 2)
        gate = ((g_b + m[..., None]).transpose(0, 3, 1, 2) if gated
                else jnp.full_like(bias, 30.0))
        if transpose_bias:
            k_t = k.transpose(0, 4, 2, 1, 3)
            v_t = v.transpose(0, 4, 2, 1, 3)
        else:
            k_t = k.transpose(0, 4, 1, 2, 3)
            v_t = v.transpose(0, 4, 1, 2, 3)
        q_t = q.transpose(0, 4, 2, 1, 3)
        return q_t, k_t, v_t, bias, gate

    names = (("lin_QKV_in", "lin_EG_in") if gated
             else ("lin_QKV_in", "lin_E_in"),
             ("lin_QKV_out", "lin_EG_out") if gated
             else ("lin_QKV_out", "lin_E_out"))
    ops_in = direction_operands(*names[0], False)
    ops_out = direction_operands(*names[1], True)
    # both directions share the per-j attention algebra — stack them along
    # the head-grid axis and run ONE kernel (halves kernel launches per layer)
    stacked = tuple(jnp.concatenate([a, b_], axis=1)
                    for a, b_ in zip(ops_in, ops_out))
    out_t = triplet_biased_attention(*stacked, scale)
    # (b, 2h, j, i, d) -> split directions -> (b, i, j, d, h) each
    va_in = out_t[:, :h].transpose(0, 3, 2, 4, 1)
    va_out = out_t[:, h:].transpose(0, 3, 2, 4, 1)
    va = jnp.concatenate([va_in, va_out], axis=-1).reshape(b, n, n, w * 2)
    return linear(p["lin_O"], va)
