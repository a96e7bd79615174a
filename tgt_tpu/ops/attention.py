"""EGT pairwise attention: the node<->edge channel core, pure-jnp reference.

Semantics match the reference EGT_Attention / EdgeUpdate
(lib/tgt/layers/layers.py:15-130):

  H_hat[b,l,m,h] = (Q[b,l,:,h] . K[b,m,:,h]) * d^-0.5 + E[b,l,m,h]
  A = softmax_m(H_hat + mask) * sigmoid(G + mask)           (gated softmax)
  node out = lin_O_h( einsum(A, V) [* ln(1 + sum_m gates)] )  (degree scaler)
  edge out = lin_O_e(H_hat)                                  (heads -> edge_width)

source_dropout randomly adds MASK_VALUE to whole source columns during
training (lib/tgt/layers/layers.py:55-59).

Note the head layout: the feature axis splits as (dot_dim, num_heads) with the
head index fastest — this matches the reference's `.view(b, N, dot, heads)` and
matters for checkpoint parity.

This jnp path IS the production implementation: XLA fuses the QK^T+E bias,
gated softmax, degree scaler and output projections onto the MXU well (the
N^2 attention is a small fraction of step time next to the N^3 triplet ops —
see CLAUDE.md's measured breakdown), so no Pallas kernel is provided for it.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from tgt_tpu.core.graph import MASK_VALUE
from tgt_tpu.ops.common import Params, layernorm, layernorm_init, linear, linear_init


def egt_attention_init(rng: jax.Array, node_width: int, edge_width: int,
                       num_heads: int, edge_update: bool = True) -> Dict[str, Params]:
    ks = jax.random.split(rng, 4)
    p = {
        "mha_ln_h": layernorm_init(node_width),
        "mha_ln_e": layernorm_init(edge_width),
        "lin_QKV": linear_init(ks[0], node_width, node_width * 3),
        "lin_EG": linear_init(ks[1], edge_width, num_heads * 2),
        "lin_O_h": linear_init(ks[2], node_width, node_width),
    }
    if edge_update:
        p["lin_O_e"] = linear_init(ks[3], num_heads, edge_width)
    return p


def egt_attention(p: Dict[str, Params],
                  h: jnp.ndarray, e: jnp.ndarray, mask: jnp.ndarray,
                  *, num_heads: int,
                  scale_degree: bool = True,
                  edge_update: bool = True,
                  source_dropout: float = 0.0,
                  deterministic: bool = True,
                  rng: Optional[jax.Array] = None,
                  ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Gated pairwise attention. Returns (node_update, edge_update_or_None)."""
    b, n, node_width = h.shape
    dot_dim = node_width // num_heads
    scale = dot_dim ** -0.5

    h_ln = layernorm(p["mha_ln_h"], h)
    e_ln = layernorm(p["mha_ln_e"], e)

    qkv = linear(p["lin_QKV"], h_ln)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    eg = linear(p["lin_EG"], e_ln)
    e_bias, g_bias = jnp.split(eg, 2, axis=-1)  # (b, n, n, heads) each

    if source_dropout > 0.0 and not deterministic:
        drop = jax.random.bernoulli(rng, source_dropout, (b, 1, n, 1))
        mask = mask + drop.astype(mask.dtype) * MASK_VALUE

    # head-fastest layout: (b, n, dot_dim, heads)
    q = q.reshape(b, n, dot_dim, num_heads) * scale
    k = k.reshape(b, n, dot_dim, num_heads)
    v = v.reshape(b, n, dot_dim, num_heads)

    gates = jax.nn.sigmoid(g_bias + mask)
    h_hat = jnp.einsum("bldh,bmdh->blmh", q, k) + e_bias
    a = jax.nn.softmax(h_hat + mask, axis=2) * gates
    v_att = jnp.einsum("blmh,bmdh->bldh", a, v)

    if scale_degree:
        # (b, l, 1, h) broadcasts over v_att's dot_dim axis
        # (reference: lib/tgt/layers/layers.py:8-12,73-75)
        degrees = jnp.sum(gates, axis=2, keepdims=True)
        v_att = v_att * jnp.log1p(degrees)

    v_att = v_att.reshape(b, n, node_width)
    h_out = linear(p["lin_O_h"], v_att)
    e_out = linear(p["lin_O_e"], h_hat) if edge_update else None
    return h_out, e_out


def edge_update_init(rng: jax.Array, node_width: int, edge_width: int,
                     num_heads: int) -> Dict[str, Params]:
    ks = jax.random.split(rng, 3)
    return {
        "mha_ln_h": layernorm_init(node_width),
        "mha_ln_e": layernorm_init(edge_width),
        "lin_QK": linear_init(ks[0], node_width, node_width * 2),
        "lin_E": linear_init(ks[1], edge_width, num_heads),
        "lin_O_e": linear_init(ks[2], num_heads, edge_width),
    }


def edge_update(p: Dict[str, Params],
                h: jnp.ndarray, e: jnp.ndarray, mask: jnp.ndarray,
                *, num_heads: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """QK-only edge update (last layer of edge-ended stacks).

    Reference: lib/tgt/layers/layers.py:87-130. Returns (h unchanged, e_out).
    """
    b, n, node_width = h.shape
    dot_dim = node_width // num_heads
    scale = dot_dim ** -0.5

    h_ln = layernorm(p["mha_ln_h"], h)
    e_ln = layernorm(p["mha_ln_e"], e)

    qk = linear(p["lin_QK"], h_ln)
    q, k = jnp.split(qk, 2, axis=-1)
    e_bias = linear(p["lin_E"], e_ln)

    q = q.reshape(b, n, dot_dim, num_heads) * scale
    k = k.reshape(b, n, dot_dim, num_heads)

    h_hat = jnp.einsum("bldh,bmdh->blmh", q, k) + e_bias
    e_out = linear(p["lin_O_e"], h_hat)
    return h, e_out
