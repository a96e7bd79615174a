"""Pair-sharded TGT layer: the full edge-block-partitioned forward.

Extends parallel/ring.py from the triplet op to the whole layer stack
(SURVEY.md §5.7 north star): the edge channel e — the memory- and
compute-dominant state, O(N^2) with O(N^3) interactions — lives i-row-sharded
across the ``pair`` mesh axis for the entire forward; node states h are tiny
(b, N, W_h) and travel replicated.

Per layer, under shard_map:
- EGT attention: each device computes H_hat rows for its i-block from the
  replicated h and its local e rows; the node update needs softmax over ALL
  source nodes m, which is row-local math; the updated h block is
  all-gathered back to full (one cheap collective on the small tensor).
- triplet interaction: the ring/all_to_all path (parallel/ring.py).
- FFNs / layernorms / residuals: row-local, no communication.

Peak per-device edge-channel memory drops by the pair-axis size P, which is
what lets bigger graphs / batches fit — the graph analog of context
parallelism. Verified equal to the unsharded encoder in tests/test_ring.py.

shard_map usage (note ``check_vma=False``: h is value-replicated after the
all_gather but the varying-manual-axes checker can't prove it):

    fn = functools.partial(encoder_pair_sharded, cfg=cfg)
    h, e_local = jax.shard_map(
        fn, mesh=mesh,
        in_specs=(P(), P(), P(None, 'pair'), P(None, 'pair')),
        out_specs=(P(), P(None, 'pair')), check_vma=False,
    )(params, h, e, mask)
"""
from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp

from tgt_tpu.models.model_config import TGTConfig
from tgt_tpu.ops.common import layernorm, linear
from tgt_tpu.parallel.mesh import PAIR_AXIS
from tgt_tpu.parallel.ring import triplet_attention_ring


def _egt_attention_rows(p, h_full, e_local, mask_local, *, num_heads,
                        scale_degree, edge_update, axis_name):
    """EGT attention with i-row-sharded e. Returns (h_rows_local, e_local')."""
    b, n, node_width = h_full.shape
    i_loc = e_local.shape[1]
    d = node_width // num_heads
    scale = d ** -0.5

    h_ln = layernorm(p["mha_ln_h"], h_full)
    e_ln = layernorm(p["mha_ln_e"], e_local)

    q, k, v = jnp.split(linear(p["lin_QKV"], h_ln), 3, axis=-1)
    e_b, g_b = jnp.split(linear(p["lin_EG"], e_ln), 2, axis=-1)

    # local query rows: this device's i-block of nodes
    my = jax.lax.axis_index(axis_name)
    q_rows = jax.lax.dynamic_slice_in_dim(q, my * i_loc, i_loc, axis=1)

    q_rows = q_rows.reshape(b, i_loc, d, num_heads) * scale
    k = k.reshape(b, n, d, num_heads)
    v = v.reshape(b, n, d, num_heads)

    gates = jax.nn.sigmoid(g_b + mask_local)
    h_hat = jnp.einsum("bldh,bmdh->blmh", q_rows, k) + e_b
    a = jax.nn.softmax(h_hat + mask_local, axis=2) * gates
    v_att = jnp.einsum("blmh,bmdh->bldh", a, v)
    if scale_degree:
        v_att = v_att * jnp.log1p(jnp.sum(gates, axis=2, keepdims=True))
    h_rows = linear(p["lin_O_h"], v_att.reshape(b, i_loc, node_width))
    e_out = linear(p["lin_O_e"], h_hat) if edge_update else None
    return h_rows, e_out


def _gather_rows(x_local: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """(b, i_loc, ...) row blocks -> full (b, N, ...), replicated."""
    g = jax.lax.all_gather(x_local, axis_name)      # (P, b, i_loc, ...)
    g = jnp.moveaxis(g, 0, 1)                        # (b, P, i_loc, ...)
    return g.reshape(g.shape[0], -1, *g.shape[3:])


def tgt_layer_pair_sharded(p: Dict[str, Any], h_full: jnp.ndarray,
                           e_local: jnp.ndarray, mask_local: jnp.ndarray,
                           cfg: TGTConfig,
                           axis_name: str = PAIR_AXIS):
    """One TGT layer with row-sharded e (deterministic path).

    h_full (b, N, Wh) replicated; e_local (b, N/P, N, We);
    mask_local (b, N/P, N, 1). Returns updated (h_full, e_local).
    Semantics match models/encoder.tgt_layer_apply with deterministic=True
    for the triplet-attention variants.
    """
    h_up_rows, e_up = _egt_attention_rows(
        p["update"], h_full, e_local, mask_local,
        num_heads=cfg.num_heads, scale_degree=cfg.scale_degree,
        edge_update=True, axis_name=axis_name)

    from tgt_tpu.ops.ffn import ffn
    h = h_full + _gather_rows(h_up_rows, axis_name)
    h = h + ffn(p["node_ffn"], h, activation=cfg.activation)

    e = e_local + e_up
    if cfg.triplet_enabled:
        if cfg.triplet_type not in ("attention", "attention_ungated"):
            raise NotImplementedError(
                "pair-sharded path supports the triplet attention variants")
        tri = triplet_attention_ring(p["tria"], e, mask_local,
                                     num_heads=cfg.triplet_heads,
                                     axis_name=axis_name)
        e = e + tri
    e = e + ffn(p["edge_ffn"], e, activation=cfg.activation)
    return h, e


def encoder_pair_sharded(params: Dict[str, Any], h: jnp.ndarray,
                         e_local: jnp.ndarray, mask_local: jnp.ndarray,
                         cfg: TGTConfig, axis_name: str = PAIR_AXIS):
    """Full encoder stack under pair sharding (deterministic inference path;
    uniform both-ended layers — i.e. the TGT_Multi/pretrain topology)."""
    n_inner = cfg.model_height - 1

    def body(carry, layer_p):
        h, e = carry
        for _ in range(cfg.layer_multiplier):
            h, e = tgt_layer_pair_sharded(layer_p, h, e, mask_local, cfg,
                                          axis_name)
        return (h, e), None

    # the replicated h input is device-invariant but becomes varying through
    # the layer body; mark it so scan carry types match (e_local, a sharded
    # input, is already varying)
    h = jax.lax.pvary(h, axis_name)
    if n_inner > 0:
        (h, e_local), _ = jax.lax.scan(body, (h, e_local), params["layers"])
    for _ in range(cfg.layer_multiplier):
        h, e_local = tgt_layer_pair_sharded(params["last"], h, e_local,
                                            mask_local, cfg, axis_name)
    return h, e_local
