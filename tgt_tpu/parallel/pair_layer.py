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

Covers the attention AND aggregate triplet variants (gated + ungated), and
supports the stochastic path (dropout / drop-path / source-dropout) so a
pair-sharded TRAINING step can be expressed — see tgt_layer_pair_sharded's
rng notes. The production Trainer reaches pair sharding through GSPMD
(num_pair_devices in the scheme config, training/harness.py); this explicit
shard_map path is the hand-overlapped ring alternative for ICI-bound scaling.

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
from tgt_tpu.ops.common import drop_path, layernorm, linear
from tgt_tpu.parallel.mesh import PAIR_AXIS
from tgt_tpu.parallel.ring import (triplet_aggregate_ring,
                                   triplet_attention_ring)


def _egt_attention_rows(p, h_full, e_local, mask_local, *, num_heads,
                        scale_degree, edge_update, axis_name,
                        source_dropout=0.0, deterministic=True, rng=None):
    """EGT attention with i-row-sharded e. Returns (h_rows_local, e_local').

    source_dropout drops whole source columns (the m axis, which is NOT
    sharded); the same rng on every device keeps the dropped columns
    consistent across i-blocks, matching the unsharded op's semantics
    (ops/attention.py; reference layers.py:55-59)."""
    b, n, node_width = h_full.shape
    i_loc = e_local.shape[1]
    d = node_width // num_heads
    scale = d ** -0.5

    if source_dropout > 0.0 and not deterministic:
        from tgt_tpu.core.graph import MASK_VALUE
        drop = jax.random.bernoulli(rng, source_dropout, (b, 1, n, 1))
        mask_local = mask_local + drop.astype(mask_local.dtype) * MASK_VALUE

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
                           axis_name: str = PAIR_AXIS,
                           drop_path_rate: float = 0.0,
                           deterministic: bool = True,
                           rng=None):
    """One TGT layer with row-sharded e.

    h_full (b, N, Wh) replicated; e_local (b, N/P, N, We);
    mask_local (b, N/P, N, 1). Returns updated (h_full, e_local).
    Semantics match models/encoder.tgt_layer_apply for the attention and
    aggregate triplet variants.

    Stochastic mode (deterministic=False): drop-path masks are per-SAMPLE,
    so the same rng on every device keeps them consistent with the
    replicated h; edge-side activation dropout masks fold in the device
    index for independence across i-blocks (same distribution as the
    unsharded layer, not the same bits).
    """
    from tgt_tpu.ops.ffn import ffn

    if deterministic:
        r = [None] * 9
        r_edge = [None]
    else:
        if rng is None:
            raise ValueError(
                "tgt_layer_pair_sharded: rng is required when "
                "deterministic=False (stochastic pair-sharded training)")
        r = list(jax.random.split(rng, 9))
        my = jax.lax.axis_index(axis_name)
        r_edge = [jax.random.fold_in(r[7], my)]

    def dp(key, x):
        return drop_path(key, x, drop_path_rate, deterministic)

    h_up_rows, e_up = _egt_attention_rows(
        p["update"], h_full, e_local, mask_local,
        num_heads=cfg.num_heads, scale_degree=cfg.scale_degree,
        edge_update=True, axis_name=axis_name,
        source_dropout=cfg.source_dropout, deterministic=deterministic,
        rng=r[6])

    h = h_full + dp(r[0], _gather_rows(h_up_rows, axis_name))
    h = h + dp(r[1], ffn(p["node_ffn"], h, activation=cfg.activation,
                         act_dropout=cfg.node_act_dropout,
                         deterministic=deterministic, rng=r[2]))

    e = e_local + dp(r[3], e_up)
    if cfg.triplet_enabled:
        if cfg.triplet_type in ("attention", "attention_ungated"):
            tri = triplet_attention_ring(
                p["tria"], e, mask_local, num_heads=cfg.triplet_heads,
                gated=cfg.triplet_type == "attention", axis_name=axis_name,
                attention_dropout=cfg.triplet_dropout,
                deterministic=deterministic, rng=r[8])
        elif cfg.triplet_type in ("aggregate", "aggregate_ungated"):
            tri = triplet_aggregate_ring(
                p["tria"], e, mask_local, num_heads=cfg.triplet_heads,
                gated=cfg.triplet_type == "aggregate", axis_name=axis_name,
                attention_dropout=cfg.triplet_dropout,
                deterministic=deterministic, rng=r[8])
        else:
            raise NotImplementedError(
                "pair-sharded path supports the attention/aggregate triplet "
                f"variants, not {cfg.triplet_type}")
        e = e + dp(r[4], tri)
    e = e + dp(r[5], ffn(p["edge_ffn"], e, activation=cfg.activation,
                         act_dropout=cfg.edge_act_dropout,
                         deterministic=deterministic, rng=r_edge[0]))
    return h, e


def encoder_pair_sharded(params: Dict[str, Any], h: jnp.ndarray,
                         e_local: jnp.ndarray, mask_local: jnp.ndarray,
                         cfg: TGTConfig, axis_name: str = PAIR_AXIS,
                         deterministic: bool = True, rng=None):
    """Full encoder stack under pair sharding (uniform both-ended layers —
    i.e. the TGT_Multi/pretrain topology). ``deterministic=False`` enables
    dropout / drop-path (see tgt_layer_pair_sharded for rng semantics),
    which makes the pair-sharded stack TRAINABLE."""
    n_inner = cfg.model_height - 1
    h_total = cfg.model_height

    if rng is None:
        layer_keys = None
    else:
        layer_keys = jax.random.split(rng, h_total * cfg.layer_multiplier)
        layer_keys = layer_keys.reshape(
            h_total, cfg.layer_multiplier, *layer_keys.shape[1:])
        # same keys on every device (see tgt_layer_pair_sharded); mark
        # varying so they can enter the scan carry/xs uniformly
        layer_keys = jax.lax.pcast(layer_keys, axis_name, to="varying")

    dp_rates = jnp.asarray([cfg.drop_path_rate(i) for i in range(h_total)],
                           jnp.float32)

    def apply_layer(layer_p, h, e, dp_rate, rep_keys):
        for m in range(cfg.layer_multiplier):
            k = None if rep_keys is None else rep_keys[m]
            h, e = tgt_layer_pair_sharded(layer_p, h, e, mask_local, cfg,
                                          axis_name, drop_path_rate=dp_rate,
                                          deterministic=deterministic, rng=k)
        return h, e

    def body(carry, xs):
        h, e = carry
        if layer_keys is None:
            layer_p, dp_rate = xs
            rep_keys = None
        else:
            layer_p, dp_rate, rep_keys = xs
        h, e = apply_layer(layer_p, h, e, dp_rate, rep_keys)
        return (h, e), None

    # the replicated h input is device-invariant but becomes varying through
    # the layer body; mark it so scan carry types match (e_local, a sharded
    # input, is already varying)
    h = jax.lax.pcast(h, axis_name, to="varying")
    dp_rates = jax.lax.pcast(dp_rates, axis_name, to="varying")
    if n_inner > 0:
        xs = (params["layers"], dp_rates[:n_inner])
        if layer_keys is not None:
            xs = xs + (layer_keys[:n_inner],)
        (h, e_local), _ = jax.lax.scan(body, (h, e_local), xs)
    h, e_local = apply_layer(params["last"], h, e_local,
                             dp_rates[h_total - 1],
                             None if layer_keys is None else layer_keys[-1])
    return h, e_local
