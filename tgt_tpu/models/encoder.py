"""TGT encoder stack — pre-LN residual layers over the Graph (h, e, mask) state.

Capability-parity with the reference TGT_Layer / TGT_Encoder
(lib/tgt/layers/layers.py:180-302, lib/tgt/encoder.py:24-90):

- per-layer: pairwise attention update (node+edge) -> residual; optional
  triplet sub-layer on the edge channel -> residual; node/edge FFNs ->
  residuals; all with per-sample drop-path on every residual branch.
- linear stochastic-depth ramp drop_path * i/(H-1) across the stack.
- ``layer_multiplier`` re-applies each layer k times (weight sharing).
- ``node_ended`` / ``edge_ended`` drop the unused update in the last layer
  (QK-only EdgeUpdate when node_update is off); ``egt_simple`` kills all edge
  updates.

TPU-first design notes (not in the reference): the uniform inner layers run
under ``jax.lax.scan`` over parameters stacked on a leading layer axis —
one compiled layer body instead of H inlined copies (fast compiles, small HLO)
— with optional per-layer rematerialization (``cfg.remat``) to trade FLOPs for
HBM. Residuals are functional; XLA fuses them into the producing ops.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from tgt_tpu.core.graph import Graph
from tgt_tpu.models.model_config import TGTConfig
from tgt_tpu.ops.attention import (edge_update as edge_update_op,
                                   edge_update_init, egt_attention,
                                   egt_attention_init)
from tgt_tpu.ops.common import drop_path
from tgt_tpu.ops.ffn import ffn, ffn_init
from tgt_tpu.ops.triplet import get_triplet_apply, get_triplet_init


# ---------------------------------------------------------------------------
# single layer
# ---------------------------------------------------------------------------

def tgt_layer_init(rng: jax.Array, cfg: TGTConfig, node_update: bool,
                   edge_update: bool) -> Dict[str, Any]:
    ks = jax.random.split(rng, 4)
    p: Dict[str, Any] = {}
    if node_update:
        p["update"] = egt_attention_init(ks[0], cfg.node_width, cfg.edge_width,
                                         cfg.num_heads, edge_update=edge_update)
        p["node_ffn"] = ffn_init(ks[1], cfg.node_width, cfg.node_ffn_multiplier,
                                 cfg.activation)
    elif edge_update:
        p["update"] = edge_update_init(ks[0], cfg.node_width, cfg.edge_width,
                                       cfg.num_heads)
    else:
        raise ValueError("at least one of node_update/edge_update must be True")
    if edge_update:
        if cfg.triplet_enabled:
            p["tria"] = get_triplet_init(cfg.triplet_type)(
                ks[2], cfg.edge_width, cfg.triplet_heads)
        p["edge_ffn"] = ffn_init(ks[3], cfg.edge_width, cfg.edge_ffn_multiplier,
                                 cfg.activation)
    return p


def tgt_layer_apply(p: Dict[str, Any], g: Graph, cfg: TGTConfig,
                    *, node_update: bool, edge_update: bool,
                    drop_path_rate: Any = 0.0,
                    deterministic: bool = True,
                    rng: Optional[jax.Array] = None) -> Graph:
    """One TGT layer (reference forward: layers.py:262-294)."""
    h, e, mask = g.h, g.e, g.mask
    if deterministic:
        r = [None] * 9
    else:
        r = list(jax.random.split(rng, 9))

    def dp(key, x):
        return drop_path(key, x, drop_path_rate, deterministic)

    if node_update:
        h_up, e_up = egt_attention(
            p["update"], h, e, mask,
            num_heads=cfg.num_heads, scale_degree=cfg.scale_degree,
            edge_update=edge_update, source_dropout=cfg.source_dropout,
            deterministic=deterministic, rng=r[0])
    else:
        h_up, e_up = edge_update_op(p["update"], h, e, mask,
                                    num_heads=cfg.num_heads)
        h_up = None  # EdgeUpdate leaves the node channel untouched

    if node_update:
        h = h + dp(r[1], h_up)
        h = h + dp(r[2], ffn(p["node_ffn"], h, activation=cfg.activation,
                             act_dropout=cfg.node_act_dropout,
                             deterministic=deterministic, rng=r[3]))

    if edge_update:
        e = e + dp(r[4], e_up)
        if cfg.triplet_enabled:
            tri_kwargs = {}
            # measured crossover (see TGTConfig.dense_min_nodes): the dense
            # kernel wins from 48 up, and already from 32 up on buckets that
            # run lane-exact (no j-padding); the bucket size is static per
            # compiled shape, so each bucket picks its winner
            n_bucket = e.shape[1]
            dense_ok = n_bucket >= cfg.dense_min_nodes
            if not dense_ok and cfg.use_pallas == "dense":
                from tgt_tpu.ops.pallas.triplet_dense import _jpad
                dense_ok = (n_bucket >= cfg.dense_min_exact_nodes
                            and _jpad(n_bucket) == n_bucket)
            if cfg.use_pallas and cfg.triplet_type in ("attention",
                                                       "attention_ungated"):
                if cfg.use_pallas != "dense" or dense_ok:
                    tri_kwargs["use_pallas"] = cfg.use_pallas
            elif cfg.use_pallas == "dense" and dense_ok and \
                    cfg.triplet_type in ("aggregate", "aggregate_ungated"):
                tri_kwargs["use_pallas"] = "dense"
            tri = get_triplet_apply(cfg.triplet_type)(
                p["tria"], e, mask, num_heads=cfg.triplet_heads,
                attention_dropout=cfg.triplet_dropout,
                deterministic=deterministic, rng=r[5], **tri_kwargs)
            e = e + dp(r[6], tri)
        e = e + dp(r[7], ffn(p["edge_ffn"], e, activation=cfg.activation,
                             act_dropout=cfg.edge_act_dropout,
                             deterministic=deterministic, rng=r[8]))

    return g.copy(h=h, e=e)


# ---------------------------------------------------------------------------
# encoder stack
# ---------------------------------------------------------------------------

def encoder_init(rng: jax.Array, cfg: TGTConfig) -> Dict[str, Any]:
    """Initialize the full stack.

    Layout: uniform inner layers (0..H-2) are stacked on a leading layer axis
    under key 'layers' (scan layout); the final layer, whose structure may
    differ (node_ended/edge_ended), lives under 'last'.
    """
    h_total = cfg.model_height
    keys = jax.random.split(rng, h_total)
    if cfg.has_indiv:
        # per-layer configs (IndivConfig) -> possibly heterogeneous layer
        # params; stored as a tuple, applied unrolled
        return {"indiv": tuple(
            tgt_layer_init(keys[i], cfg.layer_cfg(i), *cfg.layer_updates(i))
            for i in range(h_total))}
    inner = []
    for i in range(h_total - 1):
        nu, eu = cfg.layer_updates(i)
        inner.append(tgt_layer_init(keys[i], cfg, nu, eu))
    nu, eu = cfg.layer_updates(h_total - 1)
    params: Dict[str, Any] = {"last": tgt_layer_init(keys[-1], cfg, nu, eu)}
    if inner:
        params["layers"] = jax.tree.map(lambda *xs: jnp.stack(xs), *inner)
    return params


def _remat_policy(cfg: TGTConfig):
    """Map cfg.remat_policy to a jax.checkpoint saveable-policy (None means
    nothing saveable — classic full per-layer remat)."""
    if cfg.remat_policy == "none":
        return None
    if cfg.remat_policy == "dots":
        return jax.checkpoint_policies.dots_saveable
    if cfg.remat_policy == "tri_a":
        return jax.checkpoint_policies.save_only_these_names("tri_a")
    if cfg.remat_policy == "proj":
        # save the N^2 triplet projections (q/k/v/bias/gate) so backward
        # skips the QKV+EG matmuls and layernorm but recomputes the N^3
        # softmax chain (storing N^3 loses: CLAUDE.md measured baselines)
        return jax.checkpoint_policies.save_only_these_names("tri_proj")
    if cfg.remat_policy == "tri_va":
        # dense-kernel companion policy: save the kernel's N^2 output AND
        # its N^2 residual inputs — the remat recompute then prunes both
        # the projections and the kernel forward, and the custom-VJP bwd
        # reads its residuals from the saved panels. Only meaningful with
        # use_pallas='dense' (on the jnp path it degenerates to 'proj').
        return jax.checkpoint_policies.save_only_these_names(
            "tri_va", "tri_proj")
    raise ValueError(f"unknown remat_policy {cfg.remat_policy!r}")


def encoder_apply(params: Dict[str, Any], g: Graph, cfg: TGTConfig,
                  *, deterministic: bool = True,
                  rng: Optional[jax.Array] = None,
                  capture_intermediates: bool = False):
    """Apply the stack. With ``capture_intermediates`` (test/debug only),
    returns ``(g, captures)`` where captures is a list of (h, e) after EACH
    layer application (layer_multiplier reps captured separately) — used for
    per-layer activation parity vs the reference checkpoints (BASELINE.md;
    reference layers are hookable nn.Modules, encoder.py:79-90)."""
    if capture_intermediates or cfg.has_indiv:
        out = _encoder_apply_unrolled(params, g, cfg,
                                      deterministic=deterministic, rng=rng)
        return out if capture_intermediates else out[0]
    h_total = cfg.model_height
    n_inner = h_total - 1

    if rng is None:
        layer_keys = None
    else:
        layer_keys = jax.random.split(rng, h_total * cfg.layer_multiplier)
        # trailing dims differ by key flavour: raw threefry keys are
        # uint32[n,2], typed keys (e.g. rbg, Trainer cfg.rng_impl) are key[n]
        layer_keys = layer_keys.reshape(
            h_total, cfg.layer_multiplier, *layer_keys.shape[1:])

    dp_rates = jnp.asarray([cfg.drop_path_rate(i) for i in range(h_total)],
                           jnp.float32)

    def apply_once(layer_p, g, i, rep_keys, dp_rate, node_update, edge_update):
        for m in range(cfg.layer_multiplier):
            k = None if rep_keys is None else rep_keys[m]
            g = tgt_layer_apply(layer_p, g, cfg, node_update=node_update,
                                edge_update=edge_update,
                                drop_path_rate=dp_rate,
                                deterministic=deterministic, rng=k)
        return g

    if n_inner > 0:
        nu, eu = cfg.layer_updates(0)  # uniform across inner layers

        if cfg.use_scan:
            has_keys = layer_keys is not None

            def body(carry, xs):
                if has_keys:
                    layer_p, dp_rate, rep_keys = xs
                else:
                    layer_p, dp_rate = xs
                    rep_keys = None
                g = apply_once(layer_p, carry, None, rep_keys, dp_rate, nu, eu)
                return g, None

            if cfg.remat:
                body = jax.checkpoint(body, policy=_remat_policy(cfg))
            if has_keys:
                xs = (params["layers"], dp_rates[:n_inner], layer_keys[:n_inner])
            else:
                xs = (params["layers"], dp_rates[:n_inner])
            g, _ = jax.lax.scan(body, g, xs)
        else:
            for i in range(n_inner):
                layer_p = jax.tree.map(lambda x, i=i: x[i], params["layers"])
                rep_keys = None if layer_keys is None else layer_keys[i]
                fn = apply_once
                if cfg.remat:
                    fn = jax.checkpoint(fn, static_argnums=(2, 5, 6),
                                        policy=_remat_policy(cfg))
                g = fn(layer_p, g, i, rep_keys, dp_rates[i], nu, eu)

    nu, eu = cfg.layer_updates(h_total - 1)
    rep_keys = None if layer_keys is None else layer_keys[-1]
    g = apply_once(params["last"], g, h_total - 1, rep_keys,
                   dp_rates[h_total - 1], nu, eu)
    return g


def _encoder_apply_unrolled(params: Dict[str, Any], g: Graph, cfg: TGTConfig,
                            *, deterministic: bool = True,
                            rng: Optional[jax.Array] = None):
    """Unrolled encoder: records (h, e) after every layer application and
    supports per-layer IndivConfig heterogeneity."""
    h_total = cfg.model_height
    if rng is None:
        layer_keys = None
    else:
        layer_keys = jax.random.split(rng, h_total * cfg.layer_multiplier)
        layer_keys = layer_keys.reshape(
            h_total, cfg.layer_multiplier, *layer_keys.shape[1:])
    captures = []
    for i in range(h_total):
        if "indiv" in params:
            layer_p = params["indiv"][i]
        elif i < h_total - 1:
            layer_p = jax.tree.map(lambda x, i=i: x[i], params["layers"])
        else:
            layer_p = params["last"]
        nu, eu = cfg.layer_updates(i)
        lcfg = cfg.layer_cfg(i)
        apply_fn = functools.partial(
            tgt_layer_apply, cfg=lcfg, node_update=nu, edge_update=eu,
            drop_path_rate=cfg.drop_path_rate(i), deterministic=deterministic)
        if cfg.remat:
            # cfg.remat must hold on this path too (IndivConfig models can
            # only run unrolled; without this they'd silently store every
            # layer's activations and OOM at flagship scale)
            apply_fn = jax.checkpoint(apply_fn, policy=_remat_policy(cfg))
        for m in range(cfg.layer_multiplier):
            k = None if layer_keys is None else layer_keys[i][m]
            g = apply_fn(layer_p, g, rng=k)
            captures.append((g.h, g.e))
    return g, captures
