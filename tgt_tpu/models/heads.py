"""Task models: TGT_Distance, TGT_Gap, TGT_Multi.

Functional equivalents of the reference task heads
(lib/models/pcqm/{distance_predictor.py,gap_predictor.py,multitask.py}):

- distance: embed -> encoder(node_ended=False, edge_ended=True) -> edge LN ->
  Linear(edge_width, num_dist_bins) logits (b, N, N, bins).
- gap: embed -> encoder(node_ended=True, edge_ended=False) -> node LN ->
  masked mean-pool -> Linear(node_width, 1), bias init HL_MEAN.
- multi: both-ended encoder with both heads; returns (gap, dist_logits).

Each model is a (init, apply) pair over a plain params dict; `make_model`
builds them from a TGTConfig + model name.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from tgt_tpu.models import consts as C
from tgt_tpu.models.embedding import embed_input_apply, embed_input_init
from tgt_tpu.models.encoder import encoder_apply, encoder_init
from tgt_tpu.models.model_config import TGTConfig
from tgt_tpu.ops.common import layernorm, layernorm_init, linear, linear_init


def _pool_nodes(h: jnp.ndarray, node_mask: jnp.ndarray) -> jnp.ndarray:
    """Masked mean pool over nodes (reference: gap_predictor.py:52-54)."""
    m = node_mask.astype(h.dtype)[..., None]
    return (h * m).sum(axis=1) / (m.sum(axis=1) + 1e-9)


# ---------------------------------------------------------------------------

def distance_model_init(rng: jax.Array, cfg: TGTConfig) -> Dict[str, Any]:
    cfg = cfg.replace(node_ended=False, edge_ended=True)
    ks = jax.random.split(rng, 3)
    return {
        "input_embed": embed_input_init(ks[0], cfg),
        "encoder": encoder_init(ks[1], cfg),
        "final_ln_edge": layernorm_init(cfg.edge_width),
        "dist_pred": linear_init(ks[2], cfg.edge_width, cfg.num_dist_bins),
    }


def distance_model_apply(params: Dict[str, Any], batch: Dict[str, jnp.ndarray],
                         cfg: TGTConfig, *, deterministic: bool = True,
                         rng: Optional[jax.Array] = None) -> jnp.ndarray:
    cfg = cfg.replace(node_ended=False, edge_ended=True)
    g = embed_input_apply(params["input_embed"], batch, cfg)
    g = encoder_apply(params["encoder"], g, cfg, deterministic=deterministic,
                      rng=rng)
    e = layernorm(params["final_ln_edge"], g.e)
    return linear(params["dist_pred"], e)


# ---------------------------------------------------------------------------

def gap_model_init(rng: jax.Array, cfg: TGTConfig) -> Dict[str, Any]:
    cfg = cfg.replace(node_ended=True, edge_ended=False)
    ks = jax.random.split(rng, 3)
    pred = linear_init(ks[2], cfg.node_width, 1)
    pred["b"] = jnp.full_like(pred["b"], C.HL_MEAN)
    return {
        "input_embed": embed_input_init(ks[0], cfg),
        "encoder": encoder_init(ks[1], cfg),
        "final_ln_node": layernorm_init(cfg.node_width),
        "pred": pred,
    }


def gap_model_apply(params: Dict[str, Any], batch: Dict[str, jnp.ndarray],
                    cfg: TGTConfig, *, deterministic: bool = True,
                    rng: Optional[jax.Array] = None) -> jnp.ndarray:
    cfg = cfg.replace(node_ended=True, edge_ended=False)
    g = embed_input_apply(params["input_embed"], batch, cfg)
    g = encoder_apply(params["encoder"], g, cfg, deterministic=deterministic,
                      rng=rng)
    h = layernorm(params["final_ln_node"], g.h)
    pooled = _pool_nodes(h, g.node_mask)
    return linear(params["pred"], pooled).squeeze(-1)


# ---------------------------------------------------------------------------

def multi_model_init(rng: jax.Array, cfg: TGTConfig) -> Dict[str, Any]:
    cfg = cfg.replace(node_ended=True, edge_ended=True)
    ks = jax.random.split(rng, 4)
    pred = linear_init(ks[2], cfg.node_width, 1)
    pred["b"] = jnp.full_like(pred["b"], C.HL_MEAN)
    return {
        "input_embed": embed_input_init(ks[0], cfg),
        "encoder": encoder_init(ks[1], cfg),
        "final_ln_node": layernorm_init(cfg.node_width),
        "pred": pred,
        "final_ln_edge": layernorm_init(cfg.edge_width),
        "dist_pred": linear_init(ks[3], cfg.edge_width, cfg.num_dist_bins),
    }


def multi_model_apply(params: Dict[str, Any], batch: Dict[str, jnp.ndarray],
                      cfg: TGTConfig, *, deterministic: bool = True,
                      rng: Optional[jax.Array] = None
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    cfg = cfg.replace(node_ended=True, edge_ended=True)
    g = embed_input_apply(params["input_embed"], batch, cfg)
    g = encoder_apply(params["encoder"], g, cfg, deterministic=deterministic,
                      rng=rng)
    h = layernorm(params["final_ln_node"], g.h)
    gap = linear(params["pred"], _pool_nodes(h, g.node_mask)).squeeze(-1)
    e = layernorm(params["final_ln_edge"], g.e)
    dist_logits = linear(params["dist_pred"], e)
    return gap, dist_logits


# ---------------------------------------------------------------------------

MODELS: Dict[str, Tuple[Callable, Callable]] = {
    "distance": (distance_model_init, distance_model_apply),
    "gap": (gap_model_init, gap_model_apply),
    "multi": (multi_model_init, multi_model_apply),
}


def make_model(name: str):
    """Return (init_fn, apply_fn) for a task model name."""
    if name not in MODELS:
        raise ValueError(f"unknown model '{name}'; available: {list(MODELS)}")
    return MODELS[name]
