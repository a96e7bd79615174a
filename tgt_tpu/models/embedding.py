"""Input embedding: raw integer/float batch -> Graph (h, e, mask) state.

Semantics match the reference EmbedInput (lib/models/pcqm/layers.py:11-83):
- node state: sum of per-feature embeddings of offset-encoded node features
  (vocab 9*128+1, padding_idx 0).
- edge state: hop-distance embedding (clamped to upto_hop+1) + sum of bond
  feature embeddings (+ optional Gaussian/Fourier 3D distance embedding).
- additive attention mask (1 - edge_mask) * MASK_VALUE.

Batch dict keys (produced by the data layer):
  node_features   int (b, N, 9)
  distance_matrix int (b, N, N)      hop distances, unreachable = 510
  feature_matrix  int (b, N, N, 3)   offset-encoded bond features
  node_mask       (b, N)             1 = real node
  edge_mask       (b, N, N)          outer product of node_mask
  dist_input      float (b, N, N)    3D distances (if embed_3d_type != none)
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from tgt_tpu.core.graph import Graph, MASK_VALUE
from tgt_tpu.models import consts as C
from tgt_tpu.models.model_config import TGTConfig
from tgt_tpu.ops.common import embedding, embedding_init
from tgt_tpu.ops.embed3d import (fourier3d_embed, fourier3d_init,
                                 gaussian3d_embed, gaussian3d_init)


def embed_input_init(rng: jax.Array, cfg: TGTConfig) -> Dict[str, Any]:
    ks = jax.random.split(rng, 4)
    p: Dict[str, Any] = {
        "nodef_embed": embedding_init(
            ks[0], C.NUM_NODE_FEATURES * C.NODE_FEATURES_OFFSET + 1,
            cfg.node_width, padding_idx=0),
        "dist_embed": embedding_init(ks[1], cfg.upto_hop + 2, cfg.edge_width),
        "featm_embed": embedding_init(
            ks[2], C.NUM_EDGE_FEATURES * C.EDGE_FEATURES_OFFSET + 1,
            cfg.edge_width, padding_idx=0),
    }
    if cfg.embed_3d_type == "gaussian":
        p["m3d_embed"] = gaussian3d_init(
            ks[3], cfg.edge_width, 2 * C.NODE_FEATURES_OFFSET + 1,
            cfg.num_3d_kernels)
    elif cfg.embed_3d_type == "fourier":
        p["m3d_embed"] = fourier3d_init(ks[3], cfg.edge_width,
                                        cfg.num_3d_kernels)
    elif cfg.embed_3d_type != "none":
        raise ValueError(f"invalid embed_3d_type: {cfg.embed_3d_type}")
    return p


def embed_input_apply(p: Dict[str, Any], batch: Dict[str, jnp.ndarray],
                      cfg: TGTConfig) -> Graph:
    dtype = jnp.dtype(cfg.compute_dtype)

    nodef = batch["node_features"].astype(jnp.int32)         # (b, N, 9)
    h = embedding(p["nodef_embed"], nodef).sum(axis=2)       # (b, N, W_h)

    dm = jnp.clip(batch["distance_matrix"].astype(jnp.int32), 0,
                  cfg.upto_hop + 1)
    featm = batch["feature_matrix"].astype(jnp.int32)        # (b, N, N, 3)
    e = (embedding(p["dist_embed"], dm)
         + embedding(p["featm_embed"], featm).sum(axis=-2))  # (b, N, N, W_e)

    if cfg.embed_3d_type == "gaussian":
        # atom-pair type ids from the first node feature; j offset by 128
        # (reference: layers.py:48-56)
        nodes_i = nodef[:, :, 0]
        nodes_j = nodes_i + C.NODE_FEATURES_OFFSET
        n = nodef.shape[1]
        nodes_ij = jnp.stack([
            jnp.broadcast_to(nodes_i[:, :, None], nodes_i.shape + (n,)),
            jnp.broadcast_to(nodes_j[:, None, :], nodes_j.shape[:1] + (n,) + nodes_j.shape[1:]),
        ], axis=-1)                                          # (b, N, N, 2)
        e = e + gaussian3d_embed(p["m3d_embed"],
                                 batch["dist_input"].astype(dtype), nodes_ij)
    elif cfg.embed_3d_type == "fourier":
        e = e + fourier3d_embed(p["m3d_embed"],
                                batch["dist_input"].astype(dtype))

    edge_mask = batch["edge_mask"].astype(dtype)[..., None]  # (b, N, N, 1)
    mask = (1.0 - edge_mask) * MASK_VALUE

    return Graph(h=h.astype(dtype), e=e.astype(dtype), mask=mask,
                 node_mask=batch["node_mask"])
