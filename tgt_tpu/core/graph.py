"""Graph batch container — a JAX pytree.

The reference passes a dict-with-attribute-access ``Graph`` carrying node
states ``h``, edge states ``e`` and an additive attention ``mask`` through the
encoder stack (reference: lib/tgt/encoder.py:7-21). Here the equivalent is a
registered pytree dataclass so it can flow through jit/scan/shard_map
untouched, with static (non-traced) metadata kept in aux data.

All arrays are padded to static shapes (XLA requirement); validity is carried
by ``node_mask`` (b, N) and derived pair masks rather than by dynamic shapes.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Graph:
    """Inter-layer state record for the TGT encoder stack.

    Attributes:
      h: node channel states, float (b, N, node_width).
      e: edge channel states, float (b, N, N, edge_width).
      mask: additive attention mask, float (b, N, N, 1); 0 where the pair
        (i, j) is valid, a large negative number where invalid.
      node_mask: bool/float validity of each node slot (b, N).
    """

    h: jnp.ndarray
    e: jnp.ndarray
    mask: jnp.ndarray
    node_mask: jnp.ndarray

    def copy(self, **updates: Any) -> "Graph":
        return dataclasses.replace(self, **updates)

    @property
    def num_nodes_padded(self) -> int:
        return self.h.shape[1]

    @property
    def batch_size(self) -> int:
        return self.h.shape[0]


# Large-negative additive mask value. The reference uses torch.finfo.min of the
# compute dtype (lib/models/pcqm/layers.py:78-80); a fixed -1e9 behaves
# identically through softmax for both f32 and bf16 and avoids dtype-dependent
# constants inside jitted code.
MASK_VALUE = -1e9


def additive_mask_from_node_mask(node_mask: jnp.ndarray,
                                 dtype: jnp.dtype = jnp.float32) -> jnp.ndarray:
    """Build the additive (b, N, N, 1) attention mask from a (b, N) node mask.

    Pairs where either endpoint is padding get MASK_VALUE; valid pairs get 0.
    (reference semantics: lib/models/pcqm/layers.py:78-80 — (1-m_i*m_j)*finfo.min)
    """
    m = node_mask.astype(dtype)
    pair = m[:, :, None] * m[:, None, :]
    return ((1.0 - pair) * MASK_VALUE).astype(dtype)[..., None]


def batch_from_dict(d: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """Identity helper kept for API symmetry; batches are plain dicts of arrays."""
    return dict(d)
