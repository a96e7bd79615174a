"""Static model hyperparameter bundle for the TGT family.

Gathers the kwargs that the reference threads through TGT_Encoder/TGT_Layer
(lib/tgt/encoder.py:27-49, lib/tgt/layers/layers.py:180-215) plus the
embedding/head options (lib/models/pcqm/*.py). It is hashable so it can be a
static argument to jit.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class TGTConfig:
    # widths / heads
    node_width: int = 768
    edge_width: int = 256
    num_heads: int = 64
    # stack
    model_height: int = 4
    layer_multiplier: int = 1
    node_ended: bool = True
    edge_ended: bool = True
    egt_simple: bool = False
    # triplet
    triplet_heads: int = 0
    triplet_type: str = "aggregate"
    triplet_dropout: float = 0.0
    # regularization / activation
    activation: str = "gelu"
    scale_degree: bool = True
    node_ffn_multiplier: float = 1.0
    edge_ffn_multiplier: float = 1.0
    source_dropout: float = 0.0
    drop_path: float = 0.0
    node_act_dropout: float = 0.0
    edge_act_dropout: float = 0.0
    # input embedding
    upto_hop: int = 32
    embed_3d_type: str = "gaussian"   # 'gaussian' | 'fourier' | 'none'
    num_3d_kernels: int = 128
    # heads
    num_dist_bins: int = 256
    # execution
    compute_dtype: str = "float32"    # 'float32' | 'bfloat16'
    remat: bool = False               # rematerialize each encoder layer
    use_scan: bool = True             # lax.scan over uniform layers
    use_pallas: bool = False          # fused Pallas kernels for hot ops

    @property
    def triplet_enabled(self) -> bool:
        return self.triplet_heads > 0

    def drop_path_rate(self, i: int) -> float:
        """Linear stochastic-depth ramp (reference: encoder.py:57-58)."""
        if self.model_height <= 1:
            return 0.0
        return self.drop_path * i / (self.model_height - 1)

    def layer_updates(self, i: int) -> Tuple[bool, bool]:
        """(node_update, edge_update) for layer i (reference: encoder.py:62-76)."""
        last = i == self.model_height - 1
        node_update = not (last and not self.node_ended)
        if self.egt_simple:
            edge_update = False
        else:
            edge_update = not (last and not self.edge_ended)
        return node_update, edge_update

    def replace(self, **kw) -> "TGTConfig":
        return dataclasses.replace(self, **kw)
