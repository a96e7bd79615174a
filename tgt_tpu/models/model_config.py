"""Static model hyperparameter bundle for the TGT family.

Gathers the kwargs that the reference threads through TGT_Encoder/TGT_Layer
(lib/tgt/encoder.py:27-49, lib/tgt/layers/layers.py:180-215) plus the
embedding/head options (lib/models/pcqm/*.py). It is hashable so it can be a
static argument to jit.

Per-layer config arrays (the reference's TGT_Encoder.IndivConfig,
encoder.py:25,54-56): any field in INDIV_FIELDS may be a TUPLE of length
``model_height`` giving one value per layer. Per-layer heterogeneity forces
the unrolled (non-scan) encoder path since layer params may differ in
structure; widths stay uniform (residual streams must line up, as in the
reference)."""
from __future__ import annotations

import dataclasses
from typing import Tuple

# fields that may be per-layer tuples (IndivConfig)
INDIV_FIELDS = ("num_heads", "triplet_heads", "triplet_type",
                "triplet_dropout", "activation", "scale_degree",
                "node_ffn_multiplier", "edge_ffn_multiplier",
                "source_dropout", "drop_path", "node_act_dropout",
                "edge_act_dropout")


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
    # what the per-layer checkpoint saves besides its inputs:
    #   'none'  — nothing (full recompute, min memory)
    #   'dots'  — every dot/einsum output (jax dots_saveable)
    #   'tri_a' — the named N^3 gated-attention weights (ops/triplet.py),
    #             skipping the softmax-chain recompute in backward
    remat_policy: str = "none"
    use_scan: bool = True             # lax.scan over uniform layers
    # Triplet-attention kernel selection: False = jnp/XLA (default, wins at
    # small b), True/'fused' = VMEM-blocked kernel (ops/pallas/
    # triplet_attention.py), 'dense' = lane-dense Mosaic kernel with zero
    # N^3 HBM traffic (ops/pallas/triplet_dense.py; requires N*H and d*H
    # multiples of 128, falls back to jnp otherwise)
    use_pallas: object = False
    # Bucket-size floor for the dense kernel: buckets below this run the
    # XLA path even when use_pallas='dense'. MEASURED crossover (v5e, b=8,
    # 24 layers; XLA from campaign_r4 sweep_base_n*, dense re-measured at
    # round-5 HEAD after the softmax rework, campaign_r5 sweep_dense_n*):
    # XLA/dense ms — 24: 70.9/83.2, 32: 87.1/79.6, 40: 115.1/127.3,
    # 48: 186.4/137.4, 56: 238.7/209.4, 64: 325.6/222.2 (1.47x). The
    # kernel wins every bucket it runs lane-exact (32/48/64, growing with
    # n) and the large padded one (56); the small
    # j-PADDED buckets (24 pads j 33%, 40 pads 20%) stay XLA. Gate:
    # n >= dense_min_nodes, OR n >= dense_min_exact_nodes when the bucket
    # needs no j-padding. Static per compiled bucket.
    dense_min_nodes: int = 48
    dense_min_exact_nodes: int = 32

    @property
    def triplet_enabled(self) -> bool:
        th = self.triplet_heads
        return max(th) > 0 if isinstance(th, tuple) else th > 0

    @property
    def has_indiv(self) -> bool:
        """True if any field carries a per-layer tuple (IndivConfig)."""
        return any(isinstance(getattr(self, f), tuple) for f in INDIV_FIELDS)

    def layer_cfg(self, i: int) -> "TGTConfig":
        """Scalar config for layer i: per-layer tuples pick their i-th entry
        (reference get_layer_kwargs, encoder.py:51-56)."""
        kw = {}
        for f in INDIV_FIELDS:
            v = getattr(self, f)
            if isinstance(v, tuple):
                if len(v) != self.model_height:
                    raise ValueError(
                        f"IndivConfig field {f} has {len(v)} entries for "
                        f"{self.model_height} layers")
                kw[f] = v[i]
        return self.replace(**kw) if kw else self

    def drop_path_rate(self, i: int) -> float:
        """Linear stochastic-depth ramp (reference: encoder.py:57-58) —
        unless drop_path is itself per-layer (IndivConfig), which bypasses
        the ramp exactly as the reference does."""
        if isinstance(self.drop_path, tuple):
            return self.drop_path[i]
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
