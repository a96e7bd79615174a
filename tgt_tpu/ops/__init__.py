from tgt_tpu.ops.attention import (egt_attention, egt_attention_init,
                                   edge_update, edge_update_init)
from tgt_tpu.ops.ffn import ffn, ffn_init
from tgt_tpu.ops.triplet import (TRIPLET_VARIANTS, get_triplet_apply,
                                 get_triplet_init)
from tgt_tpu.ops.embed3d import (fourier3d_embed, fourier3d_init,
                                 gaussian3d_embed, gaussian3d_init)
from tgt_tpu.ops.activations import get_activation

__all__ = [
    "egt_attention", "egt_attention_init", "edge_update", "edge_update_init",
    "ffn", "ffn_init", "TRIPLET_VARIANTS", "get_triplet_apply",
    "get_triplet_init", "fourier3d_embed", "fourier3d_init",
    "gaussian3d_embed", "gaussian3d_init", "get_activation",
]
