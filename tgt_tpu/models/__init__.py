from tgt_tpu.models.model_config import TGTConfig
from tgt_tpu.models.heads import (make_model, distance_model_init,
                                  distance_model_apply, gap_model_init,
                                  gap_model_apply, multi_model_init,
                                  multi_model_apply)
from tgt_tpu.models.encoder import encoder_init, encoder_apply
from tgt_tpu.models.embedding import embed_input_init, embed_input_apply

__all__ = [
    "TGTConfig", "make_model",
    "distance_model_init", "distance_model_apply",
    "gap_model_init", "gap_model_apply",
    "multi_model_init", "multi_model_apply",
    "encoder_init", "encoder_apply",
    "embed_input_init", "embed_input_apply",
]
