"""Scheme registry (reference: lib/training/execute.py:54-58 resolves
``scheme: pcqm.<name>`` strings to SCHEME classes)."""
from tgt_tpu.schemes.base import TGTScheme, default_scheme_config
from tgt_tpu.schemes.dist_pred import DistPredScheme
from tgt_tpu.schemes.pretrain import PretrainScheme
from tgt_tpu.schemes.finetune import FinetuneScheme
from tgt_tpu.schemes.gap_pred import GapPredScheme

SCHEMES = {
    "pcqm.dist_pred": DistPredScheme,
    "pcqm.pretrain": PretrainScheme,
    "pcqm.finetune": FinetuneScheme,
    "pcqm.gap_pred": GapPredScheme,
}


def get_scheme(name: str):
    if name not in SCHEMES:
        raise ValueError(f"unknown scheme '{name}'; available: {list(SCHEMES)}")
    return SCHEMES[name]


__all__ = ["TGTScheme", "default_scheme_config", "DistPredScheme",
           "PretrainScheme", "FinetuneScheme", "GapPredScheme", "SCHEMES",
           "get_scheme"]
