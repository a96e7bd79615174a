from tgt_tpu.training.harness import Trainer, StopTraining, make_optimizer
from tgt_tpu.training.checkpoint import (CheckpointManager, save_pytree,
                                         load_pytree, load_pretrained)
from tgt_tpu.training import schedules

__all__ = ["Trainer", "StopTraining", "make_optimizer", "CheckpointManager",
           "save_pytree", "load_pytree", "load_pretrained", "schedules"]
