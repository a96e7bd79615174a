"""tgt_tpu — a TPU-native graph-transformer framework (EGT/TGT family).

Built from scratch in JAX/XLA/Pallas with pjit/shard_map distribution, with the
full capabilities of the reference PyTorch TGT implementation (shamim-hussain/tgt,
ICML'24): dense node+edge-channel (EGT) attention, six triplet-interaction
variants, Gaussian/Fourier 3D distance encodings, the two-stage
distance-predictor -> gap-predictor model, and the three-stage training pipeline
with stochastic MC-dropout inference.

Layer map (see SURVEY.md §7):
  core/      Graph pytree batch + hierarchical config system
  ops/       pure-jnp reference ops + Pallas TPU kernels (ops/pallas)
  models/    functional model defs (EmbedInput, TGTEncoder, heads) + torch converter
  parallel/  mesh construction, sharding rules, collectives
  data/      dataset, structural preprocessing, bucketed collate, bins packing
  training/  train/eval/predict harness, schedules, checkpointing
  schemes/   task pipelines: dist_pred, pretrain, finetune, gap_pred
  cli/       entry points (run_training / make_predictions / do_evaluations)
"""

__version__ = "0.1.0"

from tgt_tpu.core.graph import Graph  # noqa: F401
