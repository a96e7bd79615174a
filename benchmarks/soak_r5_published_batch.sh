#!/bin/bash
# Round-5 published-batch soak: the dist_pred flagship config AS COMMITTED
# (global_batch_size: 1024 -> accum=32 at the published batch_size 32 on
# one chip) through the production CLI on synthetic data. 3 optimizer
# steps of 1024 graphs each — proves the published recipe executes
# end-to-end on a single chip, loss finite, zero NaNs.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/root/repo/benchmarks/campaign_r5}
rm -rf /tmp/soak_r5_pb
timeout 3000 python run_training.py configs/pcqm/tgt_at_200m/dist_pred/tgt_at_dp_rdkit.yaml \
  'dataset_source: synthetic' 'synth_train_samples: 1024' 'synth_val_samples: 32' \
  'synth_max_nodes: 48' 'buckets: [48]' \
  'num_epochs: 3' 'evaluation_samples: 2' 'prediction_samples: 2' \
  'lr_warmup_steps: 2' 'lr_total_steps: 60000' 'precompile_buckets: false' \
  'save_path_prefix: /tmp/soak_r5_pb' \
  'compilation_cache_dir: /root/repo/.jax_cache' > "$OUT/soak_r5_published_batch.log" 2>&1
echo "published-batch soak rc=$?"
