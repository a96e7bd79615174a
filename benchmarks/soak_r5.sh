#!/bin/bash
# Round-5 CLI soak: the PRODUCTION run_training.py path on the published
# flagship dist_pred config (dense kernel + round-5 softmax rework +
# adaptive j-blocks + exact-bucket gate), synthetic data, 512 steps at
# b=8 N=48. global_batch_size is overridden off so the soak times the
# plain per-step path like rounds 2-4 (the accumulated path is timed by
# benchmarks/accum_step.py).
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/root/repo/benchmarks/campaign_r5}
rm -rf /tmp/soak_r5
timeout 3000 python run_training.py configs/pcqm/tgt_at_200m/dist_pred/tgt_at_dp_rdkit.yaml \
  'dataset_source: synthetic' 'synth_train_samples: 512' 'synth_val_samples: 64' \
  'synth_max_nodes: 48' 'buckets: [48]' 'batch_size: 8' 'global_batch_size: null' \
  'num_epochs: 8' 'evaluation_samples: 2' 'prediction_samples: 2' \
  'lr_warmup_steps: 50' 'lr_total_steps: 512' 'precompile_buckets: false' \
  'save_path_prefix: /tmp/soak_r5' \
  'compilation_cache_dir: /root/repo/.jax_cache' > "$OUT/soak_r5.log" 2>&1
echo "soak rc=$?"
