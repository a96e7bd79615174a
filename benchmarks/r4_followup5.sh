#!/bin/bash
# Round-4 follow-up #5: serving with the per-bucket dense_min_nodes gate
# (buckets 16/32 -> XLA, 48/64 -> kernel) + device-time profile of the
# promoted dense step.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/root/repo/benchmarks/campaign_r4}
mkdir -p "$OUT"
export TGT_CAMPAIGN=1
log() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$OUT/campaign.log"; }
run() {
  local name=$1 tmo=$2; shift 2
  log "=== $name: $*"
  timeout "$tmo" "$@" > "$OUT/$name.log" 2>&1
  log "=== $name rc=$? (tail): $(tail -1 "$OUT/$name.log")"
  sleep 35
}
run serving_dense_gated 1500 python benchmarks/serving_bench.py --mc-mode map \
    --dense --requests 4 --cache-dir /root/repo/.jax_cache
run profile_dense 900 python benchmarks/profile_step.py --dense --steps 5
log "followup5 complete"
