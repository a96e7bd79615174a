#!/bin/bash
# Round-4 follow-up measurements, chained after r4_campaign.sh:
#   - batch scaling with the dense kernel and remat ON (the campaign's
#     b16/b32 steps assumed no-remat would win; measured: remat wins)
#   - bench.py --dense to warm the persistent cache for the promoted
#     flagship program before the driver's end-of-round run
#   - per-kernel speed-of-light numbers (benchmarks/kernel_sol.py)
# Usage: bash benchmarks/r4_followup.sh [waitpid] [outdir]
set -u
cd "$(dirname "$0")/.."
WAITPID=${1:-}
OUT=${2:-/root/repo/benchmarks/campaign_r4}
mkdir -p "$OUT"
export TGT_CAMPAIGN=1
log() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$OUT/campaign.log"; }

if [ -n "$WAITPID" ]; then
  log "followup: waiting for campaign pid $WAITPID"
  while kill -0 "$WAITPID" 2>/dev/null; do sleep 20; done
  sleep 40
fi

run() { # name timeout cmd...
  local name=$1 tmo=$2; shift 2
  log "=== $name: $*"
  timeout "$tmo" "$@" > "$OUT/$name.log" 2>&1
  log "=== $name rc=$? (tail): $(tail -1 "$OUT/$name.log")"
  sleep 35
}

run sweep_dense_b16_remat 1200 python benchmarks/sweep.py --b 16 --n 48 --dense
run sweep_dense_b32_remat 1200 python benchmarks/sweep.py --b 32 --n 48 --dense
run bench_dense 1500 python bench.py --dense --budget 1320
run kernel_sol_fwd 900 python benchmarks/kernel_sol.py --json
run kernel_sol_grad 900 python benchmarks/kernel_sol.py --grad --json

log "followup complete"
