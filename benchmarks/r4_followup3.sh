#!/bin/bash
# Round-4 follow-up #3: the tri_va remat policy with the dense kernel —
# saving the kernel's N^2 residuals + output prunes both the projections
# and the kernel forward from the backward-pass recompute. The old 'proj'
# negative (35.8 vs 33.2 on the XLA core) predates the kernel; with zero
# N^3 HBM either way the tradeoff changed, so measure it.
# Usage: bash benchmarks/r4_followup3.sh [waitpid] [outdir]
set -u
cd "$(dirname "$0")/.."
WAITPID=${1:-}
OUT=${2:-/root/repo/benchmarks/campaign_r4}
mkdir -p "$OUT"
export TGT_CAMPAIGN=1
log() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$OUT/campaign.log"; }

if [ -n "$WAITPID" ]; then
  log "followup3: waiting for pid $WAITPID"
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

run sweep_dense_triva     1200 python benchmarks/sweep.py --b 8 --n 48 \
    --dense --remat-policy tri_va
run sweep_dense_triva_b16 1200 python benchmarks/sweep.py --b 16 --n 48 \
    --dense --remat-policy tri_va
run sweep_dense_proj      1200 python benchmarks/sweep.py --b 8 --n 48 \
    --dense --remat-policy proj

log "followup3 complete"
