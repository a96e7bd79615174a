#!/bin/bash
# Round-4 follow-up #4: n=32 (JBLK multiple, zero padding) dense vs XLA —
# the last point needed to place the dense kernel's bucket-size crossover.
set -u
cd "$(dirname "$0")/.."
WAITPID=${1:-}
OUT=${2:-/root/repo/benchmarks/campaign_r4}
mkdir -p "$OUT"
export TGT_CAMPAIGN=1
log() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$OUT/campaign.log"; }
if [ -n "$WAITPID" ]; then
  log "followup4: waiting for pid $WAITPID"
  while kill -0 "$WAITPID" 2>/dev/null; do sleep 20; done
  sleep 40
fi
run() {
  local name=$1 tmo=$2; shift 2
  log "=== $name: $*"
  timeout "$tmo" "$@" > "$OUT/$name.log" 2>&1
  log "=== $name rc=$? (tail): $(tail -1 "$OUT/$name.log")"
  sleep 35
}
run sweep_base_n32  1200 python benchmarks/sweep.py --b 8 --n 32
run sweep_dense_n32 1200 python benchmarks/sweep.py --b 8 --n 32 --dense
log "followup4 complete"
