#!/bin/bash
# Round-4 follow-up #2: j-padded dense kernel on the non-JBLK buckets
# (24/40/56) vs the XLA baseline — quantifies the padding overhead vs the
# kernel win at the bucket sizes real PCQM molecules actually hit.
# Usage: bash benchmarks/r4_followup2.sh [waitpid] [outdir]
set -u
cd "$(dirname "$0")/.."
WAITPID=${1:-}
OUT=${2:-/root/repo/benchmarks/campaign_r4}
mkdir -p "$OUT"
export TGT_CAMPAIGN=1
log() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$OUT/campaign.log"; }

if [ -n "$WAITPID" ]; then
  log "followup2: waiting for pid $WAITPID"
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

for N in 24 40 56; do
  run "sweep_base_n$N"  1200 python benchmarks/sweep.py --b 8 --n "$N"
  run "sweep_dense_n$N" 1200 python benchmarks/sweep.py --b 8 --n "$N" --dense
done

log "followup2 complete"
