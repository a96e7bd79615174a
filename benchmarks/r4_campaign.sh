#!/bin/bash
# Round-4 TPU measurement campaign — run when the tunnel is back.
#
# Sequencing vs the driver (VERDICT r3 #6): the tunnel admits ONE process
# at a time. Protocol:
#   - /tmp/tgt_tpu_campaign.lock (our PID) is held only WHILE a step runs;
#     bench.py waits on it (bounded) before acquiring the tunnel.
#   - before each step we YIELD to any live driver bench.py (its pid file
#     /tmp/tgt_tpu_bench.pid), so a driver bench arriving mid-campaign waits
#     at most one step, then goes first.
#   - our own bench.py children skip the lock wait via TGT_CAMPAIGN=1.
#
# Usage: bash benchmarks/r4_campaign.sh [outdir]  (default /tmp/r4_campaign)
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/r4_campaign}
mkdir -p "$OUT"
LOCK=/tmp/tgt_tpu_campaign.lock
export TGT_CAMPAIGN=1
trap 'rm -f "$LOCK"' EXIT
log() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$OUT/campaign.log"; }

yield_to_bench() {
  local t0=$(date +%s)
  while true; do
    local bp
    bp=$(cat /tmp/tgt_tpu_bench.pid 2>/dev/null)
    if [ -n "${bp:-}" ] && kill -0 "$bp" 2>/dev/null; then
      log "yielding to live bench.py (pid $bp)"
      sleep 20
      if [ $(( $(date +%s) - t0 )) -gt 2400 ]; then
        log "yield timeout (40 min) — proceeding"
        break
      fi
    else
      break
    fi
  done
}

run() { # name timeout cmd...
  local name=$1 tmo=$2; shift 2
  yield_to_bench
  echo $$ > "$LOCK"
  log "=== $name: $*"
  timeout "$tmo" "$@" > "$OUT/$name.log" 2>&1
  log "=== $name rc=$? (tail): $(tail -1 "$OUT/$name.log")"
  rm -f "$LOCK"
  sleep 35  # let any stale tunnel claim release
}

# 0. sanity: tunnel alive + bench hardening happy path
run bench_small 600 python bench.py --small --budget 480

# 1. THE driver artifact rehearsal: exact driver-style full bench
#    (also warms the compilation cache so the driver's own run compiles
#    in seconds — VERDICT r3 next-round #1)
run bench_full 1500 python bench.py --budget 1320

# 2. isolated triplet-attention core: production spelling vs dense kernel
run core_at 900 python benchmarks/triplet_variants.py \
    --variants prod,dense_kernel --check --steps 20 --layers 4

# 3. aggregate core: production vs dense kernel
run core_ag 900 python benchmarks/aggregate_variants.py \
    --variants prod,dense_kernel --steps 20 --layers 4

# 4. full-step sweeps: baseline vs dense kernel (attention flagship)
run sweep_base 1200 python benchmarks/sweep.py --b 8 --n 48
run sweep_dense 1200 python benchmarks/sweep.py --b 8 --n 48 --dense

# 4b. dense kernel + remat OFF: the jnp path OOMs without remat (20.3G of
# saved N^3 intermediates) but the dense kernel's custom_vjp saves only N^2
# residuals — no-remat skips the whole forward recompute in backward
run sweep_dense_noremat 1200 python benchmarks/sweep.py --b 8 --n 48 \
    --dense --no-remat

# 4c. batch scaling with the dense kernel: b=16/32 lost at b=8 on the jnp
# path because the N^3 relayout copies scale superlinearly with b; the dense
# kernel keeps N^3 in VMEM, so larger batches may now raise total throughput
run sweep_dense_b16 1200 python benchmarks/sweep.py --b 16 --n 48 \
    --dense --no-remat
run sweep_dense_b32 1200 python benchmarks/sweep.py --b 32 --n 48 \
    --dense --no-remat

# 5. aggregate full step with dense kernel (remat on and off)
run sweep_ag_dense 1200 python benchmarks/sweep.py --b 8 --n 48 \
    --type aggregate --dense
run sweep_ag_dense_noremat 1200 python benchmarks/sweep.py --b 8 --n 48 \
    --type aggregate --dense --no-remat

# 6. serving MC scheduling lever: map vs vmap (VERDICT r2 #8, r3 #9)
run serving_map 1200 python benchmarks/serving_bench.py --mc-mode map \
    --requests 4 --cache-dir /root/repo/.jax_cache
run serving_vmap 1200 python benchmarks/serving_bench.py --mc-mode vmap \
    --requests 4 --cache-dir /root/repo/.jax_cache

# 7. serving with the lane-dense kernel (all buckets qualify at flagship
# widths; MC-dropout keeps triplet_dropout=0 so the kernel stays active)
run serving_dense 1200 python benchmarks/serving_bench.py --mc-mode map \
    --dense --requests 4 --cache-dir /root/repo/.jax_cache

log "campaign complete; results in $OUT"
log "summarize: python benchmarks/summarize_campaign.py $OUT"
