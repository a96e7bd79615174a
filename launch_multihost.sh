#!/bin/bash
# Multi-host TPU launch (replaces the reference's SLURM/torchrun fan-out,
# torchrun.sh:1-25). No process spawning: run THIS script once per host —
# jax.distributed handles rendezvous through the coordinator.
#
# Usage (on every host of the slice):
#   JAX_COORDINATOR=<host0-ip>:8476 NUM_PROCESSES=<n> PROCESS_ID=<rank> \
#     ./launch_multihost.sh configs/pcqm/tgt_at_200m/dist_pred/tgt_at_dp_rdkit.yaml
#
# On Cloud TPU pods JAX auto-detects the topology; the env vars are only
# needed off-pod. Do NOT set PYTHONPATH (breaks this container's TPU hooks).
set -euo pipefail
CONFIG="$1"; shift || true
exec python run_training.py "$CONFIG" \
  ${NUM_PROCESSES:+"jax_num_processes: ${NUM_PROCESSES}"} \
  ${PROCESS_ID:+"jax_process_id: ${PROCESS_ID}"} \
  "$@"
