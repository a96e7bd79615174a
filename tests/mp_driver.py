"""Subprocess driver for the 2-process integration test (test_multiprocess).

Runs the REAL CLI path — execute('train', ...) with jax.distributed
rendezvous from config keys — on a tiny synthetic scheme, then prints the
final history entry as JSON for the parent to compare across ranks.

Usage: python tests/mp_driver.py <process_id> <coordinator> <save_dir>
"""
import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)
jax.config.update("jax_cpu_collectives_implementation", "gloo")


def main():
    pid = int(sys.argv[1])
    coordinator = sys.argv[2]
    save_dir = sys.argv[3]
    mode = sys.argv[4] if len(sys.argv) > 4 else "pretrain"

    from tgt_tpu.cli.execute import execute

    if mode == "dist_pred":
        # train one epoch then run the PREDICT command: each process writes
        # its own bins parquet shard (reference dist_pred/scheme.py:256-306)
        config = dict(
            scheme="pcqm.dist_pred",
            coords_input="rdkit",
            dataset_source="synthetic",
            synth_train_samples=16,
            synth_val_samples=9,
            synth_max_nodes=10,
            batch_size=2,
            buckets=[12],
            model_height=2,
            node_width=16,
            edge_width=8,
            num_heads=4,
            triplet_heads=2,
            num_dist_bins=16,
            evaluation_samples=2,
            prediction_samples=2,
            max_lr=1e-3,
            lr_warmup_steps=4,
            lr_total_steps=10_000,
            num_epochs=1,
            save_path_prefix=save_dir,
            model_name="mp_dp",
            jax_coordinator=coordinator,
            jax_num_processes=2,
            jax_process_id=pid,
        )
        execute("train", config)
        execute("predict", config, rank=pid, world_size=2)
        print("MP_PREDICT_DONE", flush=True)
        return

    config = dict(
        scheme="pcqm.pretrain",
        # mode 'pair': (data=2, pair=2) mesh over 2 processes — edge-block
        # partitioning spanning a process boundary
        # mode 'gbs': published-batch reproduction across processes —
        # global_batch_size=16 at batch_size 2 and world_size 2 derives
        # accum=4, so each of the 2 epochs runs exactly ONE optimizer step
        # (16 samples / 16 global) and history must still be identical on
        # every rank
        global_batch_size=16 if mode == "gbs" else None,
        num_pair_devices=2 if mode == "pair" else 1,
        dataset_source="synthetic",
        synth_train_samples=16,
        synth_val_samples=9,   # 5/4 split: exercises the unequal-shard
                               # prediction gather (pad + allgather + trim)
        synth_max_nodes=10,
        batch_size=2,          # per-rank; global batch 4 over 4 devices
        buckets=[12],
        model_height=2,
        node_width=16,
        edge_width=8,
        num_heads=4,
        triplet_heads=2,
        num_dist_bins=16,
        evaluation_samples=2,
        prediction_samples=2,
        max_lr=1e-3,
        lr_warmup_steps=4,
        lr_total_steps=10_000,
        num_epochs=2 if mode == "gbs" else 1,
        save_path_prefix=save_dir,
        model_name="mp",
        jax_coordinator=coordinator,
        jax_num_processes=2,
        jax_process_id=pid,
    )
    result = execute("train", config)
    last = dict(result["history"][-1])
    print("MP_RESULT " + json.dumps(
        {k: float(v) if isinstance(v, (int, float)) else v
         for k, v in last.items()}), flush=True)

    # same processes, evaluate command: exercises the cross-host prediction
    # gather in execute_evaluate (full-split metrics on every rank)
    metrics = execute("evaluate", config, rank=pid, world_size=2)
    print("MP_EVAL " + json.dumps(
        {s: {k: float(v) for k, v in m.items()}
         for s, m in metrics.items()}), flush=True)


if __name__ == "__main__":
    main()
