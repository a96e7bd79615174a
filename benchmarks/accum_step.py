"""Measure the grad-accumulated flagship step at the PUBLISHED global batch.

VERDICT r4 item 2 follow-through: the published configs now set
global_batch_size (dist_pred 1024), which on one chip executes
accum = 1024 / batch_size micro-batches per optimizer step through the
scan-based accumulation path (training/harness.py accumulated_grad) — a
path that had never been timed at flagship scale. This times the REAL
production Trainer step (loss + grad + Adam + NaN discipline) on the real
chip and reports ms/optimizer-step and graphs/s.

Run: python benchmarks/accum_step.py [--micro 8] [--global-batch 256]
     [--steps 3]
(default micro=8 matches the bench.py flagship micro-batch; global-batch
is configurable because the full published 1024 takes ~20s/step — the
per-micro-batch cost is what the measurement establishes.)
"""
import argparse
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--micro", type=int, default=8,
                    help="per-pass micro batch (batch_size)")
    ap.add_argument("--global-batch", type=int, default=256)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--n", type=int, default=48)
    ap.add_argument("--layers", type=int, default=24)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tgt_tpu.schemes import DistPredScheme
    from tgt_tpu.training.harness import Trainer

    accum = args.global_batch // args.micro
    with tempfile.TemporaryDirectory() as tmp:
        over = dict(
            dataset_source="synthetic",
            synth_train_samples=args.global_batch * 2,
            synth_val_samples=8, synth_max_nodes=args.n,
            batch_size=args.micro, global_batch_size=args.global_batch,
            buckets=[args.n],
            node_width=768, edge_width=256, num_heads=64,
            model_height=args.layers, triplet_heads=16,
            triplet_type="attention", num_dist_bins=256,
            mixed_precision=True, use_scan=True, remat=True,
            use_pallas="dense", dense_min_nodes=48,
            coords_input="rdkit", coords_target="dft",
            max_lr=1e-4, lr_warmup_steps=10, lr_total_steps=1000,
            save_path_prefix=tmp, model_name="accum_bench")
        scheme = DistPredScheme(over)
        trainer = Trainer(scheme)
        assert trainer.grad_accum == accum, trainer.grad_accum
        state = trainer.init_state(jax.random.PRNGKey(0))
        state = trainer.shard_state(state)
        step = trainer.build_train_step()

        batches = [scheme.device_batch(b)
                   for _, b in zip(range(2), scheme.train_loader(0, 0, 1))]
        sharded = [trainer.shard_device_batch(b) for b in batches]
        rng = jax.random.key(7, impl="rbg")

        # compile
        t0 = time.time()
        state, m = step(state, sharded[0], jnp.asarray(0),
                        jax.random.fold_in(rng, 0), jnp.asarray(1.0))
        jax.block_until_ready(m["loss"])
        compile_s = time.time() - t0
        print(f"compile+first step: {compile_s:.1f}s "
              f"(accum={accum}, micro={args.micro})", flush=True)
        # sanity print: XLA's cost analysis counts a scan BODY once (so this
        # reads ~2e11 = one b=8 micro-step, not accum x that); the real
        # proof the scan executes every micro-batch is the per-step losses
        # below moving train-like at ~accum x the micro-step's wall time
        try:
            # step is ALREADY jitted (build_train_step) — lower it directly;
            # re-wrapping in jax.jit would drop donate_argnums and force a
            # second full flagship compile just to print flops
            ca = step.lower(
                state, sharded[0], jnp.asarray(0), jax.random.fold_in(rng, 0),
                jnp.asarray(1.0)).compile().cost_analysis()
            ca = ca[0] if isinstance(ca, (list, tuple)) else ca
            print(f"compiled flops: {ca.get('flops', 0):.3e}", flush=True)
        except Exception as exc:
            print(f"cost_analysis unavailable: {exc}", flush=True)

        # two timed passes (tunnel first-pass artifact), varied inputs via
        # rng. Blocking on the FULL result tree per step: at seconds-long
        # accumulated steps the 3-7ms dispatch round trip is noise, and
        # end-only blocking under-reported wildly here (the first cut of
        # this harness read 5.5 ms for a 256-graph step — work still in
        # flight or tunnel-deduped; per-step blocking makes that
        # impossible).
        passes = []
        for p_i in range(2):
            t0 = time.time()
            losses = []
            for i in range(args.steps):
                state, m = step(state, sharded[(i + p_i) % 2],
                                jnp.asarray(i + 1 + p_i * args.steps),
                                jax.random.fold_in(rng, i + 1 + p_i * 100),
                                jnp.asarray(1.0))
                # a HOST fetch per step: the only wait the tunnel cannot
                # elide (block_until_ready alone read 8 ms for this step)
                losses.append(float(m["loss"]))
            passes.append((time.time() - t0) / args.steps * 1000)
            print(f"pass {p_i}: losses "
                  f"{['%.4f' % l for l in losses]}", flush=True)
        dt = min(passes)
        print(f"accumulated optimizer step: {dt:.1f} ms "
              f"(passes {', '.join(f'{p:.0f}' for p in passes)}); "
              f"{args.global_batch / dt * 1000:.1f} graphs/s; "
              f"{dt / accum:.1f} ms per micro-batch "
              f"(loss={float(m['loss']):.3f})", flush=True)


if __name__ == "__main__":
    main()
