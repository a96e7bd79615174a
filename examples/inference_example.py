#!/usr/bin/env python
"""Example evaluation (inference) of TGT on PCQM4Mv2 — tgt_tpu edition.

Mirrors the reference's inference_example.ipynb workflow:
  1. prepare the dataset (here: a hermetic synthetic stand-in unless
     data/PCQM exists),
  2. load / train a distance-predictor checkpoint,
  3. predict distance bins for the validation split,
  4. evaluate MC-dropout HOMO-LUMO gaps on those bins.

With the real dataset + converted reference checkpoints
(models/convert.convert_torch_state_dict on the released model_state.pt), the
same two commands reproduce the published pipeline:

  python make_predictions.py configs/pcqm/tgt_at_200m/dist_pred/tgt_at_dp_rdkit.yaml 'predict_on: ["val"]'
  python do_evaluations.py  configs/pcqm/tgt_at_200m/gap_pred/tgt_at_tp_rdkit.yaml 'predict_on: ["val"]'

Run: python examples/inference_example.py  (CPU-friendly, ~2 min)
"""
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

TINY = dict(
    dataset_source="synthetic", synth_train_samples=32, synth_val_samples=16,
    synth_max_nodes=12, batch_size=4, buckets=[12], model_height=2,
    node_width=32, edge_width=16, num_heads=4, triplet_heads=4,
    triplet_type="attention", num_dist_bins=16, evaluation_samples=4,
    prediction_samples=4, max_lr=1e-3, lr_warmup_steps=4,
    lr_total_steps=10_000, num_epochs=2, coords_input="rdkit",
)


def main():
    workdir = tempfile.mkdtemp(prefix="tgt_tpu_example_")
    print(f"artifacts -> {workdir}\n")

    from tgt_tpu.cli.execute import execute

    # 1+2. train a small distance predictor (stands in for downloading the
    # released checkpoint; with real weights, skip straight to predict)
    dp_cfg = dict(TINY, scheme="pcqm.dist_pred", model_name="dp",
                  save_path_prefix=workdir)
    print("== stage 1: distance predictor ==")
    execute("train", dp_cfg)

    # 3. predict distance bins on the validation split
    print("\n== predict distance bins (MC argmax, packed parquet) ==")
    execute("predict", dict(dp_cfg, predict_on=["val"]))
    bins_path = os.path.join(workdir, "dp", "predictions",
                             f"bins{TINY['prediction_samples']}")
    print(f"bins written to {bins_path}")

    # 4. evaluate gaps with a (freshly initialized) gap predictor reading
    #    those bins — with converted reference weights this reports the
    #    published MAE
    print("\n== evaluate MC-dropout gaps on predicted bins ==")
    gp_cfg = dict(TINY, scheme="pcqm.gap_pred", model_name="gp",
                  save_path_prefix=workdir, bins_input_path=None,
                  predict_on=["val"])
    gp_cfg.pop("coords_input")  # gap_pred reads bins, not coordinates
    metrics = execute("evaluate", gp_cfg)
    print(f"\nval metrics: {metrics['val']}")
    print(f"results.yaml -> {os.path.join(workdir, 'gp', 'predictions')}")


if __name__ == "__main__":
    main()
