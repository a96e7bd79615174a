"""Full three-stage pipeline rehearsal over the parquet-backed dataset:

  stage 1: train dist_pred -> predict MC bins -> parquet shards + meta.json
  stage 2: pretrain TGT_Multi on noisy DFT coords
  stage 3: finetune consuming stage-2 weights AND stage-1 bins (via the real
           Bins column / BinsProcessor path)
  stage 4: gap_pred trim + MC evaluation -> results.yaml

This is the reference's README pipeline (README.md:112-157) end to end
through the actual CLI entry points — the same commands reproduce the
published runs once data/PCQM holds the real download.
"""
import json
import os

import numpy as np
import pytest
import yaml

pytest.importorskip("pyarrow")

from tgt_tpu.cli.execute import execute
from tgt_tpu.data.prepare import write_synthetic_dataset

COMMON = dict(
    dataset_source="pcqm",
    batch_size=4, buckets=[12],
    model_height=2, node_width=16, edge_width=8, num_heads=4,
    triplet_heads=2, triplet_type="attention",
    evaluation_samples=2, prediction_samples=3,
    max_lr=1e-3, lr_warmup_steps=2, lr_total_steps=10_000, num_epochs=1,
)


@pytest.fixture(scope="module")
def pipeline_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("pipeline")
    data = root / "data"
    write_synthetic_dataset(str(data), num_samples=24, max_nodes=10, seed=3)
    return root, str(data)


class TestThreeStagePipeline:
    def test_full_chain(self, pipeline_dir):
        root, data = pipeline_dir
        models = str(root / "models")

        # ---- stage 1: distance predictor ------------------------------
        dp = dict(COMMON, scheme="pcqm.dist_pred", model_name="dp",
                  save_path_prefix=models, dataset_path=data,
                  coords_input="rdkit", num_dist_bins=16, range_dist_bins=8)
        execute("train", dp)
        dp_dir = os.path.join(models, "dp")
        assert os.path.exists(os.path.join(dp_dir, "checkpoint", "model.npz"))

        # predict bins for train+valid (predict command switches the splits
        # to the full train set, reference dist_pred/scheme.py:27-28)
        execute("predict", dp)
        bins_dir = os.path.join(dp_dir, "predictions", "bins3")
        meta = json.load(open(os.path.join(bins_dir, "meta.json")))
        assert meta == {"num_bins": 16, "range_bins": 8, "num_samples": 3}
        assert os.path.exists(os.path.join(bins_dir, "data",
                                           "train_000.parquet"))
        assert os.path.exists(os.path.join(bins_dir, "data",
                                           "val_000.parquet"))

        # ---- stage 2: pretrain ----------------------------------------
        pt = dict(COMMON, scheme="pcqm.pretrain", model_name="pt",
                  save_path_prefix=models, dataset_path=data,
                  coords_noise=0.2, coords_noise_smooth=1.0,
                  num_dist_bins=16, range_dist_bins=8, dist_loss_weight=0.1)
        result = execute("train", pt)
        assert np.isfinite(result["history"][-1]["val_loss"])
        pt_model = os.path.join(models, "pt", "checkpoint", "model.npz")

        # ---- stage 3: finetune on stage-1 bins + stage-2 weights -------
        ft = dict(COMMON, scheme="pcqm.finetune", model_name="ft",
                  save_path_prefix=models, dataset_path=data,
                  num_dist_bins=16, range_dist_bins=8, dist_loss_weight=0.1,
                  bins_input_path=bins_dir,
                  pretrained_weights_file=pt_model,
                  train_split="train", val_split="valid")
        result = execute("train", ft)
        assert np.isfinite(result["history"][-1]["val_loss"])
        ft_model = os.path.join(models, "ft", "checkpoint", "model.npz")

        # ---- stage 4: trim + evaluate ---------------------------------
        gp = dict(COMMON, scheme="pcqm.gap_pred", model_name="gp",
                  save_path_prefix=models, dataset_path=data,
                  num_dist_bins=16, range_dist_bins=8,
                  bins_input_path=bins_dir,
                  pretrained_weights_file=ft_model,
                  train_split="train", val_split="valid",
                  predict_on=["val"])
        execute("train", gp)   # trims the checkpoint
        metrics = execute("evaluate", gp)
        assert np.isfinite(metrics["val"]["loss"])
        results = yaml.safe_load(open(os.path.join(
            models, "gp", "predictions", "results.yaml")))
        assert "val" in results
