"""CLI layer tests: config grammar, dispatch, artifacts."""
import os

import numpy as np
import pytest
import yaml

from tgt_tpu.cli.execute import configs_from_args, execute


def write_yaml(path, d):
    with open(path, "w") as f:
        yaml.safe_dump(d, f)


TRIAL = dict(
    scheme="pcqm.dist_pred",
    model_name="trial_dp",
    dataset_source="synthetic",
    synth_train_samples=8, synth_val_samples=4, synth_max_nodes=8,
    batch_size=4, buckets=[8],
    model_height=2, node_width=16, edge_width=8, num_heads=4,
    triplet_heads=2, num_dist_bins=8,
    evaluation_samples=2, prediction_samples=2,
    max_lr=2e-3, lr_warmup_steps=2, lr_total_steps=1000,
    num_epochs=1, coords_input="rdkit",
)


class TestConfigGrammar:
    def test_yaml_file_plus_overrides(self, tmp_path):
        p = tmp_path / "cfg.yaml"
        write_yaml(p, {"scheme": "pcqm.dist_pred", "batch_size": 4})
        cfg = configs_from_args([str(p), "batch_size: 8", "max_lr: 0.01"])
        assert cfg["batch_size"] == 8        # later args win
        assert cfg["max_lr"] == 0.01

    def test_model_dir_shorthand(self, tmp_path):
        d = tmp_path / "model"
        d.mkdir()
        write_yaml(d / "config.yaml", {"scheme": "pcqm.pretrain"})
        cfg = configs_from_args([str(d)])
        assert cfg["scheme"] == "pcqm.pretrain"

    def test_missing_scheme_raises(self, tmp_path):
        with pytest.raises(ValueError, match="scheme"):
            configs_from_args(["batch_size: 4"])

    def test_unknown_key_rejected(self, tmp_path):
        cfg = dict(TRIAL)
        cfg["save_path_prefix"] = str(tmp_path)
        cfg["definitely_not_a_key"] = 1
        with pytest.raises(Exception):
            execute("train", cfg)


class TestCommands:
    def test_train_then_evaluate_then_predict(self, tmp_path):
        cfg = dict(TRIAL)
        cfg["save_path_prefix"] = str(tmp_path)
        execute("train", cfg)
        model_dir = tmp_path / "trial_dp"
        assert (model_dir / "checkpoint" / "model.npz").exists()
        assert (model_dir / "config.yaml").exists()

        metrics = execute("evaluate", cfg)
        assert np.isfinite(metrics["val"]["loss"])
        results = yaml.safe_load(open(model_dir / "predictions" /
                                      "results.yaml"))
        assert "val" in results

        execute("predict", cfg)
        bins_dir = model_dir / "predictions" / "bins2"
        assert (bins_dir / "meta.json").exists()
        assert (bins_dir / "data" / "val_000.parquet").exists()

    def test_published_configs_parse(self):
        """Every shipped config must resolve against its scheme's defaults."""
        import glob
        from tgt_tpu.schemes import get_scheme
        root = os.path.join(os.path.dirname(__file__), "..")
        files = glob.glob(os.path.join(root, "configs/pcqm/**/*.yaml"),
                          recursive=True)
        assert len(files) >= 14
        for f in files:
            cfg = yaml.safe_load(open(f))
            scheme_cls = get_scheme(cfg["scheme"])
            s = scheme_cls(cfg)  # raises on unknown keys
            assert s.model_cfg.node_width == 768


class TestTestSplitSubmission:
    def test_gap_pred_test_split_writes_submission(self, tmp_path):
        """predict_on: ['test'] produces the test-dev submission artifact
        (raw .npy here since ogb is unavailable)."""
        cfg = dict(
            scheme="pcqm.gap_pred", model_name="sub",
            save_path_prefix=str(tmp_path),
            dataset_source="synthetic", synth_train_samples=8,
            synth_val_samples=4, synth_max_nodes=8, batch_size=4,
            buckets=[8], model_height=2, node_width=16, edge_width=8,
            num_heads=4, triplet_heads=2, num_dist_bins=8,
            evaluation_samples=2, prediction_samples=2,
            predict_on=["test"],
        )
        metrics = execute("evaluate", cfg)
        assert "test" in metrics
        sub = tmp_path / "sub" / "predictions" / "y_pred_test_dev.npy"
        assert sub.exists()
        assert np.load(sub).shape == (4,)  # synth test split size
