"""Stage 4 — trimmed gap predictor: final evaluation / submission.

Semantics match the reference (lib/training_schemes/pcqm/gap_pred/scheme.py):
- model: TGT_Gap (distance head dropped); ``execute_training`` just loads the
  finetuned weights non-strictly and re-saves a trimmed checkpoint.
- eval: MC gap predictions cycling over stored bins samples, averaged; val ->
  MAE; test -> OGB test-dev submission file (gated on ogb availability).
"""
from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from tgt_tpu.core.config import Config
from tgt_tpu.schemes.finetune import FinetuneScheme


class GapPredScheme(FinetuneScheme):
    NAME = "gap_pred"
    MODEL = "gap"

    def default_config(self, command: str) -> Config:
        c = super().default_config(command)
        c["save_path_prefix"] = "models/pcqm/gap_pred"
        return c

    def extra_columns(self, split: str) -> List:
        from tgt_tpu.data.pcqm import Bins
        return [Bins(self.cfg.bins_input_path, self.bins_num_samples)]

    def device_keys(self, training: bool = True):
        return ("node_features", "distance_matrix", "feature_matrix",
                "node_mask", "target", "dist_bins")

    def loss_fn(self, params, batch, rng):
        raise NotImplementedError(
            "gap_pred does not train; execute_training only trims the "
            "finetuned checkpoint (reference gap_pred/scheme.py:144-154)")

    def eval_fn(self, params, batch, rng):
        edge_mask = self.edge_mask_of(batch)
        all_bins = batch["dist_bins"]
        s_avail = all_bins.shape[1]

        def one(carry, key_i):
            key, i = key_i
            bins = jax.lax.dynamic_index_in_dim(all_bins, i % s_avail,
                                                axis=1, keepdims=False)
            feed = self._feed_from_bins(batch, edge_mask, bins)
            gap = self.apply_model(
                params, feed, deterministic=not self.cfg.predict_in_train,
                rng=key)
            acc, valid = carry
            finite = jnp.all(jnp.isfinite(gap))
            acc = jnp.where(finite, acc + gap, acc)
            return (acc, valid + finite.astype(jnp.int32)), gap

        keys = jax.random.split(rng, self.nb_draw_samples)
        idx = jnp.arange(self.nb_draw_samples, dtype=jnp.int32)
        b = all_bins.shape[0]
        (acc, valid), all_gaps = jax.lax.scan(
            one, (jnp.zeros((b,), jnp.float32), jnp.zeros((), jnp.int32)),
            (keys, idx))
        gap_pred = acc / jnp.maximum(valid, 1).astype(jnp.float32)
        return {"gap_pred": gap_pred,
                "gap_target": batch["target"].astype(jnp.float32),
                "gap_samples": jnp.swapaxes(all_gaps, 0, 1),
                "valid_samples": valid}

    def evaluate_predictions(self, preds: Dict[str, np.ndarray],
                             dataset_name: str = "validation",
                             predictions_path: str = None) -> Dict[str, float]:
        gap_pred = preds["gap_pred"]
        target = preds["gap_target"]
        if dataset_name == "test":
            # OGB test-dev submission (reference gap_pred/scheme.py:121-130);
            # raw .npy fallback when ogb is unavailable
            import os
            out_dir = predictions_path or "."
            os.makedirs(out_dir, exist_ok=True)
            try:
                from ogb.lsc.pcqm4mv2 import PCQM4Mv2Evaluator
            except ImportError:
                np.save(os.path.join(out_dir, "y_pred_test_dev.npy"),
                        gap_pred)
                return {"loss": float("nan")}
            PCQM4Mv2Evaluator().save_test_submission(
                input_dict={"y_pred": gap_pred},
                dir_path=out_dir, mode="test-dev")
            return {"loss": float("nan")}
        return {"loss": float(np.mean(np.abs(gap_pred - target)))}

    def trim_checkpoint(self, finetuned_weights_file: str, out_file: str):
        """Load TGT_Multi weights non-strictly into TGT_Gap params and save
        the trimmed model (drops final_ln_edge/dist_pred + the last layer's
        edge branch)."""
        from tgt_tpu.training.checkpoint import load_pretrained, save_pytree
        template = self.init_params(jax.random.PRNGKey(0))
        params, missing, unexpected = load_pretrained(template,
                                                      finetuned_weights_file)
        save_pytree(params, out_file)
        return missing, unexpected
