"""Stage 3 — gap finetuning on predicted distance bins.

Semantics match the reference (lib/training_schemes/pcqm/finetune/scheme.py):
- model: TGT_Multi, initialized from the stage-2 checkpoint
  (``pretrained_weights_file``, non-strict).
- input distances: predicted bins via bins2dist (shift-half, symmetrize,
  zero diag); training uses bins sample index = epoch % num_samples; eval
  cycles through all stored samples.
- loss keeps the 0.1-weight denoising xent against DFT distances.
"""
from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from tgt_tpu.core.config import Config
from tgt_tpu.schemes.base import TGTScheme, default_scheme_config
from tgt_tpu.schemes.commons import (bins2dist, coords2dist,
                                     discrete_dist_loss, masked_l1)


class FinetuneScheme(TGTScheme):
    NAME = "finetune"
    MODEL = "multi"

    def __init__(self, overrides=None, command="train"):
        super().__init__(overrides, command)
        self.current_epoch = 0  # set by the trainer each epoch for bins cycling
        self._bins_meta = None

    def _load_bins_meta(self):
        if self._bins_meta is None:
            if self.cfg.bins_input_path:
                from tgt_tpu.data.pcqm import read_bins_meta
                m = read_bins_meta(self.cfg.bins_input_path)
                self._bins_meta = (m["num_samples"], m["num_bins"],
                                   m["range_bins"])
            else:  # synthetic mode: bins generated on the fly by the dataset
                self._bins_meta = (self.cfg.synth_bins_samples,
                                   self.cfg.num_dist_bins,
                                   self.cfg.range_dist_bins)
        return self._bins_meta

    @property
    def bins_num_samples(self):
        return self._load_bins_meta()[0]

    @property
    def bins_num_bins(self):
        return self._load_bins_meta()[1]

    @property
    def bins_range(self):
        return self._load_bins_meta()[2]

    def default_config(self, command: str) -> Config:
        c = default_scheme_config()
        c["save_path_prefix"] = "models/pcqm/finetune"
        c["num_dist_bins"] = 256
        c["range_dist_bins"] = 8.0
        c["dist_loss_weight"] = 0.1
        c["bins_input_path"] = None
        c["bins_shift_half"] = True
        c["bins_zero_diag"] = True
        c["synth_bins_samples"] = 4
        return c

    def extra_columns(self, split: str) -> List:
        from tgt_tpu.data.pcqm import Bins, Coords
        cols = [Bins(self.cfg.bins_input_path, self.bins_num_samples)]
        if split == "train" and self.command == "train":
            cols.append(Coords("dft"))
        return cols

    def get_dataset(self, split: str, rank: int = 0, world_size: int = 1):
        ds = super().get_dataset(split, rank, world_size)
        if self.cfg.dataset_source == "synthetic":
            self._attach_synthetic_bins(ds)
        return ds

    def _attach_synthetic_bins(self, ds):
        """Derive fake 'predicted' bins from the synthetic coords so the
        finetune path runs hermetically."""
        ds = getattr(ds, "dataset", ds)  # unwrap trial-run Subset views
        if getattr(ds, "_bins_attached", False):
            return
        rs = np.random.RandomState(7)
        bin_size = self.bins_range / (self.bins_num_bins - 1)
        for row in ds._cache:
            d = np.linalg.norm(row["dft_coords"][:, None]
                               - row["dft_coords"][None, :], axis=-1)
            bins = np.clip((d / bin_size), 0, self.bins_num_bins - 1)
            s = self.bins_num_samples
            noisy = bins[None] + rs.randint(-2, 3, (s,) + bins.shape)
            noisy = np.clip(noisy, 0, self.bins_num_bins - 1)
            row["dist_bins"] = np.triu(noisy, k=1).astype(np.float32)
        ds._bins_attached = True

    def device_keys(self, training: bool = True):
        keys = ["node_features", "distance_matrix", "feature_matrix",
                "node_mask", "target", "dist_bins"]
        if training:
            keys.append("dft_coords")
        return keys

    def _feed_from_bins(self, batch, edge_mask, bins):
        feed = {k: batch[k] for k in ("node_features", "distance_matrix",
                                      "feature_matrix", "node_mask")}
        feed["edge_mask"] = edge_mask
        feed["dist_input"] = bins2dist(bins, self.bins_num_bins,
                                       self.bins_range,
                                       self.cfg.bins_shift_half,
                                       self.cfg.bins_zero_diag)
        return feed

    def loss_fn(self, params, batch, rng):
        edge_mask = self.edge_mask_of(batch)
        # bins sample = epoch % S (reference finetune/scheme.py:78-88);
        # the trainer exposes the epoch via batch['bins_sample']
        sample = batch["bins_sample"]
        bins = jnp.take_along_axis(
            batch["dist_bins"],
            sample.reshape(1, 1, 1, 1).astype(jnp.int32), axis=1)[:, 0]
        feed = self._feed_from_bins(batch, edge_mask, bins)
        gap_pred, dist_logits = self.apply_model(params, feed,
                                                 deterministic=False, rng=rng)
        prim = masked_l1(gap_pred, batch["target"].astype(jnp.float32),
                         batch["sample_mask"])
        dist_targ = coords2dist(batch["dft_coords"])
        dloss = discrete_dist_loss(dist_logits, dist_targ, edge_mask,
                                   self.cfg.num_dist_bins,
                                   self.cfg.range_dist_bins)
        loss = prim + self.cfg.dist_loss_weight * dloss
        return loss, {"gap_loss": prim, "dist_loss": dloss}

    def device_batch(self, batch, training: bool = True):
        out = super().device_batch(batch, training)
        if training:
            out["bins_sample"] = np.asarray(
                self.current_epoch % self.bins_num_samples, np.int32)
        return out

    def eval_fn(self, params, batch, rng):
        edge_mask = self.edge_mask_of(batch)
        all_bins = batch["dist_bins"]          # (b, S, N, N)
        s_avail = all_bins.shape[1]

        def one_indexed(carry, key_i):
            key, i = key_i
            bins = jax.lax.dynamic_index_in_dim(
                all_bins, i % s_avail, axis=1, keepdims=False)
            feed = self._feed_from_bins(batch, edge_mask, bins)
            gap, _ = self.apply_model(
                params, feed, deterministic=not self.cfg.predict_in_train,
                rng=key)
            acc, valid = carry
            finite = jnp.all(jnp.isfinite(gap))
            acc = jnp.where(finite, acc + gap, acc)
            return (acc, valid + finite.astype(jnp.int32)), None

        keys = jax.random.split(rng, self.nb_draw_samples)
        idx = jnp.arange(self.nb_draw_samples, dtype=jnp.int32)
        b = all_bins.shape[0]
        (acc, valid), _ = jax.lax.scan(
            one_indexed, (jnp.zeros((b,), jnp.float32),
                          jnp.zeros((), jnp.int32)), (keys, idx))
        gap_pred = acc / jnp.maximum(valid, 1).astype(jnp.float32)
        gap_loss = jnp.abs(gap_pred - batch["target"].astype(jnp.float32))
        return {"gap_loss": gap_loss, "valid_samples": valid}

    def evaluate_predictions(self, preds: Dict[str, np.ndarray]
                             ) -> Dict[str, float]:
        return {"loss": float(np.mean(preds["gap_loss"]))}
