"""Stage 2 — gap pretraining on noisy DFT coordinates.

Semantics match the reference (lib/training_schemes/pcqm/pretrain/scheme.py):
- model: TGT_Multi (gap head + denoising distance head).
- input: DFT coords + smooth noise (sigma=coords_noise, tau=coords_noise_smooth).
- loss: L1(gap) + dist_loss_weight * xent(denoised 3D distances vs clean DFT).
- eval: MC-average both heads over dropout-on passes; per-graph |gap err| and
  per-graph dist xent.
"""
from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from tgt_tpu.core.config import Config
from tgt_tpu.schemes.base import TGTScheme, default_scheme_config
from tgt_tpu.schemes.commons import (add_coords_noise, coords2dist,
                                     discrete_dist_loss, masked_l1)


class PretrainScheme(TGTScheme):
    NAME = "pretrain"
    MODEL = "multi"

    def default_config(self, command: str) -> Config:
        c = default_scheme_config()
        c["save_path_prefix"] = "models/pcqm/pretrain"
        c["coords_noise"] = 0.5
        c["coords_noise_smooth"] = 1.0
        c["num_dist_bins"] = 256
        c["range_dist_bins"] = 8.0
        c["dist_loss_weight"] = 0.1
        c["train_split"] = "train-3d"
        c["val_split"] = "valid-3d"
        return c

    def extra_columns(self, split: str) -> List:
        from tgt_tpu.data.pcqm import Coords
        return [Coords("dft")]

    def device_keys(self, training: bool = True):
        return ("node_features", "distance_matrix", "feature_matrix",
                "node_mask", "target", "dft_coords")

    def _feed(self, batch, edge_mask, rng, noisy: bool):
        feed = {k: batch[k] for k in ("node_features", "distance_matrix",
                                      "feature_matrix", "node_mask")}
        feed["edge_mask"] = edge_mask
        coords = batch["dft_coords"]
        if noisy:
            rng_n, rng = jax.random.split(rng)
            coords = add_coords_noise(rng_n, coords, edge_mask,
                                      self.cfg.coords_noise,
                                      self.cfg.coords_noise_smooth)
        feed["dist_input"] = coords2dist(coords)
        return feed, rng

    def loss_fn(self, params, batch, rng):
        edge_mask = self.edge_mask_of(batch)
        # noise is applied at train AND eval time in the reference
        # (preprocess_batch ignores `training`, pretrain/scheme.py:60-76)
        feed, rng = self._feed(batch, edge_mask, rng, noisy=True)
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

    def eval_fn(self, params, batch, rng):
        edge_mask = self.edge_mask_of(batch)
        dist_targ = coords2dist(batch["dft_coords"])

        det = not self.cfg.predict_in_train

        def one(key):
            k_noise, k_model = jax.random.split(key)
            feed, _ = self._feed(batch, edge_mask, k_noise, noisy=True)
            gap, dist_logits = self.apply_model(params, feed,
                                                deterministic=det,
                                                rng=k_model)
            return {"gap": gap,
                    "probs": jax.nn.softmax(
                        dist_logits.astype(jnp.float32), axis=-1)}

        acc, valid = self.mc_sample(one, rng, self.nb_draw_samples)
        v = jnp.maximum(valid, 1).astype(jnp.float32)
        gap_pred = acc["gap"] / v
        gap_loss = jnp.abs(gap_pred - batch["target"].astype(jnp.float32))
        probs = acc["probs"] + jnp.swapaxes(acc["probs"], -2, -3)
        probs = probs / (2.0 * v)
        dist_loss = discrete_dist_loss(jnp.log(probs + 1e-9), dist_targ,
                                       edge_mask, self.cfg.num_dist_bins,
                                       self.cfg.range_dist_bins, reduce=False)
        return {"gap_loss": gap_loss, "dist_loss": dist_loss,
                "valid_samples": valid}

    def evaluate_predictions(self, preds: Dict[str, np.ndarray]
                             ) -> Dict[str, float]:
        gap = float(np.mean(preds["gap_loss"]))
        dist = float(np.mean(preds["dist_loss"]))
        return {"gap_loss": gap, "dist_loss": dist,
                "loss": gap + self.cfg.dist_loss_weight * dist}
