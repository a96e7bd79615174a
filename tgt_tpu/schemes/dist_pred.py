"""Stage 1 — distance predictor scheme.

Semantics match the reference (lib/training_schemes/pcqm/dist_pred/scheme.py):
- model: TGT_Distance (edge-ended encoder, bin logits head).
- input: RDKit/DFT/none coordinates (+ optional smooth input noise and target
  noise), distances computed on device.
- loss: masked cross-entropy of bin logits vs DFT distances.
- eval: MC-average of softmax probs over ``evaluation_samples`` dropout-on
  forward passes, symmetrized p + p^T, NaN draws skipped; per-graph xent.
- predict: per-sample argmax bins -> packed uint8/16 upper triangles ->
  per-rank parquet shards + meta.json (bins{S} directory layout).
"""
from __future__ import annotations

import json
import os
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from tgt_tpu.core.config import Config, Lazy
from tgt_tpu.data.bins import bins_dtype, pack_bins_multi
from tgt_tpu.schemes.base import TGTScheme, default_scheme_config
from tgt_tpu.schemes.commons import (add_coords_noise, coords2dist,
                                     discrete_dist_loss)


class DistPredScheme(TGTScheme):
    NAME = "dist_pred"
    MODEL = "distance"

    def default_config(self, command: str) -> Config:
        c = default_scheme_config()
        c["save_path_prefix"] = "models/pcqm/dist_pred"
        c["coords_noise"] = 0.0
        c["coords_noise_smooth"] = 0.0
        c["coords_input"] = "rdkit"      # 'rdkit' | 'dft' | 'none'
        c["coords_target"] = "dft"
        c["embed_3d_type"] = Lazy(
            lambda cc: "gaussian" if cc.coords_input != "none" else "none")
        c["num_dist_bins"] = 512
        c["range_dist_bins"] = 8.0
        c["coords_target_noise"] = 0.0
        c["save_pred_dir"] = Lazy(lambda cc: f"bins{cc.prediction_samples}")
        # reference uses train-3d/valid-3d for training, full train for predict
        # (dist_pred/scheme.py:27-28)
        c["train_split"] = "train-3d" if command != "predict" else "train"
        c["val_split"] = "valid-3d" if command != "predict" else "valid"
        c["predict_on"] = (["train", "val"] if command == "predict"
                           else ["val"])
        return c

    def extra_columns(self, split: str) -> List:
        from tgt_tpu.data.pcqm import Coords
        cols = []
        if self.cfg.coords_input == "rdkit" or self.cfg.coords_target == "rdkit":
            cols.append(Coords("rdkit"))
        if self.cfg.coords_input == "dft" or self.cfg.coords_target == "dft":
            cols.append(Coords("dft"))
        return cols

    def device_keys(self, training: bool = True):
        keys = ["node_features", "distance_matrix", "feature_matrix",
                "node_mask"]
        if self.cfg.coords_input != "none":
            keys.append(f"{self.cfg.coords_input}_coords")
        keys.append(f"{self.cfg.coords_target}_coords")
        return keys

    # -- device-side input construction -----------------------------------
    def _model_inputs(self, batch, edge_mask, rng, training: bool):
        feed = {k: batch[k] for k in ("node_features", "distance_matrix",
                                      "feature_matrix", "node_mask")}
        feed["edge_mask"] = edge_mask
        if self.cfg.coords_input != "none":
            coords = batch[f"{self.cfg.coords_input}_coords"]
            if training and self.cfg.coords_noise > 0:
                rng_noise, rng = jax.random.split(rng)
                coords = add_coords_noise(rng_noise, coords, edge_mask,
                                          self.cfg.coords_noise,
                                          self.cfg.coords_noise_smooth)
            feed["dist_input"] = coords2dist(coords)
        return feed, rng

    def _dist_target(self, batch, rng, training: bool):
        coords = batch[f"{self.cfg.coords_target}_coords"]
        if training and self.cfg.coords_target_noise > 0:
            rng_t, rng = jax.random.split(rng)
            coords = coords + jax.random.normal(
                rng_t, coords.shape, coords.dtype) * self.cfg.coords_target_noise
        return coords2dist(coords), rng

    # -- training ----------------------------------------------------------
    def loss_fn(self, params, batch, rng):
        edge_mask = self.edge_mask_of(batch)
        feed, rng = self._model_inputs(batch, edge_mask, rng, training=True)
        rng_t, rng_m = jax.random.split(rng)
        dist_targ, _ = self._dist_target(batch, rng_t, training=True)
        logits = self.apply_model(params, feed, deterministic=False, rng=rng_m)
        loss = discrete_dist_loss(logits, dist_targ, edge_mask,
                                  self.cfg.num_dist_bins,
                                  self.cfg.range_dist_bins)
        return loss, {}

    # -- evaluation ---------------------------------------------------------
    def eval_fn(self, params, batch, rng):
        edge_mask = self.edge_mask_of(batch)
        feed, rng = self._model_inputs(batch, edge_mask, rng, training=False)
        dist_targ, _ = self._dist_target(batch, rng, training=False)

        det = not self.cfg.predict_in_train  # dropout-on MC (reference
        # predict_in_train=True -> model.train() at prediction,
        # tgt_training.py:42, training.py:700-706)

        def one(key):
            logits = self.apply_model(params, feed, deterministic=det,
                                      rng=key)
            return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

        probs_sum, valid = self.mc_sample(one, rng, self.nb_draw_samples)
        probs = probs_sum + jnp.swapaxes(probs_sum, -2, -3)
        probs = probs / (2.0 * jnp.maximum(valid, 1).astype(jnp.float32))
        logits = jnp.log(probs + 1e-9)
        xent = discrete_dist_loss(logits, dist_targ, edge_mask,
                                  self.cfg.num_dist_bins,
                                  self.cfg.range_dist_bins, reduce=False)
        return {"loss": xent, "valid_samples": valid}

    def evaluate_predictions(self, preds: Dict[str, np.ndarray]
                             ) -> Dict[str, float]:
        return {"loss": float(np.mean(preds["loss"]))}

    # -- bins prediction ----------------------------------------------------
    def predict_bins_fn(self, params, batch, rng):
        """S stochastic argmax-bin draws (jitted). Returns (b, S, N, N) int32."""
        edge_mask = self.edge_mask_of(batch)
        feed, rng = self._model_inputs(batch, edge_mask, rng, training=False)
        keys = jax.random.split(rng, self.nb_draw_samples)

        det = not self.cfg.predict_in_train

        def one(key):
            logits = self.apply_model(params, feed, deterministic=det,
                                      rng=key)
            p = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            p = p + jnp.swapaxes(p, -2, -3)
            return jnp.argmax(p, axis=-1).astype(jnp.int32)

        bins = jax.lax.map(one, keys)          # (S, b, N, N)
        return jnp.swapaxes(bins, 0, 1)        # (b, S, N, N)

    def predict_and_save(self, params, rank: int = 0, world_size: int = 1,
                         base_path: str = None) -> None:
        """MC-sample bins for each predict_on split; write per-rank parquet
        shards + meta.json (reference dist_pred/scheme.py:256-306)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        base_path = base_path or os.path.join(self.cfg.save_path, "predictions")
        save_dir = os.path.join(base_path, self.cfg.save_pred_dir)
        data_dir = os.path.join(save_dir, "data")
        os.makedirs(data_dir, exist_ok=True)
        if rank == 0:
            with open(os.path.join(save_dir, "meta.json"), "w") as f:
                json.dump({"num_bins": self.cfg.num_dist_bins,
                           "range_bins": self.cfg.range_dist_bins,
                           "num_samples": self.nb_draw_samples}, f)

        pred_fn = jax.jit(self.predict_bins_fn)
        dtype = bins_dtype(self.cfg.num_dist_bins)
        for split in self.cfg.predict_on:
            loader = self.test_loader(split, rank, world_size)
            all_idx, all_bins = [], []
            offset = 0
            for i, batch in enumerate(loader):
                db = self.device_batch(batch, training=False)
                rng = jax.random.fold_in(jax.random.PRNGKey(1234 + rank), i)
                bins = np.asarray(pred_fn(params, db, rng)).astype(dtype)
                num_nodes = batch["node_mask"].sum(-1).astype(int)
                for bi, n in enumerate(num_nodes):
                    packed = pack_bins_multi(bins[bi, :, :n, :n]).reshape(-1)
                    all_bins.append(packed)
                # datasets carry global row ids ('idx'); a per-rank running
                # position is only safe single-rank (it would collide
                # across rank shards and misjoin in the finetune stage)
                idx = batch.get("idx")
                if idx is None:
                    if world_size > 1:
                        raise ValueError(
                            "multi-rank bins prediction needs global row "
                            "ids; dataset rows lack 'idx'")
                    idx = offset + np.arange(len(num_nodes))
                offset += len(num_nodes)
                all_idx.append(np.asarray(idx))
            table = pa.Table.from_pydict({
                "idx": np.concatenate(all_idx),
                "bins": all_bins})
            out = os.path.join(data_dir, f"{split}_{rank:03d}.parquet")
            pq.write_table(table, out)
            print(f"rank {rank} saved {split} bins to {out}", flush=True)
