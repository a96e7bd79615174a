"""Scheme base: task-pipeline protocol + the shared TGT scheme.

A *scheme* bundles everything task-specific that the generic Trainer
(training/harness.py) needs, the way the reference's TGTTraining subclasses do
(lib/training_schemes/pcqm/tgt_training.py:11-188):

- a layered default config (reference defaults preserved, SURVEY.md §5.6),
- dataset/loader factories with per-rank sharding,
- model construction (init_params) from the config,
- ``loss_fn(params, batch, rng) -> (loss, aux)``   [jitted by the harness]
- ``eval_fn(params, batch, rng) -> dict``          [jitted; MC-dropout sampling]
- prediction post-processing and metric computation on host.

Device-side preprocessing (edge_mask outer product, coordinate noise,
coords->distances, bins->distances) lives INSIDE loss_fn/eval_fn so it fuses
into the step program — the TPU-first version of the reference's
``preprocess_batch`` on-GPU stage (dist_pred/scheme.py:85-102).
"""
from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tgt_tpu.core.config import Config, Lazy
from tgt_tpu.data.collate import pad_batch_dim, padded_collate
from tgt_tpu.data.loader import (DataLoader, DistributedTestSampler,
                                 DistributedTrainSampler)
from tgt_tpu.data.synthetic import SyntheticDataset
from tgt_tpu.models import TGTConfig, make_model
from tgt_tpu.training import schedules


class Subset:
    """First-k view of a dataset (trial-run capping)."""

    def __init__(self, dataset, k: int):
        self.dataset = dataset
        self.k = k

    def __len__(self):
        return self.k

    def __getitem__(self, i):
        return self.dataset[i]

    @property
    def max_nodes_index(self):
        return 0


def default_scheme_config() -> Config:
    """Shared config keys; defaults mirror the reference
    (training.py:196-241, tgt_training.py:12-49, training_mixins.py:276-290)."""
    c = Config(
        scheme=None,
        model_name="tgt",
        model_prefix=None,
        save_path_prefix="models/pcqm",
        save_path=Lazy(lambda c: (
            f"{c.save_path_prefix}/{c.model_name}" if c.model_prefix is None
            else f"{c.save_path_prefix}/{c.model_prefix}/{c.model_name}")),
        # reference-compat keys accepted by published configs; 'distributed'
        # and 'dataloader_workers' are informational here (jax.distributed +
        # thread loader replace them); 'optimizer' IS honoured by name
        # (make_optimizer); mixed_precision maps to bfloat16 compute.
        distributed=False,
        dataloader_workers=1,
        evaluation_type="prediction",
        mixed_precision=False,
        # multi-host rendezvous (jax.distributed); None = single host / auto
        jax_coordinator=None,
        jax_num_processes=None,
        jax_process_id=None,
        dataset_source="pcqm",            # 'pcqm' | 'synthetic'
        dataset_path="data/PCQM",
        random_seed=0,
        num_epochs=1000,
        batch_size=32,
        validation_frequency=1,
        validation_condition=None,
        save_model_condition=None,
        # model
        model_height=4,
        node_width=64,
        edge_width=8,
        num_heads=8,
        node_act_dropout=0.0,
        edge_act_dropout=0.0,
        source_dropout=0.0,
        drop_path=0.0,
        activation="gelu",
        scale_degree=True,
        node_ffn_multiplier=1.0,
        edge_ffn_multiplier=1.0,
        layer_multiplier=1,
        upto_hop=32,
        triplet_heads=0,
        triplet_type="aggregate",
        triplet_dropout=0.0,
        embed_3d_type="gaussian",
        num_3d_kernels=128,
        # execution (TPU)
        compute_dtype="float32",
        remat=False,
        # selective-remat policy under remat=True: 'none' (full recompute,
        # measured fastest at PCQM shapes), 'dots', 'tri_a', 'proj' —
        # see docs/DESIGN.md remat table
        remat_policy="none",
        # persistent XLA compilation cache dir (None = off): restarted or
        # stage-transferred runs skip recompiling the flagship executables
        compilation_cache_dir=None,
        use_scan=True,
        use_pallas=False,
        # dense-kernel bucket floors (buckets below run XLA); 48 / 32-exact
        # = measured crossover on v5e — see TGTConfig.dense_min_nodes
        dense_min_nodes=48,
        dense_min_exact_nodes=32,
        # MC-draw schedule for stochastic evaluation (mc_sample): 'map' =
        # sequential lax.scan (lowest memory, the default), 'vmap' = all
        # draws batched into one program — faster on TPU when the per-draw
        # activations x num_samples fit (serving's mc_mode analog)
        mc_eval_mode="map",
        buckets=[16, 24, 32, 48, 64],
        # production mesh: GSPMD over (data, pair). use_mesh=False forces
        # single-device execution (debug); num_pair_devices>1 turns on
        # edge-block partitioning of the pair tensors (SURVEY.md §5.7)
        use_mesh=True,
        num_pair_devices=1,
        # training-time PRNG: 'rbg' = XLA counter-based RngBitGenerator
        # (~free on TPU; threefry dropout-mask generation costs ~10 ms/step
        # at flagship scale — see Trainer._make_key). 'threefry' for exact
        # cross-backend reproducibility.
        rng_impl="rbg",
        # optimizer / schedule ('adam' | 'adamw' | 'sgd', resolved by name
        # like the reference's torch.optim factory, training.py:159-171)
        optimizer="adam",
        sgd_momentum=0.0,
        max_lr=5e-4,
        min_lr=1e-6,
        lr_schedule="warmup_cosine",
        lr_warmup_steps=60_000,
        lr_total_steps=1_000_000,
        cosine_halfwave=False,
        clip_grad_value=None,
        clip_grad_norm=None,
        weight_decay=0.0,
        max_recovery_tries=10,
        # micro-batch gradient accumulation inside the jitted step (the
        # reference has none): batch_size stays the per-pass micro-batch
        # and train_loader sizes host batches at batch_size * accum
        grad_accum_steps=1,
        # published-recipe reproduction: when set, the Trainer derives
        # grad_accum_steps = global_batch_size / (batch_size * world_size)
        # so the SAME config executes the published global batch on any
        # topology (1 chip accumulates 32x; a 32-host pod accumulates 1x).
        # Mutually consistent with an explicit grad_accum_steps only.
        global_batch_size=None,
        # accumulated-grad batches must carry sample_mask; True opts raw
        # feeds into the node_mask-derived micro-weight heuristic instead
        # of a trace-time error
        infer_micro_weights=False,
        # ReduceLR-on-plateau (off unless rlr_factor set)
        rlr_factor=None,
        rlr_patience=10,
        stopping_lr=0.0,
        # pre-compile every bucket shape before epoch 1 (the TPU analog of
        # the reference's allocate_max_batch, tgt_training.py:118-135)
        precompile_buckets=False,
        # batch molecules of similar size together (smaller pad buckets ->
        # several-fold fewer padded pair-entries on real size distributions)
        size_bucketed_batching=False,
        # dev mode: raise on the first NaN inside jitted code (the jit-era
        # analog of the reference's runtime NaN checks, SURVEY.md §5.2)
        debug_nans=False,
        # eval / predict
        evaluation_samples=10,
        prediction_samples=10,
        predict_in_train=True,
        predict_on=["val"],
        prediction_bmult=1,
        monitor="val_loss",
        # checkpoints
        save_all_checkpoints=False,
        pretrained_weights_file=None,
        trial_run=False,
        # splits
        train_split="train",
        val_split="valid",
        test_split="test-dev",
        # synthetic-dataset controls (hermetic tests/benches)
        synth_train_samples=64,
        synth_val_samples=32,
        synth_max_nodes=16,
    )
    return c


class TGTScheme:
    """Base scheme; subclasses set ``MODEL`` and override task functions."""

    NAME = "base"
    MODEL = "multi"

    def __init__(self, overrides: Optional[Dict[str, Any]] = None,
                 command: str = "train"):
        cfg = self.default_config(command)
        if overrides:
            overrides = dict(overrides)
            overrides.pop("scheme", None)  # consumed by the CLI dispatcher
            cfg.override(overrides)
        self.cfg = cfg.resolve()
        if getattr(self.cfg, "mixed_precision", False) and \
                self.cfg.compute_dtype == "float32":
            self.cfg.compute_dtype = "bfloat16"
        if getattr(self.cfg, "debug_nans", False):
            import jax
            jax.config.update("jax_debug_nans", True)
        self.command = command
        self.model_cfg = self.build_model_cfg()
        self.init_fn, self.apply_fn = make_model(self.MODEL)
        self.nb_draw_samples = (self.cfg.prediction_samples
                                if command == "predict"
                                else self.cfg.evaluation_samples)
        self.lr_scale = 1.0
        self.lr_total_steps = self.cfg.lr_total_steps
        self._datasets: Dict[str, Any] = {}

    # -- config -----------------------------------------------------------
    def default_config(self, command: str) -> Config:
        return default_scheme_config()

    def build_model_cfg(self) -> TGTConfig:
        c = self.cfg

        def iv(v):
            # YAML lists become per-layer IndivConfig tuples
            # (reference TGT_Encoder.IndivConfig, encoder.py:25,54-56)
            return tuple(v) if isinstance(v, list) else v

        return TGTConfig(
            node_width=c.node_width, edge_width=c.edge_width,
            num_heads=iv(c.num_heads), model_height=c.model_height,
            layer_multiplier=c.layer_multiplier,
            triplet_heads=iv(c.triplet_heads),
            triplet_type=iv(c.triplet_type),
            triplet_dropout=iv(c.triplet_dropout),
            activation=iv(c.activation),
            scale_degree=iv(c.scale_degree),
            node_ffn_multiplier=iv(c.node_ffn_multiplier),
            edge_ffn_multiplier=iv(c.edge_ffn_multiplier),
            source_dropout=iv(c.source_dropout), drop_path=iv(c.drop_path),
            node_act_dropout=iv(c.node_act_dropout),
            edge_act_dropout=iv(c.edge_act_dropout),
            upto_hop=c.upto_hop, embed_3d_type=c.embed_3d_type,
            num_3d_kernels=c.num_3d_kernels,
            num_dist_bins=getattr(c, "num_dist_bins", 256),
            compute_dtype=c.compute_dtype, remat=c.remat,
            remat_policy=getattr(c, "remat_policy", "none") or "none",
            use_scan=c.use_scan, use_pallas=c.use_pallas,
            dense_min_nodes=getattr(c, "dense_min_nodes", 48),
            dense_min_exact_nodes=getattr(c, "dense_min_exact_nodes", 32))

    # -- model ------------------------------------------------------------
    def init_params(self, rng: jax.Array):
        return jax.jit(functools.partial(self.init_fn, cfg=self.model_cfg))(rng)

    def apply_model(self, params, batch, *, deterministic, rng=None):
        return self.apply_fn(params, batch, self.model_cfg,
                             deterministic=deterministic, rng=rng)

    def make_lr_schedule(self):
        c = self.cfg
        kind = c.lr_schedule or "constant"
        if kind == "warmup_cosine":
            return schedules.warmup_cosine(c.max_lr, c.lr_warmup_steps,
                                           c.lr_total_steps, c.min_lr,
                                           c.cosine_halfwave)
        if kind == "warmup_linear":
            return schedules.warmup_linear(c.max_lr, c.lr_warmup_steps)
        return schedules.constant(c.max_lr)

    # -- datasets ---------------------------------------------------------
    def dataset_split_name(self, split: str) -> str:
        return {"train": self.cfg.train_split, "val": self.cfg.val_split,
                "test": self.cfg.test_split}[split]

    def extra_columns(self, split: str) -> List:
        return []

    def get_dataset(self, split: str, rank: int = 0, world_size: int = 1):
        if split in self._datasets:
            return self._datasets[split]
        if self.cfg.dataset_source == "synthetic":
            n = (self.cfg.synth_train_samples if split == "train"
                 else self.cfg.synth_val_samples)
            ds = SyntheticDataset(num_samples=n, max_nodes=self.cfg.synth_max_nodes,
                                  seed={"train": 0, "val": 1, "test": 2}[split])
        else:
            from tgt_tpu.data.loader import slice_for_rank
            from tgt_tpu.data.pcqm import PCQM4Mv2Dataset
            from tgt_tpu.data.structural import AddStructuralData
            # per-rank cache range: each host only loads/caches its
            # contiguous sampler slice of the (3.3M-row) table — both
            # samplers use the same slice math (reference data.py:63-66,
            # tgt_training.py:59-62). trial_run reads rows 0..k, so it
            # needs the full range.
            cache_range_fn = None
            if world_size > 1 and not getattr(self.cfg, "trial_run", False):
                cache_range_fn = (lambda n, r=rank, w=world_size:
                                  slice_for_rank(n, r, w))
            ds = PCQM4Mv2Dataset(
                split=self.dataset_split_name(split),
                dataset_path=self.cfg.dataset_path,
                return_idx=True,
                cache_range_fn=cache_range_fn,
                transforms=[AddStructuralData()],
                additional_columns=self.extra_columns(split))
        if getattr(self.cfg, "trial_run", False):
            # trial_run caps datasets to 2 batches for a smoke run
            # (reference training.py:57-70,235-240)
            ds = Subset(ds, min(len(ds), self.cfg.batch_size * 2))
        self._datasets[split] = ds
        return ds

    def train_loader(self, epoch: int, rank: int, world_size: int):
        ds = self.get_dataset("train", rank, world_size)
        # per-process OPTIMIZER batch: batch_size micro-batches x the
        # accumulation factor (derived from global_batch_size when set, so
        # published global batches reproduce on any topology — the Trainer
        # resolves the same factor and splits the host batch back into
        # batch_size-sized micro-passes inside the jitted step)
        from tgt_tpu.training.harness import resolve_grad_accum
        bsz = self.cfg.batch_size * resolve_grad_accum(self.cfg, world_size)
        sizes = getattr(ds, "sizes", None)
        if getattr(self.cfg, "size_bucketed_batching", False) and \
                sizes is not None and len(sizes) == len(ds):
            from tgt_tpu.data.loader import SizeBucketedTrainSampler
            sampler = SizeBucketedTrainSampler(
                sizes, bsz, self.cfg.buckets, rank=rank,
                world_size=world_size, seed=self.cfg.random_seed or 0)
        else:
            sampler = DistributedTrainSampler(len(ds), bsz,
                                              rank=rank, world_size=world_size,
                                              seed=self.cfg.random_seed or 0)
        sampler.set_epoch(epoch)
        return DataLoader(ds, sampler,
                          collate_fn=lambda rows: padded_collate(
                              rows, buckets=tuple(self.cfg.buckets)))

    def val_loader(self, rank: int, world_size: int):
        ds = self.get_dataset("val", rank, world_size)
        bsz = round(self.cfg.batch_size * self.cfg.prediction_bmult)
        sampler = DistributedTestSampler(len(ds), bsz, rank=rank,
                                         world_size=world_size)
        return DataLoader(ds, sampler,
                          collate_fn=lambda rows: padded_collate(
                              rows, buckets=tuple(self.cfg.buckets)))

    def test_loader(self, split: str, rank: int, world_size: int):
        ds = self.get_dataset(split if split in ("train", "val", "test")
                              else "val", rank, world_size)
        bsz = round(self.cfg.batch_size * self.cfg.prediction_bmult)
        sampler = DistributedTestSampler(len(ds), bsz, rank=rank,
                                         world_size=world_size)
        return DataLoader(ds, sampler,
                          collate_fn=lambda rows: padded_collate(
                              rows, buckets=tuple(self.cfg.buckets)))

    # -- batch plumbing ---------------------------------------------------
    DEVICE_KEYS = ("node_features", "distance_matrix", "feature_matrix",
                   "node_mask", "target")

    def device_keys(self, training: bool = True):
        return self.DEVICE_KEYS

    def batch_num_samples(self, batch: Dict[str, np.ndarray]) -> int:
        return int(batch["node_mask"].shape[0])

    def device_batch(self, batch: Dict[str, np.ndarray],
                     training: bool = True) -> Dict[str, np.ndarray]:
        keys = [k for k in self.device_keys(training) if k in batch]
        sub = {k: batch[k] for k in keys}
        target_b = round(self.cfg.batch_size *
                         (1 if training else self.cfg.prediction_bmult))
        sub, sample_mask = pad_batch_dim(sub, max(target_b,
                                                  len(batch["node_mask"])))
        sub["sample_mask"] = sample_mask
        return sub

    @staticmethod
    def edge_mask_of(batch: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        nm = batch["node_mask"].astype(jnp.float32)
        # zero out padded samples entirely so they can't contribute to loss
        nm = nm * batch["sample_mask"][:, None]
        return nm[:, :, None] * nm[:, None, :]

    # -- task hooks (subclass responsibility) -----------------------------
    def loss_fn(self, params, batch, rng):
        raise NotImplementedError

    def eval_fn(self, params, batch, rng):
        raise NotImplementedError

    def postprocess_eval(self, out: Dict[str, np.ndarray],
                         host_batch: Dict[str, np.ndarray]
                         ) -> Dict[str, np.ndarray]:
        """Strip padded samples from per-graph outputs (host side)."""
        n = len(host_batch["node_mask"])
        return {k: v[:n] if v.ndim >= 1 and v.shape[0] >= n else v
                for k, v in out.items()}

    def evaluate_predictions(self, preds: Dict[str, np.ndarray]
                             ) -> Dict[str, float]:
        raise NotImplementedError

    # -- MC sampling helper ------------------------------------------------
    def mc_sample(self, fn, rng, num_samples: int):
        """Average ``fn(rng) -> pytree`` over ``num_samples`` stochastic
        draws, skipping non-finite draws (the jit-friendly analog of the
        reference's NaN-resample loop, dist_pred/scheme.py:139-167).

        Returns (summed pytree, valid_count).
        """
        keys = jax.random.split(rng, num_samples)

        if getattr(self.cfg, "mc_eval_mode", "map") == "vmap":
            # all draws in one program; same NaN-draw-skip semantics
            outs = jax.vmap(fn)(keys)
            finite = jnp.stack([
                jnp.all(jnp.isfinite(x.reshape(num_samples, -1)), axis=1)
                for x in jax.tree.leaves(outs)]).all(axis=0)
            acc = jax.tree.map(
                lambda o: jnp.sum(jnp.where(
                    finite.reshape((-1,) + (1,) * (o.ndim - 1)),
                    o.astype(jnp.float32), 0.0), axis=0), outs)
            return acc, jnp.sum(finite.astype(jnp.int32))

        def body(carry, key):
            acc, valid = carry
            out = fn(key)
            finite = jnp.all(jnp.asarray(
                [jnp.all(jnp.isfinite(x)) for x in jax.tree.leaves(out)]))
            acc = jax.tree.map(
                lambda a, o: jnp.where(finite, a + o.astype(jnp.float32), a),
                acc, out)
            return (acc, valid + finite.astype(jnp.int32)), None

        shapes = jax.eval_shape(fn, keys[0])
        zero = jax.tree.map(lambda s: jnp.zeros(s.shape, jnp.float32), shapes)
        (acc, valid), _ = jax.lax.scan(body, (zero, jnp.zeros((), jnp.int32)),
                                       keys)
        return acc, valid
