"""Training harness: the TPU-native equivalent of the reference TrainingBase /
TestingBase (lib/training/training.py:22-829, testing.py:11-177).

Design differences from the reference (TPU-first):
- one jitted ``train_step`` with donated state instead of an eager loop:
  loss + grad + clip + optax update + schedule compile to a single XLA program;
  GSPMD over the (data, pair) mesh replaces DDP (gradients all-reduce because
  the loss averages over the sharded global batch).
- sample-weighted loss accumulation happens on device (weights = valid-sample
  mask) and metrics transfer to host once per epoch segment, not per step.
- bf16 compute needs no GradScaler; the NaN discipline is kept: per-step NaN
  skip counting (tgt_training.py:159-168) and NaN/Inf-epoch ->
  reload-checkpoint retry, with ``max_recovery_tries`` actually enforced
  (the reference defines but never enforces it, training.py:229,821-828).

Scheme objects supply the task semantics via pure functions; see
schemes/base.py for the protocol.
"""
from __future__ import annotations

import os
import time
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from tgt_tpu.training.checkpoint import CheckpointManager, load_pretrained


class StopTraining(Exception):
    pass


_COND_OPS = {
    "Eq": lambda a, b: a == b, "NotEq": lambda a, b: a != b,
    "Lt": lambda a, b: a < b, "LtE": lambda a, b: a <= b,
    "Gt": lambda a, b: a > b, "GtE": lambda a, b: a >= b,
    "Add": lambda a, b: a + b, "Sub": lambda a, b: a - b,
    "Mult": lambda a, b: a * b, "Div": lambda a, b: a / b,
    "FloorDiv": lambda a, b: a // b, "Mod": lambda a, b: a % b,
}


def eval_condition(expr: Optional[str], context: Dict[str, Any]) -> bool:
    """Evaluate a config condition string like
    ``"epoch > 10 and epoch % 5 == 0"`` against log values.

    The reference eval()s these with full builtins (training.py:648-649,
    training_mixins.py:67,102). Here they go through a tiny AST interpreter
    instead: boolean/comparison/arithmetic operators, names bound to the
    context values, and literal constants — nothing else parses (no calls,
    no attributes, no subscripts, no dunder reachability), so a config typo
    fails loud and a malicious string has no surface at all.
    """
    if not expr:
        return True
    import ast

    def ev(node):
        if isinstance(node, ast.Expression):
            return ev(node.body)
        if isinstance(node, ast.BoolOp):
            vals = (ev(v) for v in node.values)
            return (all(map(bool, vals)) if isinstance(node.op, ast.And)
                    else any(map(bool, vals)))
        if isinstance(node, ast.UnaryOp):
            if isinstance(node.op, ast.Not):
                return not ev(node.operand)
            if isinstance(node.op, ast.USub):
                return -ev(node.operand)
            raise ValueError(f"operator not allowed in condition: "
                             f"{type(node.op).__name__}")
        if isinstance(node, ast.Compare):
            left = ev(node.left)
            for op, rhs in zip(node.ops, node.comparators):
                right = ev(rhs)
                fn = _COND_OPS.get(type(op).__name__)
                if fn is None:
                    raise ValueError(f"comparison not allowed in condition: "
                                     f"{type(op).__name__}")
                if not fn(left, right):
                    return False
                left = right
            return True
        if isinstance(node, ast.BinOp):
            fn = _COND_OPS.get(type(node.op).__name__)
            if fn is None:
                raise ValueError(f"operator not allowed in condition: "
                                 f"{type(node.op).__name__}")
            return fn(ev(node.left), ev(node.right))
        if isinstance(node, ast.Name):
            if node.id not in context:
                raise NameError(f"unknown name in condition: {node.id!r}")
            return context[node.id]
        if isinstance(node, ast.Constant):
            return node.value
        raise ValueError(
            f"syntax not allowed in condition: {type(node).__name__}")

    return bool(ev(ast.parse(expr, mode="eval")))


def make_optimizer(cfg, schedule) -> Tuple[Callable, Callable]:
    """Optimizer factory resolved by ``cfg.optimizer`` name; returns
    (init_fn, update_fn).

    update_fn(grads, opt_state, params, lr) -> (updates, new_opt_state).
    Hand-rolled (optax-compatible states are overkill here) so the checkpoint
    layout is a plain pytree and the whole step stays one fused XLA program.
    Names mirror the reference's resolve-by-name factory
    (training.py:159-171, any torch.optim / apex name):
    'adam' (the published-config default; wd as L2 into grads, matching
    torch.optim.Adam — apex FusedAdam is numerically the same algorithm),
    'adamw' (decoupled weight decay), 'sgd' (momentum via cfg.sgd_momentum).
    """
    name = (getattr(cfg, "optimizer", "adam") or "adam").lower()
    b1 = getattr(cfg, "adam_beta1", 0.9)
    b2 = getattr(cfg, "adam_beta2", 0.999)
    eps = getattr(cfg, "adam_eps", 1e-8)
    wd = getattr(cfg, "weight_decay", 0.0)
    momentum = getattr(cfg, "sgd_momentum", 0.0)
    clip_value = getattr(cfg, "clip_grad_value", None)
    clip_norm = getattr(cfg, "clip_grad_norm", None)
    if name not in ("adam", "adamw", "sgd"):
        raise ValueError(f"unknown optimizer {name!r} "
                         "(supported: adam, adamw, sgd)")

    def init_fn(params):
        zeros = jax.tree.map(jnp.zeros_like, params)
        if name == "sgd":
            return {"mu": zeros, "count": jnp.zeros((), jnp.int32)}
        return {"mu": zeros, "nu": jax.tree.map(jnp.zeros_like, params),
                "count": jnp.zeros((), jnp.int32)}

    def clip_and_decay(grads, params):
        if clip_value is not None:
            grads = jax.tree.map(
                lambda g: jnp.clip(g, -clip_value, clip_value), grads)
        if clip_norm is not None:
            gnorm = jnp.sqrt(sum(jnp.sum(jnp.square(g))
                                 for g in jax.tree.leaves(grads)))
            scale = jnp.minimum(1.0, clip_norm / (gnorm + 1e-12))
            grads = jax.tree.map(lambda g: g * scale, grads)
        if wd and name != "adamw":    # adamw decouples wd from the moments
            grads = jax.tree.map(lambda g, p: g + wd * p, grads, params)
        return grads

    def update_fn(grads, opt_state, params, lr):
        grads = clip_and_decay(grads, params)
        count = opt_state["count"] + 1
        if name == "sgd":
            mu = jax.tree.map(lambda m, g: momentum * m + g,
                              opt_state["mu"], grads)
            updates = jax.tree.map(lambda m: -lr * m, mu)
            return updates, {"mu": mu, "count": count}
        cf = count.astype(jnp.float32)
        mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g,
                          opt_state["mu"], grads)
        nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * jnp.square(g),
                          opt_state["nu"], grads)
        mu_hat_scale = 1.0 / (1 - b1 ** cf)
        nu_hat_scale = 1.0 / (1 - b2 ** cf)
        updates = jax.tree.map(
            lambda m, v: -lr * (m * mu_hat_scale)
            / (jnp.sqrt(v * nu_hat_scale) + eps), mu, nu)
        if name == "adamw" and wd:
            updates = jax.tree.map(lambda u, p: u - lr * wd * p,
                                   updates, params)
        return updates, {"mu": mu, "nu": nu, "count": count}

    return init_fn, update_fn


def resolve_grad_accum(cfg, world_size: int) -> int:
    """Micro-batch accumulation factor for this topology.

    Either the explicit ``grad_accum_steps``, or derived from
    ``global_batch_size`` so the published training budgets (BASELINE.md:
    dist_pred global batch 1024, pretrain/finetune 2048) reproduce on any
    world size: the per-process OPTIMIZER batch is
    ``batch_size * accum`` (the scheme's train_loader sizes its host
    batches accordingly) and ``batch_size`` stays the per-pass micro-batch
    that must fit in memory. One chip at batch_size 32 and
    global_batch_size 1024 accumulates 32 micro-batches per step; a
    32-process pod accumulates none.
    """
    explicit = max(1, int(getattr(cfg, "grad_accum_steps", 1) or 1))
    gbs = getattr(cfg, "global_batch_size", None)
    if not gbs:
        return explicit
    gbs = int(gbs)
    per_pass = int(cfg.batch_size) * max(1, world_size)
    if gbs % per_pass != 0:
        raise ValueError(
            f"global_batch_size={gbs} is not a multiple of "
            f"batch_size*world_size = {cfg.batch_size}*{world_size} "
            f"= {per_pass}")
    derived = max(1, gbs // per_pass)
    if explicit != 1 and explicit != derived:
        raise ValueError(
            f"grad_accum_steps={explicit} contradicts "
            f"global_batch_size={gbs} (which derives accum={derived} at "
            f"batch_size={cfg.batch_size}, world_size={world_size}); "
            f"set only one")
    return derived


class Trainer:
    """Generic epoch/step loop around a scheme's pure functions."""

    def __init__(self, scheme, rank: int = 0, world_size: int = 1):
        self.scheme = scheme
        self.cfg = scheme.cfg
        self.rank = rank
        self.world_size = world_size
        self.is_main = rank == 0

        # persistent XLA compilation cache: restarted runs / resumed stages
        # skip the 40s-10min flagship compiles (utils/compile_cache.py)
        from tgt_tpu.utils.compile_cache import enable_compilation_cache
        enable_compilation_cache(
            getattr(self.cfg, "compilation_cache_dir", None))

        # Production (data, pair) mesh: every jitted train/eval step runs
        # GSPMD-sharded over ALL devices — batches shard on their leading
        # axis over 'data' (XLA inserts the gradient all-reduce, replacing
        # the reference's DDP wrap, training.py:149-153) and, when
        # num_pair_devices > 1, node-pair tensors additionally shard over
        # 'pair' (edge-block partitioning, SURVEY.md §5.7).
        self.mesh = None
        self.num_pair = int(getattr(self.cfg, "num_pair_devices", 1) or 1)
        if getattr(self.cfg, "use_mesh", True) and \
                (len(jax.devices()) > 1 or self.num_pair > 1):
            from tgt_tpu.parallel.mesh import make_mesh
            self.mesh = make_mesh(
                num_data=len(jax.devices()) // self.num_pair,
                num_pair=self.num_pair)
        if getattr(self.cfg, "use_pallas", False):
            # Mosaic kernels cannot be partitioned by GSPMD AT ALL — even
            # batch-axis data parallelism raises NotImplementedError('wrap
            # the call in a shard_map') at TPU lowering (verified; see
            # docs/DESIGN.md "Pallas x sharding"). The dense kernels ship
            # that shard_map wrapper (every operand is batch-leading):
            # register the mesh so their cores shard over 'data' — and
            # CLEAR any registration left by a previous Trainer when this
            # one runs meshless, so single-device traces don't route
            # through a stale mesh. The legacy fused kernel and pair
            # sharding stay rejected.
            if self.cfg.use_pallas == "dense":
                if self.num_pair > 1:
                    raise ValueError(
                        "use_pallas='dense' does not compose with "
                        "num_pair_devices > 1 (the shard_map wrapper covers "
                        "the data axis only; Mosaic is opaque to GSPMD) — "
                        "use the jnp triplet path for pair-sharded configs")
                from tgt_tpu.ops.pallas.triplet_dense import (
                    set_dense_data_mesh)
                set_dense_data_mesh(self.mesh)  # None clears when meshless
            elif self.mesh is not None:
                raise ValueError(
                    "use_pallas=True (legacy fused kernel) does not compose "
                    "with the mesh Trainer (Mosaic is opaque to GSPMD; only "
                    "use_pallas='dense' ships the shard_map data-parallel "
                    "wrapper) — set use_mesh: false on one chip, switch to "
                    "use_pallas: dense, or use the jnp triplet path")

        self.model_path = self.cfg.save_path
        self.log_path = os.path.join(self.model_path, "logs")
        self.ckpt = CheckpointManager(
            self.model_path,
            save_backups=getattr(self.cfg, "save_all_checkpoints", False))

        self.schedule = scheme.make_lr_schedule()
        self.opt_init, self.opt_update = make_optimizer(self.cfg, self.schedule)

        # optional ReduceLR-on-plateau controller (reference
        # training_mixins.py:170-255); active when rlr_factor is configured
        self.plateau = None
        if getattr(self.cfg, "rlr_factor", None):
            from tgt_tpu.training.schedules import PlateauController
            self.plateau = PlateauController(
                factor=self.cfg.rlr_factor,
                patience=getattr(self.cfg, "rlr_patience", 10),
                stopping_lr=getattr(self.cfg, "stopping_lr", 0.0))

        # host-side counters (reference state dict, training.py:246-248)
        self.epoch = 0
        self.global_step = 0
        self.recovery_tries = 0
        self.monitor_best = float("inf")
        self.monitor_best_epoch = -1

        # grad-accum factor, resolved ONCE against the topology: an explicit
        # grad_accum_steps, or derived from global_batch_size so published
        # recipes (dist_pred 1024, pretrain/finetune 2048 — BASELINE.md)
        # execute the same effective batch on any world size. The scheme's
        # train_loader uses the SAME resolution to size its host batches
        # (optimizer batch = batch_size * accum per process).
        self.grad_accum = resolve_grad_accum(self.cfg, self.world_size)

        self._train_step = None  # built lazily (jit)
        self._eval_step = None

    # ------------------------------------------------------------------
    # mesh / sharding helpers
    # ------------------------------------------------------------------
    @property
    def _repl(self):
        from jax.sharding import NamedSharding, PartitionSpec as P
        return NamedSharding(self.mesh, P())

    def shard_state(self, state):
        """Replicate the training state over the mesh (pure DP: params and
        optimizer moments live on every device)."""
        if self.mesh is None:
            return state
        return jax.device_put(state, self._repl)

    def shard_device_batch(self, device_batch):
        """Globally shard a device batch over the mesh (leading axis over
        'data', pair tensors over 'pair').

        The batch axis pads up to a multiple of the data-axis size first —
        sharded device_put needs exact divisibility and padded rows already
        carry zero sample weight. Same zero-pad discipline as
        data/collate.pad_batch_dim (kept separate because device batches may
        contain 0-d per-batch metadata, e.g. finetune's 'bins_sample', which
        pad_batch_dim's pad-every-key contract would reject; if the padding
        semantics ever change, change BOTH)."""
        if self.mesh is None:
            # meshless (single device) still needs the accum padding below:
            # train_loader sizes host batches at batch_size*accum, so an
            # UNEVEN final batch would otherwise reach accumulated_grad's
            # divisibility check unpadded and fail at trace time (round-5
            # review finding — the mesh branch was the only place padding
            # happened, and the hermetic suite always has a mesh)
            nd = 1
        else:
            from tgt_tpu.parallel.mesh import DATA_AXIS, make_global_batch
            nd = self.mesh.shape[DATA_AXIS]
        # pad to a multiple of nd * grad_accum_steps: each of the accum
        # micro-batches (size batch/accum) must itself divide over the data
        # axis — lcm(nd, accum) is NOT enough when gcd(nd, accum) > 1
        # (e.g. 8 data devices, accum 2, batch 8: lcm pads to 8, but the
        # micro-batch of 4 cannot shard over 8 devices; the dense kernel's
        # shard_map rejects it at trace, and GSPMD would shard it
        # degenerately). nd*accum also keeps accumulated_grad's accum-
        # divisibility check satisfied.
        accum = self.grad_accum
        quantum = nd * accum
        lead = [np.shape(v)[0] for v in device_batch.values()
                if np.ndim(v) >= 1]
        b = max(lead) if lead else 0
        # every ndim>=1 entry of a scheme device batch is per-sample today;
        # an array with a different leading dim would be silently REPLICATED
        # by make_global_batch's local_batch rule — fail loudly instead so a
        # future shared array is added to the explicit replicate set rather
        # than classified by shape coincidence (round-3 review finding)
        odd = {k: np.shape(v) for k, v in device_batch.items()
               if np.ndim(v) >= 1 and np.shape(v)[0] != b}
        if odd:
            raise ValueError(
                f"device batch entries with non-batch leading dims {odd} "
                f"(batch={b}): per-sample arrays must lead with the batch "
                "dim; genuinely shared arrays need an explicit replicate "
                "rule in parallel/mesh.py")
        target = -(-b // quantum) * quantum if b else 0
        if target != b:
            def pad_rows(v):
                v = np.asarray(v)
                if v.ndim >= 1 and v.shape[0] == b:
                    pad = np.zeros((target - b,) + v.shape[1:], v.dtype)
                    return np.concatenate([v, pad], axis=0)
                return v
            device_batch = {k: pad_rows(v) for k, v in device_batch.items()}
        if self.mesh is None:
            return device_batch
        return make_global_batch(self.mesh, device_batch, self.num_pair,
                                 local_batch=(target or None))

    def _make_key(self, seed: int) -> jax.Array:
        """Root PRNG key honouring cfg.rng_impl.

        'rbg' (default) uses XLA's counter-based RngBitGenerator — on TPU the
        threefry2x32 default costs ~10 ms/step at flagship scale generating
        per-layer dropout masks (measured 26.34 -> 24.32 ms on the 4-layer
        stochastic stack, benchmarks/layer_forensics.py) while rbg is ~free.
        Reproducible for a fixed backend+compiler; set rng_impl='threefry'
        for exact cross-backend reproducibility. Typed keys are used so the
        impl tag survives fold_in/split inside the jitted step; keys never
        enter checkpoints (they are re-derived from global_step)."""
        impl = getattr(self.cfg, "rng_impl", "rbg") or "rbg"
        if impl == "threefry":        # config-friendly alias
            impl = "threefry2x32"
        return jax.random.key(seed, impl=impl)

    def _put_repl(self, x):
        """Scalar step inputs (step index, rng, lr scale) as replicated
        global arrays so the sharded jit accepts them in multi-process.

        device_put rejects shardings with non-addressable devices, so the
        multi-process case goes through make_array_from_callback (every
        process holds the same host value — replication is consistent)."""
        x = jnp.asarray(x)
        if self.mesh is None:
            return x
        if jax.process_count() == 1:
            return jax.device_put(x, self._repl)
        if jnp.issubdtype(x.dtype, jax.dtypes.prng_key):
            # typed PRNG keys aren't numpy-convertible; ship the raw bits
            raw = self._put_repl(jax.random.key_data(x))
            return jax.random.wrap_key_data(
                raw, impl=jax.random.key_impl(x))
        host = np.asarray(x)
        return jax.make_array_from_callback(host.shape, self._repl,
                                            lambda idx: host[idx])

    # ------------------------------------------------------------------
    # state init / restore
    # ------------------------------------------------------------------
    def init_state(self, rng: jax.Array) -> Dict[str, Any]:
        params = self.scheme.init_params(rng)
        opt_state = jax.jit(self.opt_init)(params)
        return self.shard_state({"params": params, "opt_state": opt_state})

    def load_or_init(self, rng: jax.Array) -> Dict[str, Any]:
        state = self.init_state(rng)
        if self.ckpt.has_checkpoint():
            params, opt_state, counters = self.ckpt.load(
                state["params"], state["opt_state"])
            state = {"params": jax.tree.map(jnp.asarray, params),
                     "opt_state": jax.tree.map(jnp.asarray, opt_state)}
            self.epoch = counters.get("epoch", 0)
            self.global_step = counters.get("global_step", 0)
            self.monitor_best = counters.get("monitor_best", float("inf"))
            self.monitor_best_epoch = counters.get("monitor_best_epoch", -1)
            self.recovery_tries = counters.get("recovery_tries", 0)
            # restore plateau-LR state so lr_scale survives resume
            # (the reference persists mixin state in the training state
            # dict, training.py:246-248,284-290)
            if self.plateau is not None and "plateau" in counters:
                self.plateau.load_state_dict(counters["plateau"])
                self.scheme.lr_scale = self.plateau.scale
            if self.is_main:
                print(f"Resumed from checkpoint @ epoch {self.epoch}, "
                      f"step {self.global_step}", flush=True)
        elif getattr(self.cfg, "pretrained_weights_file", None):
            # non-strict stage-transfer load (reference tgt_training.py:174-187)
            params, missing, unexpected = load_pretrained(
                state["params"], self.cfg.pretrained_weights_file)
            state["params"] = jax.tree.map(jnp.asarray, params)
            if self.is_main:
                print(f"Loaded pretrained weights from "
                      f"{self.cfg.pretrained_weights_file}", flush=True)
                print(f"missing keys: {missing[:8]}", flush=True)
                print(f"unexpected keys: {unexpected[:8]}", flush=True)
        return self.shard_state(state)

    # ------------------------------------------------------------------
    # jitted steps
    # ------------------------------------------------------------------
    def build_train_step(self):
        scheme = self.scheme
        opt_update = self.opt_update
        schedule = self.schedule
        accum = self.grad_accum

        def grad_of(params, batch, rng):
            return jax.value_and_grad(
                lambda p: scheme.loss_fn(p, batch, rng),
                has_aux=True)(params)

        def accumulated_grad(params, batch, rng):
            """Micro-batch gradient accumulation inside the jitted step
            (the reference has none — 1 step per batch, SURVEY.md §2; this
            lets few chips match the published global batch sizes). The
            batch's leading axis splits into `accum` micro-batches scanned
            sequentially; grads average."""
            if accum <= 1:
                return grad_of(params, batch, rng)

            # per-sample arrays are the ones sharing the batch's leading dim
            # (key-agnostic, SHAPE-exact: scalars and per-batch metadata like
            # finetune's 'bins_sample' broadcast to every micro-batch).
            # Using == batch_size rather than "% accum == 0" so metadata with
            # a coincidentally divisible leading dim is never mis-split.
            if "node_features" in batch:     # canonical per-sample key
                batch_size = batch["node_features"].shape[0]
            else:
                batch_size = max((v.shape[0] for v in batch.values()
                                  if jnp.ndim(v) >= 1), default=0)
            if batch_size % accum != 0:
                raise ValueError(
                    f"grad_accum_steps={accum} must divide the (possibly "
                    f"mesh-padded) batch size {batch_size}; silent fallback "
                    "would run the FULL batch per micro-step")

            def splittable(x):
                return jnp.ndim(x) >= 1 and x.shape[0] == batch_size

            def split(x):
                b = x.shape[0]
                return x.reshape(accum, b // accum, *x.shape[1:])

            micro = {k: split(v) for k, v in batch.items() if splittable(v)}
            shared = {k: v for k, v in batch.items() if not splittable(v)}
            rngs = jax.random.split(rng, accum)

            infer_weights = bool(getattr(self.cfg, "infer_micro_weights",
                                         False))
            if "sample_mask" not in batch and not infer_weights:
                # fail LOUD at trace time (VERDICT r3 #8): silently
                # inferred micro-weights can disagree with the loss's own
                # normalization
                raise ValueError(
                    "grad_accum_steps>1 needs 'sample_mask' in the device "
                    "batch (padded_collate/pad_batch_dim and "
                    "shard_device_batch provide it). Set "
                    "infer_micro_weights=True to opt into the "
                    "node_mask-derived micro-weight heuristic for raw "
                    "feeds.")

            def micro_weight(mb):
                """Real (non-padding) sample count of a micro-batch. Uses
                sample_mask — the SAME marker the masked-mean losses divide
                by (edge_mask_of) — so gradient weights can never disagree
                with the loss normalization. Mesh padding
                (shard_device_batch) zero-extends it, so a padded sample
                weighs 0; weighting by real samples keeps uneven final
                batches exact — a uniform 1/accum average would let
                all-padding micro-batches dilute the gradient by up to
                accum x (and their 0/0 masked-mean losses would poison it
                with NaN). Raw feeds that lack sample_mask fail LOUD at
                trace time (checked in accumulated_grad above);
                infer_micro_weights=True opts into the node_mask
                heuristic."""
                sm = mb.get("sample_mask")
                if sm is not None:
                    return jnp.sum(sm.astype(jnp.float32))
                nm = mb.get("node_mask")
                if nm is None:
                    return jnp.asarray(1.0, jnp.float32)
                return jnp.sum(jnp.any(nm > 0, axis=-1).astype(jnp.float32))

            def body(carry, xs):
                loss_sum, aux_sum, grad_sum, w_sum = carry
                mb, r = xs
                (loss, aux), grads = grad_of(params, {**mb, **shared}, r)
                w = micro_weight(mb)
                ok = w > 0  # all-padding micro: exclude its (NaN-prone) terms
                wz = jnp.where(ok, w, 0.0)
                safe = lambda x: jnp.where(ok, x, 0.0).astype(jnp.float32)
                carry = (loss_sum + wz * safe(loss),
                         jax.tree.map(lambda a, x: a + wz * safe(x),
                                      aux_sum, aux),
                         jax.tree.map(lambda a, g: a + wz * safe(g),
                                      grad_sum, grads),
                         w_sum + wz)
                return carry, None

            zero_shapes = jax.eval_shape(
                grad_of, params,
                {**jax.tree.map(lambda x: x[0], micro), **shared}, rngs[0])
            (loss0_s, aux0_s), grads_s = zero_shapes
            init = (jnp.zeros((), jnp.float32),
                    jax.tree.map(lambda s: jnp.zeros(s.shape, jnp.float32),
                                 aux0_s),
                    jax.tree.map(lambda s: jnp.zeros(s.shape, jnp.float32),
                                 grads_s),
                    jnp.zeros((), jnp.float32))
            (loss_sum, aux_sum, grad_sum, w_sum), _ = jax.lax.scan(
                body, init, (micro, rngs))
            inv = 1.0 / jnp.maximum(w_sum, 1.0)
            cast = lambda t, s: (t * inv).astype(s.dtype)
            return ((cast(loss_sum, loss0_s),
                     jax.tree.map(cast, aux_sum, aux0_s)),
                    jax.tree.map(cast, grad_sum, grads_s))

        def train_step(state, batch, step, rng, lr_scale):
            (loss, aux), grads = accumulated_grad(state["params"], batch, rng)
            lr = schedule(step) * lr_scale
            updates, new_opt = opt_update(grads, state["opt_state"],
                                          state["params"], lr)
            new_params = jax.tree.map(lambda p, u: p + u,
                                      state["params"], updates)
            # NaN-step guard: skip the update if loss is non-finite
            # (bf16 analog of GradScaler skipping inf steps, training.py:467-469)
            ok = jnp.isfinite(loss)
            new_state = {
                "params": jax.tree.map(
                    lambda n, o: jnp.where(ok, n, o), new_params,
                    state["params"]),
                "opt_state": jax.tree.map(
                    lambda n, o: jnp.where(ok, n, o), new_opt,
                    state["opt_state"]),
            }
            metrics = {"loss": loss, "lr": lr, "ok": ok}
            metrics.update(aux)
            return new_state, metrics

        if self.mesh is not None:
            # state and metrics stay replicated; the batch keeps whatever
            # sharding its arrays arrive with (shard_device_batch)
            return jax.jit(train_step, donate_argnums=(0,),
                           out_shardings=(self._repl, self._repl))
        return jax.jit(train_step, donate_argnums=(0,))

    def build_eval_step(self):
        scheme = self.scheme

        def eval_step(params, batch, rng):
            return scheme.eval_fn(params, batch, rng)

        return jax.jit(eval_step)

    def precompile(self, state) -> list:
        """AOT-compile the train step for EVERY configured bucket shape
        before epoch 1 (analog of the reference's allocate_max_batch warmup,
        tgt_training.py:118-135 — fixed shapes make it a compile cache fill
        rather than an allocator cache fill). Buckets smaller than the
        sampled batch are covered too: the batch is trimmed to the bucket
        shape (content is irrelevant — the executable cache is keyed on
        shapes only). Returns the list of buckets compiled."""
        from tgt_tpu.data.collate import repad_to_bucket
        if self._train_step is None:
            self._train_step = self.build_train_step()
        loader = self.scheme.train_loader(0, self.rank, self.world_size)
        batch = next(iter(loader))
        done = []
        for bucket in getattr(self.cfg, "buckets", []):
            fake = repad_to_bucket(batch, bucket, allow_trim=True)
            db = self.shard_device_batch(self.scheme.device_batch(fake))
            self._train_step.lower(
                state, db, self._put_repl(jnp.asarray(0, jnp.int32)),
                self._put_repl(self._make_key(0)),
                self._put_repl(jnp.asarray(1.0, jnp.float32))).compile()
            done.append(bucket)
            if self.is_main:
                print(f"precompiled bucket {bucket}", flush=True)
        return done

    # ------------------------------------------------------------------
    # loops
    # ------------------------------------------------------------------
    def train_epoch(self, state, loader):
        """Run one epoch. Returns (state, logs, stop_reason) where stop_reason
        is None, 'nan' (NaN streak — roll back), or 'budget' (step budget
        exhausted — save and stop). Exceptions can't be used for the stop
        path: the jitted step donates its input state, so the caller must
        always receive the live output state."""
        if self._train_step is None:
            self._train_step = self.build_train_step()
        total_loss = 0.0
        total_samples = 0.0
        nan_streak = 0
        last_lr = 0.0
        pending = []  # (metrics, n_samples) — fetched with a small delay

        def drain(flush=False):
            """Returns 'nan' if the NaN streak limit is exceeded, else None."""
            nonlocal total_loss, total_samples, nan_streak, last_lr
            limit = 0 if flush else 2
            while len(pending) > limit:
                m, n = pending.pop(0)
                loss = float(m["loss"])
                last_lr = float(m["lr"])
                if np.isfinite(loss):
                    nan_streak = 0
                    total_loss += loss * n
                    total_samples += n
                else:
                    nan_streak += 1
                    # tolerate up to 10 consecutive NaN steps
                    # (reference tgt_training.py:159-168)
                    if nan_streak > 10:
                        return "nan"
            return None

        stop_reason = None
        for batch in loader:
            n = self.scheme.batch_num_samples(batch)
            device_batch = self.shard_device_batch(self.scheme.device_batch(batch))
            # NOTE: under the global mesh the per-step rng is shared by all
            # ranks (the batch is one global array; dropout masks derive from
            # positions, not ranks)
            rng = jax.random.fold_in(self._make_key(
                getattr(self.cfg, "random_seed", 0) or 0),
                self.global_step if self.mesh is not None
                else self.global_step * self.world_size + self.rank)
            state, metrics = self._train_step(
                state, device_batch,
                self._put_repl(jnp.asarray(self.global_step, jnp.int32)),
                self._put_repl(rng),
                self._put_repl(jnp.asarray(self.scheme.lr_scale, jnp.float32)))
            pending.append((metrics, n))
            stop_reason = drain()
            if stop_reason:
                break
            self.global_step += 1
            if self.global_step > self.scheme.lr_total_steps:
                stop_reason = drain(flush=True) or "budget"
                break
        if stop_reason is None:
            stop_reason = drain(flush=True)
        logs = {"loss": total_loss / max(total_samples, 1e-12), "lr": last_lr}
        return state, logs, stop_reason

    def eval_epoch(self, params, loader, seed: int = 0) -> Dict[str, np.ndarray]:
        if self._eval_step is None:
            self._eval_step = self.build_eval_step()
        collected: Dict[str, list] = {}
        # per-sample eval outputs must be host-readable: shard eval batches
        # over the mesh only in single-process mode (multi-process keeps
        # eval local per rank and gathers afterwards, reference
        # training.py:746-774)
        use_mesh = self.mesh is not None and jax.process_count() == 1
        if self.mesh is not None and not use_mesh:
            # params arrive replicated over the global mesh; pull a host copy
            # so the local eval jit doesn't mix global and local arrays, and
            # pin it to a local device ONCE (uncommitted numpy args would be
            # re-transferred on every eval batch — ~400MB/batch at flagship)
            params = jax.device_put(jax.device_get(params),
                                    jax.local_devices()[0])
        for i, batch in enumerate(loader):
            device_batch = self.scheme.device_batch(batch, training=False)
            if use_mesh:
                device_batch = self.shard_device_batch(device_batch)
            rng = jax.random.fold_in(self._make_key(seed + 1000), i)
            out = self._eval_step(params, device_batch, rng)
            out = {k: np.asarray(v) for k, v in out.items()}
            if "valid_samples" in out and np.all(out["valid_samples"] == 0):
                # all MC draws were non-finite (reference raises
                # 'All predictions were NaN', dist_pred/scheme.py:158-159)
                print(f"WARNING: all MC draws non-finite in eval batch {i}",
                      flush=True)
            out = self.scheme.postprocess_eval(out, batch)
            for k, v in out.items():
                collected.setdefault(k, []).append(v)
        return {k: np.concatenate(v, axis=0) if np.ndim(v[0]) > 0
                else np.asarray(v) for k, v in collected.items()}

    # ------------------------------------------------------------------
    # full run
    # ------------------------------------------------------------------
    def fit(self, num_epochs: Optional[int] = None) -> Dict[str, Any]:
        cfg = self.cfg
        num_epochs = num_epochs or getattr(cfg, "num_epochs", 1)
        rng = jax.random.PRNGKey(getattr(cfg, "random_seed", 0) or 0)  # param init stays threefry (checkpoint/golden parity)
        state = self.load_or_init(rng)

        if self.is_main:
            os.makedirs(self.log_path, exist_ok=True)
            self._quarantine_corrupted_history()
            self.save_config()
            from tgt_tpu.utils.profiling import model_summary
            model_summary(state["params"],
                          os.path.join(self.model_path, "model_summary.txt"))

        if getattr(cfg, "precompile_buckets", False):
            self.precompile(state)

        history = []
        val_every = getattr(cfg, "validation_frequency", 1)
        while self.epoch < num_epochs:
            t0 = time.time()
            self.scheme.current_epoch = self.epoch
            loader = self.scheme.train_loader(self.epoch, self.rank,
                                              self.world_size)
            state, train_logs, stop_reason = self.train_epoch(state, loader)
            if stop_reason == "nan":
                if self.recovery_tries >= getattr(cfg, "max_recovery_tries", 10):
                    raise RuntimeError(
                        "NaN loss persisted past max_recovery_tries")
                self.recovery_tries += 1
                if self.is_main:
                    print(f"NaN epoch — rolling back to checkpoint "
                          f"(try {self.recovery_tries})", flush=True)
                state = self.load_or_init(rng)
                continue
            if stop_reason == "budget":
                self.checkpoint(state)
                break
            train_time = time.time() - t0

            logs = {"epoch": self.epoch, "global_step": self.global_step,
                    "train_time": train_time, **train_logs}

            should_validate = (self.epoch + 1) % val_every == 0 and \
                eval_condition(getattr(cfg, "validation_condition", None),
                               logs)
            if should_validate:
                t0 = time.time()
                val_loader = self.scheme.val_loader(self.rank, self.world_size)
                preds = self.eval_epoch(state["params"], val_loader,
                                        seed=self.epoch)
                if self.world_size > 1:
                    # monitor-best / plateau must act on the GLOBAL val
                    # metric, not rank-0's shard (reference monitors the
                    # all-gathered predictions, training.py:746-774)
                    from tgt_tpu.parallel.mesh import gather_predictions
                    preds = gather_predictions(preds, self.world_size)
                val_metrics = self.scheme.evaluate_predictions(preds)
                logs.update({f"val_{k}": float(v)
                             for k, v in val_metrics.items()})
                logs["val_time"] = time.time() - t0
                self.update_monitor(logs, state)
                if self.plateau is not None and "val_loss" in logs:
                    should_stop = self.plateau.update(
                        logs["val_loss"], train_logs.get("lr", 0.0))
                    self.scheme.lr_scale = self.plateau.scale
                    logs["lr_scale"] = self.plateau.scale
                    if should_stop:
                        if self.is_main:
                            print("STOP: lr fell below stopping_lr",
                                  flush=True)
                        self.epoch += 1
                        self.checkpoint(state)
                        history.append(logs)
                        if self.is_main:
                            self.append_history(logs)
                        break

            self.epoch += 1
            self.checkpoint(state)
            history.append(logs)
            if self.is_main:
                self.append_history(logs)
                msg = ", ".join(f"{k}={v:.5g}" if isinstance(v, float) else
                                f"{k}={v}" for k, v in logs.items())
                print(f"[epoch {self.epoch}] {msg}", flush=True)
        return {"state": state, "history": history}

    # ------------------------------------------------------------------
    # artifacts
    # ------------------------------------------------------------------
    def update_monitor(self, logs: Dict, state: Dict) -> None:
        monitor = getattr(self.cfg, "monitor", "val_loss")
        if monitor in logs:
            v = logs[monitor]
            if v < self.monitor_best:
                if self.is_main:
                    print(f"MONITOR BEST: {monitor} improved "
                          f"{self.monitor_best:0.5f} -> {v:0.5f}", flush=True)
                self.monitor_best = v
                self.monitor_best_epoch = logs["epoch"]
                # conditional best-model saving (reference SaveModel mixin's
                # eval'd save_model_condition, training_mixins.py:60-103)
                if self.is_main and eval_condition(
                        getattr(self.cfg, "save_model_condition", None),
                        logs):
                    self.ckpt.save_best(state["params"])
            logs[f"best_{monitor}"] = self.monitor_best

    def checkpoint(self, state: Dict) -> None:
        if not self.is_main:
            return
        if getattr(self.cfg, "trial_run", False):
            return  # trial runs skip checkpoint io (training.py:292-293)
        counters = {"epoch": self.epoch, "global_step": self.global_step,
                    "monitor_best": self.monitor_best,
                    "monitor_best_epoch": self.monitor_best_epoch,
                    "recovery_tries": self.recovery_tries}
        if self.plateau is not None:
            counters["plateau"] = self.plateau.state_dict()
        self.ckpt.save(state["params"], state["opt_state"], counters,
                       epoch=self.epoch)

    def _quarantine_corrupted_history(self) -> None:
        """On resume, rename an unparseable history.yaml to `.corrupted` and
        continue with a fresh file (reference training.py:570-582) — a
        history truncated by a killed run would otherwise be carried forward
        as a permanently broken YAML document."""
        path = os.path.join(self.log_path, "history.yaml")
        if not os.path.exists(path):
            return
        try:
            with open(path) as f:
                parsed = yaml.safe_load(f)
            if parsed is None or isinstance(parsed, list):
                return
        except yaml.YAMLError:
            pass
        corrupted = path + ".corrupted"
        os.replace(path, corrupted)
        print(f"WARNING: corrupted history file moved to {corrupted}")

    def append_history(self, logs: Dict) -> None:
        path = os.path.join(self.log_path, "history.yaml")
        with open(path, "a") as f:
            yaml.safe_dump([{k: (float(v) if isinstance(v, (int, float,
                                                            np.floating))
                                 else v)
                             for k, v in logs.items()}], f)

    def save_config(self) -> None:
        os.makedirs(self.model_path, exist_ok=True)
        path = os.path.join(self.model_path, "all_config.yaml")
        cfg_dict = {k: v for k, v in vars(self.cfg).items()
                    if isinstance(v, (str, int, float, bool, list, type(None)))}
        with open(path, "w") as f:
            yaml.safe_dump(cfg_dict, f)
