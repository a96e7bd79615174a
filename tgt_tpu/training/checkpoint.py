"""Checkpointing: params / optimizer state / training counters.

Capability-parity with the reference checkpointing (lib/training/training.py
:284-366, utils.py:33-45): per-epoch checkpoint of training state + model +
optimizer (tensors gathered to host), optional per-epoch backups, best-model
snapshots, resume-each-part-best-effort, and non-strict pretrained-weight
loading (missing/unexpected key report) used for stage N -> N+1 transfer.

Format: a single ``.npz`` per checkpoint part, leaves flattened with
'/'-joined pytree paths; restores into a structure template. Self-contained
(no orbax version coupling), atomic via temp-file rename, works for arbitrary
params/opt-state pytrees.
"""
from __future__ import annotations

import json
import os
import tempfile
from typing import Any, Dict, List, Optional, Tuple

import jax
import numpy as np


def _flatten(tree: Any) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(_path_str(p) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def _path_str(p) -> str:
    if hasattr(p, "key"):
        return str(p.key)
    if hasattr(p, "idx"):
        return str(p.idx)
    return str(p)


def save_pytree(tree: Any, path: str) -> None:
    """Atomically save a pytree of arrays to ``path`` (.npz)."""
    flat = _flatten(tree)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(os.path.abspath(path)),
                               suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **flat)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def load_pytree(template: Any, path: str, strict: bool = True
                ) -> Tuple[Any, List[str], List[str]]:
    """Load arrays saved by ``save_pytree`` into the structure of ``template``.

    With ``strict=False``, missing keys keep the template's value and
    unexpected keys are ignored; returns (tree, missing, unexpected) —
    the reference's non-strict ``load_state_dict`` semantics
    (training.py:358-366).
    """
    with np.load(path) as npz:
        saved = {k: npz[k] for k in npz.files}
    paths, treedef = jax.tree_util.tree_flatten_with_path(template)
    keys = ["/".join(_path_str(p) for p in path) for path, _ in paths]
    leaves = []
    missing = []
    for key, (_, tmpl_leaf) in zip(keys, paths):
        if key in saved:
            arr = saved.pop(key)
            if strict and tuple(arr.shape) != tuple(np.shape(tmpl_leaf)):
                raise ValueError(
                    f"shape mismatch for {key}: saved {arr.shape} vs "
                    f"template {np.shape(tmpl_leaf)}")
            if tuple(arr.shape) != tuple(np.shape(tmpl_leaf)):
                missing.append(key + " (shape mismatch, kept template)")
                leaves.append(tmpl_leaf)
            else:
                leaves.append(arr)
        else:
            if strict:
                raise KeyError(f"missing key in checkpoint: {key}")
            missing.append(key)
            leaves.append(tmpl_leaf)
    unexpected = list(saved.keys())
    if strict and unexpected:
        raise KeyError(f"unexpected keys in checkpoint: {unexpected[:5]}...")
    tree = jax.tree_util.tree_unflatten(treedef, leaves)
    return tree, missing, unexpected


class CheckpointManager:
    """Directory layout (mirrors the reference, training.py:284-320):

    <model_path>/checkpoint/{model,optimizer,training_state}.npz
    <model_path>/all_checkpoints/epoch_{E}/...   (optional backups)
    <model_path>/best/model.npz                  (best-metric snapshot)
    """

    def __init__(self, model_path: str, save_backups: bool = False):
        self.model_path = model_path
        self.ckpt_dir = os.path.join(model_path, "checkpoint")
        self.backup_dir = os.path.join(model_path, "all_checkpoints")
        self.best_dir = os.path.join(model_path, "best")
        self.save_backups = save_backups

    # -- save -------------------------------------------------------------
    def save(self, params: Any, opt_state: Any, counters: Dict[str, Any],
             epoch: Optional[int] = None) -> None:
        os.makedirs(self.ckpt_dir, exist_ok=True)
        save_pytree(params, os.path.join(self.ckpt_dir, "model.npz"))
        save_pytree(opt_state, os.path.join(self.ckpt_dir, "optimizer.npz"))
        # counters atomically too — a crash mid-write must not leave a fresh
        # model.npz next to a truncated training_state.json
        state_path = os.path.join(self.ckpt_dir, "training_state.json")
        fd, tmp = tempfile.mkstemp(dir=self.ckpt_dir, suffix=".tmp")
        try:
            with os.fdopen(fd, "w") as f:
                json.dump(counters, f)
            os.replace(tmp, state_path)
        except BaseException:
            if os.path.exists(tmp):
                os.unlink(tmp)
            raise
        if self.save_backups and epoch is not None:
            bdir = os.path.join(self.backup_dir, f"epoch_{epoch}")
            os.makedirs(bdir, exist_ok=True)
            save_pytree(params, os.path.join(bdir, "model.npz"))

    def save_best(self, params: Any) -> None:
        os.makedirs(self.best_dir, exist_ok=True)
        save_pytree(params, os.path.join(self.best_dir, "model.npz"))

    # -- load -------------------------------------------------------------
    def has_checkpoint(self) -> bool:
        return os.path.exists(os.path.join(self.ckpt_dir, "model.npz"))

    def load(self, params_template: Any, opt_template: Any
             ) -> Tuple[Any, Any, Dict[str, Any]]:
        params, _, _ = load_pytree(params_template,
                                   os.path.join(self.ckpt_dir, "model.npz"))
        opt_state, _, _ = load_pytree(
            opt_template, os.path.join(self.ckpt_dir, "optimizer.npz"))
        with open(os.path.join(self.ckpt_dir, "training_state.json")) as f:
            counters = json.load(f)
        return params, opt_state, counters

    def load_model_only(self, params_template: Any, which: str = "checkpoint"):
        path = {"checkpoint": self.ckpt_dir, "best": self.best_dir}[which]
        params, _, _ = load_pytree(params_template,
                                   os.path.join(path, "model.npz"))
        return params


def load_pretrained(params_template: Any, weights_file: str
                    ) -> Tuple[Any, List[str], List[str]]:
    """Non-strict pretrained load for stage transfer (head add/drop)."""
    return load_pytree(params_template, weights_file, strict=False)
