"""CLI dispatcher: config parsing + command execution.

Grammar matches the reference (lib/training/execute.py:33-52):

    script [config.yaml | model_dir] ['key: yamlvalue'] ...

- a model dir stands for its saved ``config.yaml``;
- later inline YAML snippets override the file;
- ``scheme: pcqm.<name>`` selects the task scheme.

Commands (reference execute.py:25-29):
    train    -> Trainer.fit (resume-aware; gap_pred trims instead of training)
    predict  -> scheme predictions saved under <save_path>/predictions
    evaluate -> metrics for predict_on splits -> predictions/results.yaml

Multi-host: no process spawning — run the same command on every host with
jax.distributed env (JAX_COORDINATOR / process count), or single-host where
GSPMD spans local devices automatically (SURVEY.md §5.8).
"""
from __future__ import annotations

import os
import sys
from typing import Any, Dict, List, Optional

import numpy as np
import yaml

from tgt_tpu.core.config import load_yaml, parse_cli_overrides, save_yaml
from tgt_tpu.schemes import get_scheme

COMMANDS = ("train", "predict", "evaluate")
DEFAULT_CONFIG_FILE = "config.yaml"


def configs_from_args(args: List[str]) -> Dict[str, Any]:
    config: Dict[str, Any] = {}
    if args:
        args = list(args)
        if os.path.isdir(args[0]):
            config.update(load_yaml(os.path.join(args[0],
                                                 DEFAULT_CONFIG_FILE)))
            args = args[1:]
        elif os.path.exists(args[0]) or args[0] == "-":
            # regular files AND pipes/char devices (/dev/stdin, heredocs)
            path = "/dev/stdin" if args[0] == "-" else args[0]
            config.update(load_yaml(path))
            args = args[1:]
        if args:
            config.update(parse_cli_overrides(args))
    if "scheme" not in config:
        raise ValueError('"scheme" is not in config!')
    return config


def execute(command: str, config: Dict[str, Any],
            rank: Optional[int] = None,
            world_size: Optional[int] = None) -> Optional[Dict]:
    if command not in COMMANDS:
        raise ValueError(f"unknown command {command}; one of {COMMANDS}")
    scheme_cls = get_scheme(config["scheme"])
    scheme = scheme_cls(config, command=command)

    if rank is None or world_size is None:
        # multi-host rendezvous (replaces DDP spawn, SURVEY.md §5.8):
        # every host runs the same command; jax.distributed coordinates.
        from tgt_tpu.parallel.mesh import initialize_distributed
        rank, world_size = initialize_distributed(
            coordinator=getattr(scheme.cfg, "jax_coordinator", None),
            num_processes=getattr(scheme.cfg, "jax_num_processes", None),
            process_id=getattr(scheme.cfg, "jax_process_id", None))

    from tgt_tpu.training import Trainer
    trainer = Trainer(scheme, rank=rank, world_size=world_size)

    if command == "train":
        return execute_train(scheme, trainer, config)
    if command == "predict":
        return execute_predict(scheme, trainer)
    return execute_evaluate(scheme, trainer)


def execute_train(scheme, trainer, config) -> Dict:
    import jax
    if trainer.is_main:
        os.makedirs(trainer.model_path, exist_ok=True)
        # persist the user config for model-dir reruns (reference
        # training.py:255-265)
        save_yaml(config, os.path.join(trainer.model_path,
                                       DEFAULT_CONFIG_FILE))
    if scheme.NAME == "gap_pred":
        # gap_pred "training" only trims the finetuned checkpoint
        # (reference gap_pred/scheme.py:144-154)
        w = scheme.cfg.pretrained_weights_file
        out = os.path.join(trainer.ckpt.ckpt_dir, "model.npz")
        os.makedirs(trainer.ckpt.ckpt_dir, exist_ok=True)
        missing, unexpected = scheme.trim_checkpoint(w, out)
        print(f"trimmed checkpoint saved to {out}")
        print(f"missing: {missing[:6]}\nunexpected (dropped): {unexpected[:6]}")
        return {}
    result = trainer.fit()
    return result


def execute_predict(scheme, trainer) -> Dict:
    import jax
    params = _load_eval_params(scheme, trainer)
    pred_path = os.path.join(trainer.model_path, "predictions")
    if scheme.NAME == "dist_pred":
        scheme.predict_and_save(params, rank=trainer.rank,
                                world_size=trainer.world_size,
                                base_path=pred_path)
        return {}
    os.makedirs(pred_path, exist_ok=True)
    results = {}
    for split in scheme.cfg.predict_on:
        loader = scheme.test_loader(split, trainer.rank, trainer.world_size)
        preds = trainer.eval_epoch(params, loader)
        out_file = os.path.join(pred_path, f"{split}_{trainer.rank:03d}.npz")
        np.savez(out_file, **preds)
        print(f"saved {split} predictions to {out_file}")
        results[split] = preds
    if scheme.NAME in ("finetune", "gap_pred"):
        # metrics must cover the FULL split, not this rank's shard — the
        # per-rank npz artifacts above stay sharded (reference keeps
        # per-rank artifacts too) but the results.yaml numbers are global
        from tgt_tpu.parallel.mesh import gather_predictions
        gathered = {split: gather_predictions(preds, trainer.world_size)
                    for split, preds in results.items()}
        _write_results(scheme, trainer, gathered)
    return results


def execute_evaluate(scheme, trainer) -> Dict:
    from tgt_tpu.parallel.mesh import gather_predictions
    params = _load_eval_params(scheme, trainer)
    results = {}
    for split in scheme.cfg.predict_on:
        loader = scheme.test_loader(split, trainer.rank, trainer.world_size)
        preds = trainer.eval_epoch(params, loader)
        # cross-host gather so metrics cover the full split
        # (reference training.py:746-774)
        results[split] = gather_predictions(preds, trainer.world_size)
    return _write_results(scheme, trainer, results)


def _write_results(scheme, trainer, preds_by_split) -> Dict:
    pred_path = os.path.join(trainer.model_path, "predictions")
    metrics_all = {}
    for split, preds in preds_by_split.items():
        if scheme.NAME == "gap_pred":
            metrics = scheme.evaluate_predictions(
                preds, dataset_name=split, predictions_path=pred_path)
        else:
            metrics = scheme.evaluate_predictions(preds)
        metrics_all[split] = {k: float(v) for k, v in metrics.items()}
        print(f"[{split}] " + ", ".join(f"{k}={v:.6f}"
                                        for k, v in metrics_all[split].items()))
    if trainer.is_main:
        os.makedirs(pred_path, exist_ok=True)
        # results.yaml artifact (reference testing.py:152-172)
        path = os.path.join(pred_path, "results.yaml")
        existing = {}
        if os.path.exists(path):
            existing = yaml.safe_load(open(path)) or {}
        existing.update(metrics_all)
        save_yaml(existing, path)
    return metrics_all


def _load_eval_params(scheme, trainer):
    import jax
    state = trainer.init_state(jax.random.PRNGKey(0))
    if trainer.ckpt.has_checkpoint():
        params = trainer.ckpt.load_model_only(state["params"])
        print(f"loaded model from {trainer.ckpt.ckpt_dir}")
        return params
    if getattr(scheme.cfg, "pretrained_weights_file", None):
        from tgt_tpu.training.checkpoint import load_pretrained
        params, _, _ = load_pretrained(state["params"],
                                       scheme.cfg.pretrained_weights_file)
        return params
    print("WARNING: no checkpoint found; evaluating random init", flush=True)
    return state["params"]


def main(command: str) -> None:
    config = configs_from_args(sys.argv[1:])
    execute(command, config)


def _train_main() -> None:  # console_scripts entry points
    main("train")


def _predict_main() -> None:
    main("predict")


def _evaluate_main() -> None:
    main("evaluate")
