"""Torch checkpoint -> tgt_tpu parameter conversion.

Maps the reference's ``state_dict`` naming (lib/models/pcqm/*.py,
lib/tgt/layers/*.py) onto this framework's params pytree. Used for
per-layer activation parity tests against the released checkpoints
(BASELINE.md) and for importing pretrained weights.

The input is a plain ``{name: np.ndarray}`` dict (call
``{k: v.numpy() for k, v in torch_state_dict.items()}`` upstream — this
module does not import torch).

Conventions:
- Linear:    ours ``{'w','b'}`` with w = torch ``weight``.T
- LayerNorm: ours ``{'scale','bias'}`` = torch ``weight``/``bias``
- Embedding: ours ``{'w'}`` = torch ``weight``
- encoder inner layers are stacked on a leading axis under ``encoder.layers``;
  the torch side enumerates ``encoder.TGT_layers.{i}``.
"""
from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np
import jax.numpy as jnp
import jax.tree_util

from tgt_tpu.models.model_config import TGTConfig

Array = np.ndarray

# my m3d_embed key -> torch submodule path inside input_embed.m3d_embed
_M3D_GAUSSIAN_MAP = {
    "means": ("gbf.means", "embedding"),
    "stds": ("gbf.stds", "embedding"),
    "mul": ("gbf.mul", "embedding"),
    "bias": ("gbf.bias", "embedding"),
    "proj1": ("gbf_proj.layer1", "linear"),
    "proj2": ("gbf_proj.layer2", "linear"),
}


def _get(state: Mapping[str, Array], key: str) -> Array:
    if key not in state:
        raise KeyError(f"missing key in torch state_dict: {key}")
    return np.asarray(state[key])


def _linear(state, prefix) -> Dict[str, Array]:
    return {"w": _get(state, prefix + ".weight").T.copy(),
            "b": _get(state, prefix + ".bias")}


def _layernorm(state, prefix) -> Dict[str, Array]:
    return {"scale": _get(state, prefix + ".weight"),
            "bias": _get(state, prefix + ".bias")}


def _embedding(state, prefix) -> Dict[str, Array]:
    return {"w": _get(state, prefix + ".weight")}


def _convert_module(state: Mapping[str, Array], prefix: str,
                    template: Dict[str, Any]) -> Dict[str, Any]:
    """Structurally convert a dict-of-dicts module following the template."""
    out: Dict[str, Any] = {}
    for name, sub in template.items():
        tkey = f"{prefix}.{name}" if prefix else name
        if isinstance(sub, dict):
            keys = set(sub.keys())
            if keys == {"w", "b"}:
                out[name] = _linear(state, tkey)
            elif keys == {"scale", "bias"}:
                out[name] = _layernorm(state, tkey)
            elif keys == {"w"}:
                out[name] = _embedding(state, tkey)
            else:
                out[name] = _convert_module(state, tkey, sub)
        else:
            # raw buffer (e.g. fourier angular_freqs)
            out[name] = _get(state, tkey)
    return out


def _convert_m3d(state: Mapping[str, Array], prefix: str,
                 template: Dict[str, Any]) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    if "angular_freqs" in template:  # fourier
        out["angular_freqs"] = _get(state, prefix + ".angular_freqs")
        out["proj"] = _linear(state, prefix + ".proj")
        return out
    for name in template:
        tsub, kind = _M3D_GAUSSIAN_MAP[name]
        tkey = f"{prefix}.{tsub}"
        out[name] = _linear(state, tkey) if kind == "linear" else _embedding(state, tkey)
    return out


def _convert_layer(state: Mapping[str, Array], prefix: str,
                   template: Dict[str, Any]) -> Dict[str, Any]:
    return _convert_module(state, prefix, template)


def convert_torch_state_dict(state: Mapping[str, Array],
                             template_params: Dict[str, Any],
                             cfg: TGTConfig) -> Dict[str, Any]:
    """Convert a reference state_dict into this framework's params layout.

    ``template_params`` is a params pytree from the matching ``*_init`` (its
    values are ignored; only the structure is used).
    """
    out: Dict[str, Any] = {}
    for top, sub in template_params.items():
        if top == "input_embed":
            emb: Dict[str, Any] = {}
            for name, s in sub.items():
                if name == "m3d_embed":
                    emb[name] = _convert_m3d(state, "input_embed.m3d_embed", s)
                else:
                    emb[name] = _embedding(state, f"input_embed.{name}")
            out[top] = emb
        elif top == "encoder":
            enc: Dict[str, Any] = {}
            h = cfg.model_height
            if "indiv" in sub:
                # per-layer IndivConfig layout: one (possibly heterogeneous)
                # params dict per reference TGT_layers.{i}
                enc["indiv"] = tuple(
                    _convert_layer(state, f"encoder.TGT_layers.{i}",
                                   sub["indiv"][i])
                    for i in range(h))
                out[top] = enc
                continue
            if "layers" in sub:
                # unstack template to get one inner layer's structure
                one = jax.tree_util.tree_map(lambda x: x[0], sub["layers"])
                per_layer = [
                    _convert_layer(state, f"encoder.TGT_layers.{i}", one)
                    for i in range(h - 1)
                ]
                enc["layers"] = jax.tree_util.tree_map(
                    lambda *xs: np.stack(xs), *per_layer)
            enc["last"] = _convert_layer(
                state, f"encoder.TGT_layers.{h - 1}", sub["last"])
            out[top] = enc
        elif isinstance(sub, dict) and set(sub) == {"w", "b"}:
            out[top] = _linear(state, top)
        elif isinstance(sub, dict) and set(sub) == {"scale", "bias"}:
            out[top] = _layernorm(state, top)
        else:
            raise ValueError(f"unrecognized top-level params entry: {top}")
    return jax.tree_util.tree_map(jnp.asarray, out)


def main():  # pragma: no cover - thin CLI
    """Convert a released reference checkpoint to tgt_tpu format.

    Usage:
      python -m tgt_tpu.models.convert <model_state.pt> <out.npz> \
          --config <config.yaml> [--model distance|gap|multi]

    e.g. after `huggingface-cli download shamim-hussain/tgt` (reference
    README.md:68-70), convert models/pcqm/tgt_at_200m/.../model_state.pt and
    point `pretrained_weights_file` at the .npz.
    """
    import argparse

    import jax

    from tgt_tpu.core.config import load_yaml
    from tgt_tpu.models.heads import make_model
    from tgt_tpu.schemes import get_scheme
    from tgt_tpu.training.checkpoint import save_pytree

    ap = argparse.ArgumentParser()
    ap.add_argument("torch_checkpoint")
    ap.add_argument("out_npz")
    ap.add_argument("--config", required=True,
                    help="scheme config yaml (determines model shape)")
    ap.add_argument("--model", default=None,
                    help="override model kind (distance|gap|multi)")
    args = ap.parse_args()

    import torch
    state = torch.load(args.torch_checkpoint, map_location="cpu")
    state = {k: v.numpy() for k, v in state.items()}

    cfg_dict = load_yaml(args.config)
    scheme = get_scheme(cfg_dict["scheme"])(cfg_dict)
    model_kind = args.model or scheme.MODEL
    init, _ = make_model(model_kind)
    template = init(jax.random.PRNGKey(0), scheme.model_cfg)
    params = convert_torch_state_dict(state, template, scheme.model_cfg)
    save_pytree(params, args.out_npz)
    n = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"converted {n/1e6:.1f}M params -> {args.out_npz}")


if __name__ == "__main__":  # pragma: no cover
    main()
