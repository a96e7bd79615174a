"""Pre-LN feed-forward block with GLU-family activations.

Reference: lib/tgt/layers/layers.py:134-160 — LN -> W1 (width*mult*act_mul)
-> activation -> dropout -> W2. ``inner_dim = round(width * multiplier)``.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from tgt_tpu.ops.activations import get_activation
from tgt_tpu.ops.common import (Params, dropout, layernorm, layernorm_init,
                                linear, linear_init)


def ffn_init(rng: jax.Array, width: int, multiplier: float = 1.0,
             activation: str = "gelu") -> Dict[str, Params]:
    _, act_mul = get_activation(activation)
    inner = round(width * multiplier)
    k1, k2 = jax.random.split(rng)
    return {
        "ffn_ln": layernorm_init(width),
        "lin_W1": linear_init(k1, width, inner * act_mul),
        "lin_W2": linear_init(k2, inner, width),
    }


def ffn(p: Dict[str, Params], x: jnp.ndarray, *, activation: str = "gelu",
        act_dropout: float = 0.0, deterministic: bool = True,
        rng: Optional[jax.Array] = None) -> jnp.ndarray:
    act_fn, _ = get_activation(activation)
    y = layernorm(p["ffn_ln"], x)
    y = act_fn(linear(p["lin_W1"], y))
    y = dropout(rng, y, act_dropout, deterministic)
    return linear(p["lin_W2"], y)
