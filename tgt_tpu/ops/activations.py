"""Activation registry, including the GLU family.

Reference behavior (lib/tgt/layers/activations.py:4-25): GLU variants split the
last axis in half, gate first half, multiply the second half; non-GLU names
resolve to the corresponding torch.nn.functional activation. Here non-GLU names
resolve via jax.nn. `act_mul` is the width multiplier the FFN applies to its
first projection (2 for GLU variants, else 1).
"""
from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp


def _geglu(x: jnp.ndarray) -> jnp.ndarray:
    g, e = jnp.split(x, 2, axis=-1)
    return e * jax.nn.gelu(g, approximate=False)


def _glu(x: jnp.ndarray) -> jnp.ndarray:
    g, e = jnp.split(x, 2, axis=-1)
    return e * jax.nn.sigmoid(g)


def _swiglu(x: jnp.ndarray) -> jnp.ndarray:
    g, e = jnp.split(x, 2, axis=-1)
    return e * jax.nn.sigmoid(g) * g


_GLU = {"geglu": _geglu, "glu": _glu, "swiglu": _swiglu}

# torch.nn.functional name -> jax equivalent where the names differ. `gelu`
# must be the exact (erf) form: torch F.gelu defaults to exact, jax.nn.gelu
# defaults to tanh approximation.
_PLAIN = {
    "gelu": lambda x: jax.nn.gelu(x, approximate=False),
    "relu": jax.nn.relu,
    "silu": jax.nn.silu,
    "elu": jax.nn.elu,
    "leaky_relu": jax.nn.leaky_relu,
    "sigmoid": jax.nn.sigmoid,
    "tanh": jnp.tanh,
    "softplus": jax.nn.softplus,
    "mish": lambda x: x * jnp.tanh(jax.nn.softplus(x)),
    "hardswish": jax.nn.hard_swish,
}


def get_activation(name: str) -> Tuple[Callable[[jnp.ndarray], jnp.ndarray], int]:
    """Return (fn, act_mul) for an activation name."""
    if name in _GLU:
        return _GLU[name], 2
    if name in _PLAIN:
        return _PLAIN[name], 1
    fn = getattr(jax.nn, name, None)
    if fn is None:
        raise ValueError(f"unknown activation: {name}")
    return fn, 1
