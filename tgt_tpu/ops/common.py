"""Shared primitive ops: linear, layernorm, dropout, drop-path, initializers.

These are the building blocks of the functional model layer. Parameters are
plain dicts of jnp arrays; weights use the JAX (in, out) convention (the torch
converter in models/convert.py transposes).

Initialization matches torch.nn defaults for distributional parity with the
reference (Linear: U(+-1/sqrt(fan_in)) for both w and b; Embedding: N(0,1) with
the padding row zeroed; LayerNorm: ones/zeros).
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

Params = Dict[str, jnp.ndarray]

LN_EPS = 1e-5  # torch.nn.LayerNorm default


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def linear_init(rng: jax.Array, in_dim: int, out_dim: int) -> Params:
    kw, kb = jax.random.split(rng)
    bound = in_dim ** -0.5
    return {
        "w": jax.random.uniform(kw, (in_dim, out_dim), jnp.float32, -bound, bound),
        "b": jax.random.uniform(kb, (out_dim,), jnp.float32, -bound, bound),
    }


def layernorm_init(dim: int) -> Params:
    return {"scale": jnp.ones((dim,), jnp.float32),
            "bias": jnp.zeros((dim,), jnp.float32)}


def embedding_init(rng: jax.Array, vocab: int, dim: int,
                   padding_idx: Optional[int] = None) -> Params:
    w = jax.random.normal(rng, (vocab, dim), jnp.float32)
    if padding_idx is not None:
        w = w.at[padding_idx].set(0.0)
    return {"w": w}


# ---------------------------------------------------------------------------
# apply
# ---------------------------------------------------------------------------

def linear(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    return jnp.dot(x, p["w"].astype(x.dtype)) + p["b"].astype(x.dtype)


def layernorm(p: Params, x: jnp.ndarray, eps: float = LN_EPS) -> jnp.ndarray:
    # Normalize in f32 for numerical stability regardless of compute dtype.
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"] + p["bias"]
    return y.astype(x.dtype)


def embedding(p: Params, ids: jnp.ndarray) -> jnp.ndarray:
    # mode='clip': out-of-vocab ids clamp to the last row instead of XLA's
    # NaN-fill, matching TPU-friendly static gather semantics.
    return jnp.take(p["w"], ids, axis=0, mode="clip")


def dropout(rng: Optional[jax.Array], x: jnp.ndarray, rate: float,
            deterministic: bool) -> jnp.ndarray:
    """Inverted dropout (torch semantics: scale by 1/keep at train time)."""
    if deterministic or rate == 0.0:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), jnp.zeros_like(x))


def drop_path(rng: Optional[jax.Array], x: jnp.ndarray, rate,
              deterministic: bool) -> jnp.ndarray:
    """Per-sample stochastic depth (reference: lib/tgt/layers/layers.py:163-174).

    ``rate`` may be a python float or a traced scalar (scanned per-layer ramp).
    """
    if deterministic:
        return x
    if isinstance(rate, float) and rate == 0.0:
        return x
    keep_prob = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    u = jax.random.uniform(rng, shape, dtype=jnp.float32)
    keep = (u < keep_prob).astype(x.dtype)
    return x / jnp.asarray(keep_prob, x.dtype) * keep


def siglin(gates: jnp.ndarray, lins: jnp.ndarray) -> jnp.ndarray:
    """sigmoid(gates) * lins (reference: lib/tgt/layers/triplet.py:130-132)."""
    return jax.nn.sigmoid(gates) * lins
