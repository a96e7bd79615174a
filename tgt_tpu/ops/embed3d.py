"""3D distance embeddings: Gaussian-basis (Graphormer-3D style) and Fourier.

Reference semantics:
- Gaussian3DEmbed (lib/models/pcqm/layers.py:112-157): per atom-pair-type
  affine ``mul * d + bias`` (mul/bias embedded per type id and summed over the
  two endpoints), 128 Gaussian basis functions with learned means/stds
  (std = |std| + 1e-2, the normal pdf uses pi ~= 3.14159 — the reference's
  literal constant, kept for checkpoint parity), then a 2-layer GELU MLP to
  edge_width (NonLinear, layers.py:160-173).
- Fourier3DEmbed (layers.py:86-109): sin/cos at log-spaced wavelengths in
  [2*0.01, 2*20] Angstrom followed by a linear projection.
"""
from __future__ import annotations

import math
from typing import Dict

import jax
import jax.numpy as jnp

from tgt_tpu.ops.common import Params, embedding, linear, linear_init

_REF_PI = 3.14159  # the reference's literal (layers.py:132); not math.pi


def gaussian_basis(x: jnp.ndarray, mean: jnp.ndarray, std: jnp.ndarray) -> jnp.ndarray:
    a = (2.0 * _REF_PI) ** 0.5
    return jnp.exp(-0.5 * jnp.square((x - mean) / std)) / (a * std)


def gaussian3d_init(rng: jax.Array, edge_width: int, num_edge_types: int,
                    num_kernels: int = 128) -> Dict[str, Params]:
    ks = jax.random.split(rng, 4)
    return {
        "means": {"w": jax.random.uniform(ks[0], (1, num_kernels), jnp.float32, 0.0, 3.0)},
        "stds": {"w": jax.random.uniform(ks[1], (1, num_kernels), jnp.float32, 0.0, 3.0)},
        # torch init.constant_ overwrites the padding row too (layers.py:147-148),
        # so mul row 0 is 1.0, not 0 — kept for checkpoint parity.
        "mul": {"w": jnp.ones((num_edge_types, 1), jnp.float32)},
        "bias": {"w": jnp.zeros((num_edge_types, 1), jnp.float32)},
        "proj1": linear_init(ks[2], num_kernels, num_kernels),
        "proj2": linear_init(ks[3], num_kernels, edge_width),
    }


def gaussian3d_embed(p: Dict[str, Params], dist: jnp.ndarray,
                     node_type_edge: jnp.ndarray) -> jnp.ndarray:
    """dist: (b, N, N); node_type_edge: int (b, N, N, 2) -> (b, N, N, edge_width)."""
    mul = embedding(p["mul"], node_type_edge).sum(axis=-2)    # (b,N,N,1)
    bias = embedding(p["bias"], node_type_edge).sum(axis=-2)  # (b,N,N,1)
    x = mul * dist[..., None] + bias                           # (b,N,N,1)
    mean = p["means"]["w"].reshape(-1).astype(jnp.float32)
    std = jnp.abs(p["stds"]["w"].reshape(-1).astype(jnp.float32)) + 1e-2
    feat = gaussian_basis(x.astype(jnp.float32), mean, std)    # (b,N,N,K)
    feat = feat.astype(dist.dtype)
    y = jax.nn.gelu(linear(p["proj1"], feat), approximate=False)
    return linear(p["proj2"], y)


def fourier3d_init(rng: jax.Array, edge_width: int, num_kernels: int = 128,
                   min_dist: float = 0.01, max_dist: float = 20.0) -> Dict[str, Params]:
    assert num_kernels % 2 == 0
    wave_lengths = jnp.exp(jnp.linspace(math.log(2 * min_dist),
                                        math.log(2 * max_dist),
                                        num_kernels // 2))
    return {
        "angular_freqs": 2.0 * math.pi / wave_lengths,  # buffer, not trained
        "proj": linear_init(rng, num_kernels, edge_width),
    }


def fourier3d_embed(p: Dict[str, Params], dist: jnp.ndarray) -> jnp.ndarray:
    phase = dist[..., None] * p["angular_freqs"].astype(dist.dtype)
    sinusoids = jnp.concatenate([jnp.sin(phase), jnp.cos(phase)], axis=-1)
    return linear(p["proj"], sinusoids)
