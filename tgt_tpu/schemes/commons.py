"""Shared task math for the PCQM schemes, in JAX.

Semantics match the reference (lib/training_schemes/pcqm/commons.py:6-82):
- ``coords2dist``: pairwise Euclidean distances.
- ``add_coords_noise``: smooth structural noise — Gaussian noise propagated
  through softmax(-D/tau) so nearby atoms move together.
- ``discrete_dist``: bin = clamp(floor(d * (B-1)/range), 0, B-1).
- ``discrete_dist_loss``: masked cross-entropy over distance bins, reduce to
  scalar or per-graph.
- ``bins2dist``: (bin [+0.5]) * range/(B-1), symmetrized d + d^T, zero diag.

All are pure jnp functions intended to run inside the jitted train/eval steps
(the reference computes these on GPU in preprocess_batch; here they fuse into
the step program — no separate host pass, no extra HBM round trip).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def coords2dist(coords: jnp.ndarray) -> jnp.ndarray:
    """(..., N, 3) -> (..., N, N) pairwise distances."""
    diff = coords[..., :, None, :] - coords[..., None, :, :]
    return jnp.sqrt(jnp.sum(jnp.square(diff), axis=-1) + 1e-24)


def add_coords_noise(rng: jax.Array, coords: jnp.ndarray,
                     edge_mask: jnp.ndarray, noise_level: float,
                     noise_smoothing: float) -> jnp.ndarray:
    """Smooth coordinate noise (reference commons.py:10-16)."""
    noise = jax.random.normal(rng, coords.shape, coords.dtype) * noise_level
    dist = coords2dist(coords) + (1.0 - edge_mask.astype(coords.dtype)) * 1e9
    smooth = jax.nn.softmax(-dist / noise_smoothing, axis=-1)
    return coords + smooth @ noise


def discrete_dist(dist: jnp.ndarray, num_bins: int,
                  range_bins: float) -> jnp.ndarray:
    d = dist * ((num_bins - 1) / range_bins)
    return jnp.clip(d.astype(jnp.int32), 0, num_bins - 1)


def discrete_dist_loss(dist_logits: jnp.ndarray, dist_targ: jnp.ndarray,
                       mask: jnp.ndarray, num_bins: int, range_bins: float,
                       reduce: bool = True) -> jnp.ndarray:
    """Masked xent over bins (reference commons.py:25-48).

    dist_logits (b, N, N, B), dist_targ float distances (b, N, N),
    mask (b, N, N). reduce=True -> scalar; else per-graph (b,).
    """
    b = dist_logits.shape[0]
    targ = discrete_dist(dist_targ, num_bins, range_bins)
    logp = jax.nn.log_softmax(dist_logits.astype(jnp.float32), axis=-1)
    xent = -jnp.take_along_axis(logp, targ[..., None], axis=-1)[..., 0]
    xent = xent.reshape(b, -1)
    m = mask.astype(xent.dtype).reshape(b, -1)
    if reduce:
        return (xent * m).sum() / (m.sum() + 1e-9)
    return (xent * m).sum(axis=1) / (m.sum(axis=1) + 1e-9)


def bins2dist(bins: jnp.ndarray, num_bins: int, range_bins: float,
              shift_half: bool = True, zero_diag: bool = True) -> jnp.ndarray:
    """Packed upper-tri bins -> symmetric distance matrix
    (reference commons.py:72-82). bins: (..., N, N) float with the strict
    upper triangle holding bin ids."""
    bin_size = range_bins / (num_bins - 1)
    d = bins.astype(jnp.float32)
    if shift_half:
        d = d + 0.5
    d = d * bin_size
    d = d + jnp.swapaxes(d, -2, -1)
    if zero_diag:
        n = d.shape[-1]
        d = d * (1.0 - jnp.eye(n, dtype=d.dtype))
    return d


def masked_l1(pred: jnp.ndarray, target: jnp.ndarray,
              sample_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Mean |pred - target| over valid samples (L1 gap loss)."""
    err = jnp.abs(pred - target)
    if sample_mask is None:
        return err.mean()
    m = sample_mask.astype(err.dtype)
    return (err * m).sum() / (m.sum() + 1e-9)
