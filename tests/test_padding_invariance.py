"""Padding discipline (SURVEY.md §7.3 hard part 3): fixed bucket shapes must
not change the math. A molecule's outputs must be identical whether its batch
pads to N=12 or N=16 — masks, degree scaler, pooling denominators and losses
all have to ignore padding.

Known exception, replicated deliberately: the gated-aggregate triplet variant
leaves its out-direction softmax unmasked (reference lib/tgt/layers/
triplet.py:63-64), so padded rows leak into valid outputs there exactly as in
the reference — asserted as such.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.conftest import make_synthetic_batch
from tgt_tpu.data.collate import repad_to_bucket
from tgt_tpu.models import TGTConfig, make_model


def make_cfg(tt):
    return TGTConfig(node_width=32, edge_width=16, num_heads=4,
                     model_height=2, triplet_heads=2, triplet_type=tt,
                     num_dist_bins=8)


def two_paddings(rng):
    batch = make_synthetic_batch(rng, b=2, n=10, seed=11)
    batch = {k: np.asarray(v) for k, v in batch.items()}
    bigger = repad_to_bucket(batch, 16)
    # edge_mask must be rebuilt for the larger padding
    nm = bigger["node_mask"]
    bigger["edge_mask"] = nm[:, :, None] * nm[:, None, :]
    return batch, bigger


@pytest.mark.parametrize("tt", ["attention", "attention_ungated",
                                "aggregate_ungated", "triangular_update",
                                "axial_attention"])
def test_gap_output_padding_invariant(rng, tt):
    cfg = make_cfg(tt)
    init, apply = make_model("gap")
    params = init(rng, cfg)
    small, big = two_paddings(rng)
    f = jax.jit(functools.partial(apply, cfg=cfg))
    out_small = np.asarray(f(params, small))
    out_big = np.asarray(f(params, big))
    np.testing.assert_allclose(out_big, out_small, rtol=2e-4, atol=2e-4)


def test_distance_logits_padding_invariant_at_valid_positions(rng):
    cfg = make_cfg("attention").replace(node_ended=False, edge_ended=True)
    init, apply = make_model("distance")
    params = init(rng, cfg)
    small, big = two_paddings(rng)
    f = jax.jit(functools.partial(apply, cfg=cfg))
    n = small["node_mask"].shape[1]
    out_small = np.asarray(f(params, small))[:, :n, :n]
    out_big = np.asarray(f(params, big))[:, :n, :n]
    np.testing.assert_allclose(out_big, out_small, rtol=2e-4, atol=2e-4)


def test_gated_aggregate_leaks_padding_like_reference(rng):
    """Documents the reference quirk: the gated aggregate out-direction is
    unmasked, so padding DOES change outputs (same as torch)."""
    cfg = make_cfg("aggregate")
    init, apply = make_model("gap")
    params = init(rng, cfg)
    small, big = two_paddings(rng)
    f = jax.jit(functools.partial(apply, cfg=cfg))
    out_small = np.asarray(f(params, small))
    out_big = np.asarray(f(params, big))
    assert not np.allclose(out_big, out_small, rtol=1e-5, atol=1e-5)
