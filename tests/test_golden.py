"""Golden numeric regression: frozen tiny-model outputs catch unintended
numeric drift across rounds of this continuous build.

First run generates tests/golden/*.npz (committed); later runs compare.
If a change INTENTIONALLY alters numerics (it shouldn't — the torch parity
suite pins semantics), regenerate with:  rm tests/golden/*.npz && pytest
tests/test_golden.py
"""
import functools
import os

import jax
import numpy as np
import pytest

from tests.conftest import make_synthetic_batch
from tgt_tpu.models import TGTConfig, make_model

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")

CASES = {
    "gap_attention": ("gap", "attention"),
    "gap_aggregate": ("gap", "aggregate"),
    "distance_attention": ("distance", "attention"),
    "multi_triangular": ("multi", "triangular_update"),
    "gap_axial": ("gap", "axial_attention"),
    # published geometry (SURVEY §6.2): catches head-packing/reshape drift
    # that only appears at production widths (VERDICT r2 #4)
    "flagship_distance_attention": ("distance", "attention"),
    "flagship_gap_aggregate": ("gap", "aggregate"),
}


def compute(case):
    model_name, tt = CASES[case]
    if case.startswith("flagship_"):
        cfg = TGTConfig(node_width=768, edge_width=256, num_heads=64,
                        model_height=2, triplet_heads=16, triplet_type=tt,
                        num_dist_bins=256, upto_hop=32)
    else:
        cfg = TGTConfig(node_width=32, edge_width=16, num_heads=4,
                        model_height=3, triplet_heads=2, triplet_type=tt,
                        num_dist_bins=8, upto_hop=16)
    init, apply = make_model(model_name)
    params = init(jax.random.PRNGKey(42), cfg)
    batch = make_synthetic_batch(jax.random.PRNGKey(0), b=2, n=8, seed=99)
    out = jax.jit(functools.partial(apply, cfg=cfg))(params, batch)
    if isinstance(out, tuple):
        return {f"out{i}": np.asarray(o) for i, o in enumerate(out)}
    return {"out0": np.asarray(out)}


@pytest.mark.parametrize("case", sorted(CASES))
def test_golden(case):
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    path = os.path.join(GOLDEN_DIR, f"{case}.npz")
    got = compute(case)
    if not os.path.exists(path):
        np.savez(path, **got)
        pytest.skip(f"golden file created: {path} — commit it")
    with np.load(path) as ref:
        for k in ref.files:
            np.testing.assert_allclose(
                got[k], ref[k], rtol=5e-5, atol=5e-5,
                err_msg=f"numeric drift in {case}/{k} — if intentional, "
                        f"regenerate tests/golden (see module docstring)")
