"""Per-device memory scaling of the pair axis (VERDICT r4 item 5).

The pair axis's job is fitting graphs that don't fit one chip: the
(b, N, N, w) edge state i-row-shards over 'pair', so per-device activation
(temp) memory must drop ~1/P. This pins that claim with XLA's compiled
per-device memory accounting (`compiled.memory_analysis()`) on the virtual
mesh, using the SAME sharding specs the production Trainer applies
(parallel/mesh.spec_for_array via benchmarks/pair_memory.py).
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from benchmarks.pair_memory import build_step, compile_sharded  # noqa: E402


def _temp_bytes(num_pair: int) -> int:
    import jax
    from jax.sharding import Mesh

    from tgt_tpu.models import TGTConfig, make_model
    from tgt_tpu.parallel.mesh import DATA_AXIS, PAIR_AXIS

    # edge-dominant geometry, small enough for test time: N=64 pair state
    # (2, 64, 64, 64) with O(N^3) triplet interactions, scan+remat like
    # production
    cfg = TGTConfig(node_width=64, edge_width=64, num_heads=8,
                    model_height=2, triplet_heads=8,
                    triplet_type="attention", num_dist_bins=32,
                    compute_dtype="bfloat16", use_scan=True, remat=True,
                    node_ended=False, edge_ended=True)
    init, _ = make_model("distance")
    params_shapes = jax.eval_shape(lambda: init(jax.random.PRNGKey(0), cfg))
    step = build_step(cfg)
    b, n = 2, 64
    feed = {
        "node_features": jax.ShapeDtypeStruct((b, n, 9), np.int32),
        "distance_matrix": jax.ShapeDtypeStruct((b, n, n), np.int32),
        "feature_matrix": jax.ShapeDtypeStruct((b, n, n, 3), np.int32),
        "node_mask": jax.ShapeDtypeStruct((b, n), np.float32),
        "edge_mask": jax.ShapeDtypeStruct((b, n, n), np.float32),
        "dist_input": jax.ShapeDtypeStruct((b, n, n), np.float32),
    }
    mesh = Mesh(np.asarray(jax.devices()[:num_pair]).reshape(1, num_pair),
                (DATA_AXIS, PAIR_AXIS))
    compiled = compile_sharded(step, params_shapes, feed, mesh, num_pair)
    return compiled.memory_analysis().temp_size_in_bytes


def test_pair_axis_divides_per_device_activation_memory():
    t1 = _temp_bytes(1)
    t4 = _temp_bytes(4)
    ratio = t4 / t1
    # ideal is 0.25; allow generous headroom for replicated node-state and
    # boundary buffers, but demand REAL scaling (not just a constant shave)
    assert ratio < 0.45, (
        f"pair=4 per-device temp memory {t4 / 2**20:.1f} MB is "
        f"{ratio:.2f}x pair=1's {t1 / 2**20:.1f} MB — edge state is not "
        "sharding over the pair axis")
