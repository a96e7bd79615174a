"""Model-level tests: shapes, determinism, scan-vs-unrolled equivalence,
layer_multiplier weight sharing, gradients."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.conftest import make_synthetic_batch
from tgt_tpu.models import TGTConfig, make_model

CFG = TGTConfig(node_width=32, edge_width=16, num_heads=4, model_height=3,
                triplet_heads=4, triplet_type="attention", num_dist_bins=8)


def jit_apply(apply, cfg, **kw):
    return jax.jit(functools.partial(apply, cfg=cfg, **kw))


class TestModels:
    @pytest.mark.parametrize("name,outshape", [
        ("distance", (2, 8, 8, 8)), ("gap", (2,)),
    ])
    def test_shapes(self, rng, name, outshape):
        batch = make_synthetic_batch(rng)
        init, apply = make_model(name)
        params = init(rng, CFG)
        out = jit_apply(apply, CFG)(params, batch)
        assert out.shape == outshape
        assert np.all(np.isfinite(np.asarray(out)))

    def test_multi_shapes(self, rng):
        batch = make_synthetic_batch(rng)
        init, apply = make_model("multi")
        params = init(rng, CFG)
        gap, dist = jit_apply(apply, CFG)(params, batch)
        assert gap.shape == (2,)
        assert dist.shape == (2, 8, 8, 8)

    def test_scan_matches_unrolled(self, rng):
        batch = make_synthetic_batch(rng)
        init, apply = make_model("gap")
        params = init(rng, CFG)
        out_scan = jit_apply(apply, CFG)(params, batch)
        cfg2 = CFG.replace(use_scan=False)
        out_unroll = jit_apply(apply, cfg2)(params, batch)
        np.testing.assert_allclose(np.asarray(out_scan),
                                   np.asarray(out_unroll), rtol=1e-5, atol=1e-5)

    def test_remat_matches(self, rng):
        batch = make_synthetic_batch(rng)
        init, apply = make_model("gap")
        params = init(rng, CFG)
        out = jit_apply(apply, CFG)(params, batch)
        out_r = jit_apply(apply, CFG.replace(remat=True))(params, batch)
        np.testing.assert_allclose(np.asarray(out), np.asarray(out_r),
                                   rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize("policy", ["dots", "tri_a", "proj"])
    def test_remat_policies_match(self, rng, policy):
        """Selective-remat policies are perf knobs, never numerics knobs."""
        batch = make_synthetic_batch(rng)
        init, apply = make_model("gap")
        params = init(rng, CFG)
        out = jit_apply(apply, CFG)(params, batch)
        cfg_p = CFG.replace(remat=True, remat_policy=policy)
        out_p = jit_apply(apply, cfg_p)(params, batch)
        np.testing.assert_allclose(np.asarray(out), np.asarray(out_p),
                                   rtol=1e-5, atol=1e-5)

    def test_layer_multiplier_shares_weights(self, rng):
        """x2 model applies each layer twice — same params, deeper compute."""
        cfg1 = CFG.replace(layer_multiplier=1)
        cfg2 = CFG.replace(layer_multiplier=2)
        init, apply = make_model("gap")
        params = init(rng, cfg1)
        n1 = sum(x.size for x in jax.tree.leaves(init(rng, cfg1)))
        n2 = sum(x.size for x in jax.tree.leaves(init(rng, cfg2)))
        assert n1 == n2  # param count unchanged
        out1 = jit_apply(apply, cfg1)(params, batch := make_synthetic_batch(rng))
        out2 = jit_apply(apply, cfg2)(params, batch)
        assert not np.allclose(np.asarray(out1), np.asarray(out2))

    def test_deterministic_is_reproducible(self, rng):
        batch = make_synthetic_batch(rng)
        init, apply = make_model("gap")
        params = init(rng, CFG)
        f = jit_apply(apply, CFG)
        np.testing.assert_array_equal(np.asarray(f(params, batch)),
                                      np.asarray(f(params, batch)))

    def test_dropout_rng_changes_output(self, rng):
        cfg = CFG.replace(source_dropout=0.5, drop_path=0.5,
                          node_act_dropout=0.5)
        batch = make_synthetic_batch(rng)
        init, apply = make_model("gap")
        params = init(rng, cfg)
        f = jax.jit(functools.partial(apply, cfg=cfg, deterministic=False))
        o1 = f(params, batch, rng=jax.random.PRNGKey(1))
        o2 = f(params, batch, rng=jax.random.PRNGKey(2))
        assert not np.allclose(np.asarray(o1), np.asarray(o2))
        o1b = f(params, batch, rng=jax.random.PRNGKey(1))
        np.testing.assert_array_equal(np.asarray(o1), np.asarray(o1b))

    def test_grads_finite(self, rng):
        batch = make_synthetic_batch(rng)
        init, apply = make_model("gap")
        params = init(rng, CFG)

        def loss_fn(p):
            return jnp.abs(apply(p, batch, CFG)).mean()

        g = jax.jit(jax.grad(loss_fn))(params)
        leaves = jax.tree.leaves(g)
        assert all(np.all(np.isfinite(np.asarray(x))) for x in leaves)
        # every parameter must receive gradient (no dead weights)
        nonzero = [np.any(np.asarray(x) != 0) for x in leaves]
        assert np.mean(nonzero) > 0.9

    def test_no_3d_embedding(self, rng):
        cfg = CFG.replace(embed_3d_type="none")
        batch = make_synthetic_batch(rng, with_3d=False)
        init, apply = make_model("gap")
        params = init(rng, cfg)
        out = jit_apply(apply, cfg)(params, batch)
        assert np.all(np.isfinite(np.asarray(out)))

    def test_fourier_3d(self, rng):
        cfg = CFG.replace(embed_3d_type="fourier")
        batch = make_synthetic_batch(rng)
        init, apply = make_model("gap")
        params = init(rng, cfg)
        out = jit_apply(apply, cfg)(params, batch)
        assert np.all(np.isfinite(np.asarray(out)))

    def test_bfloat16_compute(self, rng):
        cfg = CFG.replace(compute_dtype="bfloat16")
        batch = make_synthetic_batch(rng)
        init, apply = make_model("distance")
        params = init(rng, cfg)
        out = jit_apply(apply, cfg)(params, batch)
        assert np.all(np.isfinite(np.asarray(out, dtype=np.float32)))

    def test_egt_simple(self, rng):
        cfg = CFG.replace(egt_simple=True, triplet_heads=0)
        batch = make_synthetic_batch(rng)
        init, apply = make_model("gap")
        params = init(rng, cfg)
        out = jit_apply(apply, cfg)(params, batch)
        assert np.all(np.isfinite(np.asarray(out)))
