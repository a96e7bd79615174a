"""Pair-axis ring triplet attention vs the unsharded oracle (CPU mesh)."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tgt_tpu.core.graph import additive_mask_from_node_mask
from tgt_tpu.ops.triplet import triplet_attention, triplet_attention_init
from tgt_tpu.parallel.mesh import PAIR_AXIS
from tgt_tpu.parallel.ring import (_pair_transpose, ring_pass,
                                   triplet_attention_ring)


@pytest.fixture(scope="module")
def mesh():
    devs = np.asarray(jax.devices()[:4])
    return Mesh(devs, (PAIR_AXIS,))


class TestPairTranspose:
    def test_matches_global_transpose(self, mesh):
        b, n, d, h = 2, 8, 3, 2
        x = jax.random.normal(jax.random.PRNGKey(0), (b, n, n, d, h))

        def f(x_local):
            return _pair_transpose(x_local, PAIR_AXIS)

        y = jax.jit(jax.shard_map(
            f, mesh=mesh, in_specs=P(None, PAIR_AXIS),
            out_specs=P(None, PAIR_AXIS)))(x)
        np.testing.assert_allclose(np.asarray(y),
                                   np.asarray(jnp.swapaxes(x, 1, 2)),
                                   atol=1e-6)

    def test_ring_pass_rotates(self, mesh):
        x = jnp.arange(4.0).reshape(4, 1)

        def f(blk):
            return ring_pass(blk, PAIR_AXIS)

        y = jax.jit(jax.shard_map(f, mesh=mesh, in_specs=P(PAIR_AXIS),
                                  out_specs=P(PAIR_AXIS)))(x)
        # device i receives from device i-1
        np.testing.assert_array_equal(np.asarray(y).ravel(), [3, 0, 1, 2])


class TestRingTriplet:
    @pytest.mark.parametrize("pad", [False, True])
    def test_matches_unsharded(self, mesh, pad):
        b, n, w, h = 2, 8, 16, 2
        p = triplet_attention_init(jax.random.PRNGKey(0), w, h, gated=True)
        e = jax.random.normal(jax.random.PRNGKey(1), (b, n, n, w))
        node_mask = np.ones((b, n), np.float32)
        if pad:
            node_mask[1, 6:] = 0
        mask = additive_mask_from_node_mask(jnp.asarray(node_mask))

        expected = triplet_attention(p, e, mask, num_heads=h)

        ring_fn = functools.partial(triplet_attention_ring, num_heads=h)
        got = jax.jit(jax.shard_map(
            ring_fn, mesh=mesh,
            in_specs=(P(), P(None, PAIR_AXIS), P(None, PAIR_AXIS)),
            out_specs=P(None, PAIR_AXIS)))(p, e, mask)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                                   rtol=2e-4, atol=2e-4)

    def test_gradients_flow(self, mesh):
        b, n, w, h = 2, 8, 16, 2
        p = triplet_attention_init(jax.random.PRNGKey(0), w, h, gated=True)
        e = jax.random.normal(jax.random.PRNGKey(1), (b, n, n, w))
        mask = jnp.zeros((b, n, n, 1))

        ring_fn = functools.partial(triplet_attention_ring, num_heads=h)
        smapped = jax.shard_map(
            ring_fn, mesh=mesh,
            in_specs=(P(), P(None, PAIR_AXIS), P(None, PAIR_AXIS)),
            out_specs=P(None, PAIR_AXIS))

        def loss_ring(e_):
            return (smapped(p, e_, mask) ** 2).sum()

        def loss_ref(e_):
            return (triplet_attention(p, e_, mask, num_heads=h) ** 2).sum()

        g_ring = jax.jit(jax.grad(loss_ring))(e)
        g_ref = jax.jit(jax.grad(loss_ref))(e)
        np.testing.assert_allclose(np.asarray(g_ring), np.asarray(g_ref),
                                   rtol=5e-4, atol=5e-4)


class TestPairShardedLayer:
    """Full layer / encoder stack under edge-block sharding vs the unsharded
    oracle (deterministic path)."""

    def _setup(self, height=2):
        from tgt_tpu.models import TGTConfig
        from tgt_tpu.models.encoder import encoder_init
        cfg = TGTConfig(node_width=16, edge_width=16, num_heads=4,
                        model_height=height, triplet_heads=2,
                        triplet_type="attention", node_ended=True,
                        edge_ended=True)
        params = encoder_init(jax.random.PRNGKey(0), cfg)
        b, n = 2, 8
        h = jax.random.normal(jax.random.PRNGKey(1), (b, n, 16))
        e = jax.random.normal(jax.random.PRNGKey(2), (b, n, n, 16))
        node_mask = np.ones((b, n), np.float32)
        node_mask[1, 6:] = 0
        mask = additive_mask_from_node_mask(jnp.asarray(node_mask))
        return cfg, params, h, e, mask, jnp.asarray(node_mask)

    def test_encoder_matches_unsharded(self, mesh):
        from tgt_tpu.core.graph import Graph
        from tgt_tpu.models.encoder import encoder_apply
        from tgt_tpu.parallel.pair_layer import encoder_pair_sharded
        cfg, params, h, e, mask, node_mask = self._setup()

        g = encoder_apply(params, Graph(h=h, e=e, mask=mask,
                                        node_mask=node_mask), cfg)

        fn = functools.partial(encoder_pair_sharded, cfg=cfg)
        h2, e2 = jax.jit(jax.shard_map(
            fn, mesh=mesh,
            in_specs=(P(), P(), P(None, PAIR_AXIS), P(None, PAIR_AXIS)),
            out_specs=(P(), P(None, PAIR_AXIS)),
            check_vma=False))(params, h, e, mask)
        np.testing.assert_allclose(np.asarray(h2), np.asarray(g.h),
                                   rtol=5e-4, atol=5e-4)
        np.testing.assert_allclose(np.asarray(e2), np.asarray(g.e),
                                   rtol=5e-4, atol=5e-4)

    def test_layer_multiplier_matches(self, mesh):
        from tgt_tpu.core.graph import Graph
        from tgt_tpu.models.encoder import encoder_apply
        from tgt_tpu.parallel.pair_layer import encoder_pair_sharded
        cfg, params, h, e, mask, node_mask = self._setup(height=2)
        cfg = cfg.replace(layer_multiplier=2)
        g = encoder_apply(params, Graph(h=h, e=e, mask=mask,
                                        node_mask=node_mask), cfg)
        fn = functools.partial(encoder_pair_sharded, cfg=cfg)
        h2, e2 = jax.jit(jax.shard_map(
            fn, mesh=mesh,
            in_specs=(P(), P(), P(None, PAIR_AXIS), P(None, PAIR_AXIS)),
            out_specs=(P(), P(None, PAIR_AXIS)),
            check_vma=False))(params, h, e, mask)
        np.testing.assert_allclose(np.asarray(e2), np.asarray(g.e),
                                   rtol=1e-3, atol=1e-3)


class TestRingAggregate:
    """triplet_aggregate_ring vs the unsharded oracle — both gated (with the
    reference's unmasked-out-direction quirk) and ungated."""

    @pytest.mark.parametrize("gated,pad", [(True, False), (True, True),
                                           (False, True)])
    def test_matches_unsharded(self, mesh, gated, pad):
        from tgt_tpu.ops.triplet import (triplet_aggregate,
                                         triplet_aggregate_init,
                                         triplet_aggregate_ungated)
        from tgt_tpu.parallel.ring import triplet_aggregate_ring
        b, n, w, h = 2, 8, 16, 2
        p = triplet_aggregate_init(jax.random.PRNGKey(0), w, h, gated=gated)
        e = jax.random.normal(jax.random.PRNGKey(1), (b, n, n, w))
        node_mask = np.ones((b, n), np.float32)
        if pad:
            node_mask[1, 6:] = 0
        mask = additive_mask_from_node_mask(jnp.asarray(node_mask))

        oracle = triplet_aggregate if gated else triplet_aggregate_ungated
        expected = oracle(p, e, mask, num_heads=h)

        ring_fn = functools.partial(triplet_aggregate_ring, num_heads=h,
                                    gated=gated)
        got = jax.jit(jax.shard_map(
            ring_fn, mesh=mesh,
            in_specs=(P(), P(None, PAIR_AXIS), P(None, PAIR_AXIS)),
            out_specs=P(None, PAIR_AXIS)))(p, e, mask)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                                   rtol=2e-4, atol=2e-4)

    def test_ungated_attention_ring(self, mesh):
        from tgt_tpu.ops.triplet import (triplet_attention_init,
                                         triplet_attention_ungated)
        b, n, w, h = 2, 8, 16, 2
        p = triplet_attention_init(jax.random.PRNGKey(0), w, h, gated=False)
        e = jax.random.normal(jax.random.PRNGKey(1), (b, n, n, w))
        mask = jnp.zeros((b, n, n, 1))
        expected = triplet_attention_ungated(p, e, mask, num_heads=h)
        ring_fn = functools.partial(triplet_attention_ring, num_heads=h,
                                    gated=False)
        got = jax.jit(jax.shard_map(
            ring_fn, mesh=mesh,
            in_specs=(P(), P(None, PAIR_AXIS), P(None, PAIR_AXIS)),
            out_specs=P(None, PAIR_AXIS)))(p, e, mask)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                                   rtol=2e-4, atol=2e-4)


class TestPairShardedTraining:
    """The pair-sharded stack must be TRAINABLE: stochastic forward finite,
    grads flow, and a few SGD steps reduce the loss (VERDICT r1 #3)."""

    @pytest.mark.parametrize("triplet_type", ["attention", "aggregate"])
    def test_stochastic_training_steps(self, mesh, triplet_type):
        from tgt_tpu.models import TGTConfig
        from tgt_tpu.models.encoder import encoder_init
        from tgt_tpu.parallel.pair_layer import encoder_pair_sharded
        cfg = TGTConfig(node_width=16, edge_width=16, num_heads=4,
                        model_height=2, triplet_heads=2,
                        triplet_type=triplet_type, node_ended=True,
                        edge_ended=True, drop_path=0.1,
                        node_act_dropout=0.1, edge_act_dropout=0.1,
                        source_dropout=0.1, triplet_dropout=0.1)
        params = encoder_init(jax.random.PRNGKey(0), cfg)
        b, n = 2, 8
        h = jax.random.normal(jax.random.PRNGKey(1), (b, n, 16))
        e = jax.random.normal(jax.random.PRNGKey(2), (b, n, n, 16))
        mask = jnp.zeros((b, n, n, 1))
        target = jax.random.normal(jax.random.PRNGKey(3), (b, n, n, 16))

        def fn(p_, h_, e_, m_, r_):
            return encoder_pair_sharded(p_, h_, e_, m_, cfg=cfg,
                                        deterministic=False, rng=r_)
        smapped = jax.shard_map(
            fn, mesh=mesh,
            in_specs=(P(), P(), P(None, PAIR_AXIS), P(None, PAIR_AXIS),
                      P()),
            out_specs=(P(), P(None, PAIR_AXIS)), check_vma=False)

        def loss(p, rng):
            h2, e2 = smapped(p, h, e, mask, rng)
            return jnp.mean((e2 - target) ** 2) + jnp.mean(h2 ** 2) * 0.01

        step = jax.jit(jax.value_and_grad(loss))
        losses = []
        for i in range(5):
            val, grads = step(params, jax.random.PRNGKey(10 + i))
            assert np.isfinite(float(val))
            gnorm = sum(float(jnp.sum(jnp.abs(g)))
                        for g in jax.tree.leaves(grads))
            assert np.isfinite(gnorm) and gnorm > 0
            params = jax.tree.map(lambda p_, g: p_ - 0.05 * g, params, grads)
            losses.append(float(val))
        assert losses[-1] < losses[0]

    @pytest.mark.parametrize("triplet_type", ["attention", "aggregate"])
    def test_triplet_dropout_is_consumed(self, mesh, triplet_type):
        """Regression: the pair-sharded path must APPLY cfg.triplet_dropout —
        it was silently dropped once (same rng, dropout on vs off must give
        different stochastic outputs)."""
        from tgt_tpu.models import TGTConfig
        from tgt_tpu.models.encoder import encoder_init
        from tgt_tpu.parallel.pair_layer import encoder_pair_sharded

        outs = {}
        for rate in (0.0, 0.5):
            cfg = TGTConfig(node_width=16, edge_width=16, num_heads=4,
                            model_height=2, triplet_heads=2,
                            triplet_type=triplet_type, node_ended=True,
                            edge_ended=True, triplet_dropout=rate)
            params = encoder_init(jax.random.PRNGKey(0), cfg)
            b, n = 2, 8
            h = jax.random.normal(jax.random.PRNGKey(1), (b, n, 16))
            e = jax.random.normal(jax.random.PRNGKey(2), (b, n, n, 16))
            mask = jnp.zeros((b, n, n, 1))

            def fn(p_, h_, e_, m_, r_, cfg=cfg):
                return encoder_pair_sharded(p_, h_, e_, m_, cfg=cfg,
                                            deterministic=False, rng=r_)
            smapped = jax.shard_map(
                fn, mesh=mesh,
                in_specs=(P(), P(), P(None, PAIR_AXIS), P(None, PAIR_AXIS),
                          P()),
                out_specs=(P(), P(None, PAIR_AXIS)), check_vma=False)
            _, e2 = smapped(params, h, e, mask, jax.random.PRNGKey(7))
            outs[rate] = np.asarray(e2)
        assert not np.allclose(outs[0.0], outs[0.5], atol=1e-6)

    def test_stochastic_mean_close_to_deterministic(self, mesh):
        """Averaging many stochastic draws approaches the deterministic
        forward (dropout is unbiased) — sanity for the per-device rng
        folding."""
        from tgt_tpu.models import TGTConfig
        from tgt_tpu.models.encoder import encoder_init
        from tgt_tpu.parallel.pair_layer import encoder_pair_sharded
        cfg = TGTConfig(node_width=16, edge_width=16, num_heads=4,
                        model_height=1, triplet_heads=2,
                        triplet_type="attention", node_ended=True,
                        edge_ended=True, edge_act_dropout=0.3)
        params = encoder_init(jax.random.PRNGKey(0), cfg)
        b, n = 2, 8
        h = jax.random.normal(jax.random.PRNGKey(1), (b, n, 16)) * 0.3
        e = jax.random.normal(jax.random.PRNGKey(2), (b, n, n, 16)) * 0.3
        mask = jnp.zeros((b, n, n, 1))

        det_fn = functools.partial(encoder_pair_sharded, cfg=cfg)
        h_det, e_det = jax.jit(jax.shard_map(
            det_fn, mesh=mesh,
            in_specs=(P(), P(), P(None, PAIR_AXIS), P(None, PAIR_AXIS)),
            out_specs=(P(), P(None, PAIR_AXIS)), check_vma=False))(
                params, h, e, mask)

        def sto_fn(p_, h_, e_, m_, r_):
            return encoder_pair_sharded(p_, h_, e_, m_, cfg=cfg,
                                        deterministic=False, rng=r_)
        smapped = jax.jit(jax.shard_map(
            sto_fn, mesh=mesh,
            in_specs=(P(), P(), P(None, PAIR_AXIS), P(None, PAIR_AXIS), P()),
            out_specs=(P(), P(None, PAIR_AXIS)), check_vma=False))
        acc = np.zeros_like(np.asarray(e_det))
        k = 64
        for i in range(k):
            _, e_s = smapped(params, h, e, mask, jax.random.PRNGKey(i))
            acc += np.asarray(e_s)
        # loose tolerance: MC error ~ 1/sqrt(64)
        np.testing.assert_allclose(acc / k, np.asarray(e_det), atol=0.25)
