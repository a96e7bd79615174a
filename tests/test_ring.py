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
