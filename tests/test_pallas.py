"""Pallas kernel tests (interpret mode on CPU; real lowering covered by the
TPU bench runs)."""
import functools
import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.conftest import make_synthetic_batch
from tgt_tpu.core.graph import additive_mask_from_node_mask
from tgt_tpu.ops.triplet import (triplet_attention, triplet_attention_init,
                                 triplet_attention_ungated)


@pytest.fixture(autouse=True)
def force_interpret(monkeypatch):
    """Pallas TPU kernels run in interpreter mode on the CPU backend."""
    from jax.experimental import pallas as pl
    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(pl, "pallas_call", patched)
    import tgt_tpu.ops.pallas.triplet_attention as ta
    monkeypatch.setattr(ta.pl, "pallas_call", patched)
    yield


@pytest.fixture(scope="module")
def inputs():
    b, n, w, h = 2, 12, 32, 4
    p = triplet_attention_init(jax.random.PRNGKey(0), w, h, gated=True)
    pu = triplet_attention_init(jax.random.PRNGKey(1), w, h, gated=False)
    e = jax.random.normal(jax.random.PRNGKey(2), (b, n, n, w))
    node_mask = np.ones((b, n), np.float32)
    node_mask[1, 9:] = 0
    mask = additive_mask_from_node_mask(jnp.asarray(node_mask))
    return p, pu, e, mask, h


class TestTripletAttentionKernel:
    def test_forward_matches_jnp(self, inputs):
        p, _, e, mask, h = inputs
        ref = triplet_attention(p, e, mask, num_heads=h)
        fused = triplet_attention(p, e, mask, num_heads=h, use_pallas=True)
        np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                                   rtol=2e-3, atol=2e-3)

    def test_ungated_forward_matches(self, inputs):
        _, pu, e, mask, h = inputs
        ref = triplet_attention_ungated(pu, e, mask, num_heads=h)
        fused = triplet_attention_ungated(pu, e, mask, num_heads=h,
                                          use_pallas=True)
        np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                                   rtol=2e-3, atol=2e-3)

    def test_gradients_match(self, inputs):
        p, _, e, mask, h = inputs

        def loss(fn_kwargs):
            def f(e_):
                return (triplet_attention(p, e_, mask, num_heads=h,
                                          **fn_kwargs) ** 2).sum()
            return f

        g_ref = jax.grad(loss({}))(e)
        g_fused = jax.grad(loss({"use_pallas": True}))(e)
        scale = float(jnp.max(jnp.abs(g_ref))) + 1e-9
        np.testing.assert_allclose(np.asarray(g_fused) / scale,
                                   np.asarray(g_ref) / scale,
                                   rtol=0, atol=5e-3)

    def test_param_gradients_match(self, inputs):
        p, _, e, mask, h = inputs

        def make_loss(use_pallas):
            def f(pp):
                return (triplet_attention(pp, e, mask, num_heads=h,
                                          use_pallas=use_pallas) ** 2).sum()
            return f

        g_ref = jax.grad(make_loss(False))(p)
        g_fused = jax.grad(make_loss(True))(p)
        for k in g_ref:
            for kk in g_ref[k]:
                a, b_ = np.asarray(g_ref[k][kk]), np.asarray(g_fused[k][kk])
                scale = np.abs(a).max() + 1e-9
                np.testing.assert_allclose(b_ / scale, a / scale, rtol=0,
                                           atol=5e-3,
                                           err_msg=f"param {k}/{kk}")

    def test_dropout_falls_back_to_jnp(self, inputs):
        """attention_dropout>0 in training uses the jnp path (well-defined
        dropout semantics); check it doesn't crash with use_pallas set AND
        that the silent-fallback warning fires (once)."""
        import tgt_tpu.ops.triplet as tri_mod
        p, _, e, mask, h = inputs
        tri_mod._pallas_fallback_warned.clear()
        with pytest.warns(RuntimeWarning, match="attention_dropout"):
            out = triplet_attention(p, e, mask, num_heads=h, use_pallas=True,
                                    attention_dropout=0.5, deterministic=False,
                                    rng=jax.random.PRNGKey(0))
        assert np.all(np.isfinite(np.asarray(out)))
        # second call with the same reason stays silent (one-time warning)
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            triplet_attention(p, e, mask, num_heads=h, use_pallas=True,
                              attention_dropout=0.5, deterministic=False,
                              rng=jax.random.PRNGKey(0))


class TestTripletDenseKernel:
    """Lane-dense Mosaic kernel (ops/pallas/triplet_dense.py) vs jnp oracle."""

    @pytest.fixture(scope="class")
    def dense_inputs(self):
        # geometry satisfying the kernel's 128-lane density contract:
        # n*h = 128, d*h = 128, n % JBLK == 0
        b, n, w, h = 2, 16, 128, 8
        p = triplet_attention_init(jax.random.PRNGKey(0), w, h, gated=True)
        pu = triplet_attention_init(jax.random.PRNGKey(1), w, h, gated=False)
        e = jax.random.normal(jax.random.PRNGKey(2), (b, n, n, w))
        node_mask = np.ones((b, n), np.float32)
        node_mask[1, 11:] = 0
        mask = additive_mask_from_node_mask(jnp.asarray(node_mask))
        return p, pu, e, mask, h

    def test_supported_geometries(self):
        from tgt_tpu.ops.pallas.triplet_dense import (dense_supported,
                                                      dense_unsupported_reason)
        # EVERY production bucket (24..56) at flagship triplet geometry —
        # non-JBLK multiples are handled by exact j-axis zero-padding
        assert all(dense_supported(n, 256, 16)
                   for n in (16, 24, 32, 40, 48, 56, 64))
        assert not dense_supported(12, 256, 16)   # 12*16 lanes not 128-dense
        assert not dense_supported(16, 32, 4)     # lanes not 128-dense
        # VMEM feasibility clause (round-5): large-N bf16 attention bwd
        # (9 double-buffered panels) exceeds the budget at n=96; the
        # 3-panel AGGREGATE backward still fits there, and the reason
        # string names VMEM, not lanes
        assert not dense_supported(96, 256, 16)
        assert "VMEM" in dense_unsupported_reason(96, 256, 16)
        assert dense_supported(96, 256, 16, bwd_nblocks=3)
        # f32 programs (itemsize 4) halve the feasible n
        assert dense_supported(48, 256, 16, itemsize=2)
        assert not dense_supported(64, 256, 16, itemsize=4)

    def test_rowmax_underflow_guard(self):
        """A head whose logits ALL sit far below the cross-head row max
        (exp row flushes to exact 0) must output zeros, not NaN (the
        per-row max's one failure mode vs the old per-head segmax —
        guarded by the denominator clamp in _attn_tile)."""
        from tgt_tpu.ops.pallas.triplet_dense import triplet_attention_dense
        from tgt_tpu.ops.triplet import triplet_attention_init
        b, n, w, h = 1, 16, 128, 8
        p = triplet_attention_init(jax.random.PRNGKey(0), w, h, gated=True)
        # push head 0's logit bias 300 below the others (lin_EG emits 2h
        # channels: h bias + h gate; entry 0 is head 0's bias)
        eg = p["lin_EG_in"]["b"]
        p["lin_EG_in"]["b"] = eg.at[0].set(-300.0)
        e = jax.random.normal(jax.random.PRNGKey(1), (b, n, n, w)) * 0.1
        mask = jnp.zeros((b, n, n, 1))
        out = triplet_attention_dense(p, e, mask, num_heads=h,
                                      interpret=True)
        assert np.isfinite(np.asarray(out, np.float32)).all()

    @pytest.mark.parametrize("n", [24, 40])
    def test_jpadded_buckets_match_jnp(self, n):
        """Buckets that are not JBLK multiples run via exact j-padding:
        fwd AND grads must match the jnp oracle (padded-j rows feed zero
        cotangents into the cross-j dbias/dgate/dK/dV accumulations)."""
        from tgt_tpu.ops.pallas.triplet_dense import triplet_attention_dense
        b, w, h = 2, 256, 16
        p = triplet_attention_init(jax.random.PRNGKey(0), w, h, gated=True)
        e = jax.random.normal(jax.random.PRNGKey(2), (b, n, n, w)) * 0.5
        nm = np.ones((b, n), np.float32)
        nm[1, n - 5:] = 0
        mask = additive_mask_from_node_mask(jnp.asarray(nm))
        ref = triplet_attention(p, e, mask, num_heads=h)
        got = triplet_attention_dense(p, e, mask, num_heads=h, gated=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

        def loss(fn, pp, ee):
            return (fn(pp, ee, mask, num_heads=h) ** 2).sum()

        g_ref = jax.grad(loss, argnums=(1, 2))(triplet_attention, p, e)
        g_den = jax.grad(loss, argnums=(1, 2))(
            functools.partial(triplet_attention_dense, gated=True), p, e)
        for a, b_ in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_den)):
            a, b_ = np.asarray(a), np.asarray(b_)
            scale = np.abs(a).max() + 1e-9
            np.testing.assert_allclose(b_ / scale, a / scale, rtol=0,
                                       atol=1e-4)

    def test_jpadded_aggregate_matches_jnp(self):
        from tgt_tpu.ops.pallas.triplet_dense import triplet_aggregate_dense
        from tgt_tpu.ops.triplet import (triplet_aggregate,
                                         triplet_aggregate_init)
        b, n, w, h = 2, 24, 256, 16
        p = triplet_aggregate_init(jax.random.PRNGKey(1), w, h, gated=True)
        e = jax.random.normal(jax.random.PRNGKey(2), (b, n, n, w)) * 0.5
        nm = np.ones((b, n), np.float32)
        nm[1, n - 5:] = 0
        mask = additive_mask_from_node_mask(jnp.asarray(nm))
        ref = triplet_aggregate(p, e, mask, num_heads=h)
        got = triplet_aggregate_dense(p, e, mask, num_heads=h, gated=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

        def loss(fn, pp, ee):
            return (fn(pp, ee, mask, num_heads=h) ** 2).sum()

        g_ref = jax.grad(loss, argnums=(1, 2))(triplet_aggregate, p, e)
        g_den = jax.grad(loss, argnums=(1, 2))(
            functools.partial(triplet_aggregate_dense, gated=True), p, e)
        for a, b_ in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_den)):
            a, b_ = np.asarray(a), np.asarray(b_)
            scale = np.abs(a).max() + 1e-9
            np.testing.assert_allclose(b_ / scale, a / scale, rtol=0,
                                       atol=1e-4)

    @pytest.mark.parametrize("gated", [True, False])
    def test_forward_matches_jnp(self, dense_inputs, gated):
        from tgt_tpu.ops.pallas.triplet_dense import triplet_attention_dense
        p, pu, e, mask, h = dense_inputs
        if gated:
            ref = triplet_attention(p, e, mask, num_heads=h)
            got = triplet_attention_dense(p, e, mask, num_heads=h, gated=True)
        else:
            ref = triplet_attention_ungated(pu, e, mask, num_heads=h)
            got = triplet_attention_dense(pu, e, mask, num_heads=h,
                                          gated=False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_gradients_match(self, dense_inputs):
        from tgt_tpu.ops.pallas.triplet_dense import triplet_attention_dense
        p, _, e, mask, h = dense_inputs

        def loss(fn, pp, ee):
            return (fn(pp, ee, mask, num_heads=h) ** 2).sum()

        g_ref = jax.grad(loss, argnums=(1, 2))(triplet_attention, p, e)
        g_den = jax.grad(loss, argnums=(1, 2))(
            functools.partial(triplet_attention_dense, gated=True), p, e)
        for a, b_ in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_den)):
            a, b_ = np.asarray(a), np.asarray(b_)
            scale = np.abs(a).max() + 1e-9
            np.testing.assert_allclose(b_ / scale, a / scale, rtol=0,
                                       atol=1e-4)

    def test_flagship_geometry_numerics(self):
        """Numerics at the published triplet geometry (N=48, edge 256,
        16 triplet heads, d=16) — head-packing/reshape bugs live at
        non-toy widths (TPU lowering alone is pinned by TestTPULowering)."""
        from tgt_tpu.ops.pallas.triplet_dense import triplet_attention_dense
        b, n, w, h = 1, 48, 256, 16
        p = triplet_attention_init(jax.random.PRNGKey(0), w, h, gated=True)
        e = jax.random.normal(jax.random.PRNGKey(2), (b, n, n, w)) * 0.5
        nm = np.ones((b, n), np.float32)
        nm[0, 37:] = 0
        mask = additive_mask_from_node_mask(jnp.asarray(nm))
        ref = triplet_attention(p, e, mask, num_heads=h)
        got = triplet_attention_dense(p, e, mask, num_heads=h, gated=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

        def loss(fn, pp, ee):
            return (fn(pp, ee, mask, num_heads=h) ** 2).sum()

        g_ref = jax.grad(loss, argnums=(1, 2))(triplet_attention, p, e)
        g_den = jax.grad(loss, argnums=(1, 2))(
            functools.partial(triplet_attention_dense, gated=True), p, e)
        for a, b_ in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_den)):
            a, b_ = np.asarray(a), np.asarray(b_)
            scale = np.abs(a).max() + 1e-9
            np.testing.assert_allclose(b_ / scale, a / scale, rtol=0,
                                       atol=1e-5)

    @pytest.mark.parametrize("gated", [True, False])
    def test_data_mesh_shard_map_matches_unsharded(self, dense_inputs, gated):
        """With a registered data mesh the kernel cores route through
        jax.shard_map over the batch axis (GSPMD cannot partition Mosaic
        kernels) — numerics must match the unsharded call exactly,
        including gradients."""
        from jax.sharding import Mesh
        from tgt_tpu.ops.pallas import triplet_dense as td
        p, pu, e, mask, h = dense_inputs
        pp = p if gated else pu
        ref = td.triplet_attention_dense(pp, e, mask, num_heads=h,
                                         gated=gated)

        def loss(fn, prm, ee):
            return (fn(prm, ee, mask, num_heads=h, gated=gated) ** 2).sum()

        g_ref = jax.grad(loss, argnums=(1, 2))(td.triplet_attention_dense,
                                               pp, e)
        td.set_dense_data_mesh(Mesh(np.array(jax.devices()[:2]), ("data",)))
        try:
            got = td.triplet_attention_dense(pp, e, mask, num_heads=h,
                                             gated=gated)
            g_got = jax.grad(loss, argnums=(1, 2))(
                td.triplet_attention_dense, pp, e)
        finally:
            td.set_dense_data_mesh(None)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-6, atol=1e-6)
        for a, b_ in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_got)):
            a, b_ = np.asarray(a), np.asarray(b_)
            # floor the scale: leaves whose true grad is ~0 (lin_E biases —
            # softmax shift invariance) carry only f32 noise in BOTH paths
            scale = max(np.abs(a).max(), 1.0)
            np.testing.assert_allclose(b_ / scale, a / scale, rtol=0,
                                       atol=1e-5)

    def test_data_mesh_shard_map_aggregate(self):
        """The aggregate core is also routed through shard_map when a data
        mesh is registered — numerics must match the unsharded call."""
        from jax.sharding import Mesh
        from tgt_tpu.ops.pallas import triplet_dense as td
        from tgt_tpu.ops.triplet import (triplet_aggregate,
                                         triplet_aggregate_init)
        b, n, w, h = 2, 16, 128, 8
        p = triplet_aggregate_init(jax.random.PRNGKey(0), w, h, gated=True)
        e = jax.random.normal(jax.random.PRNGKey(2), (b, n, n, w))
        nm = np.ones((b, n), np.float32)
        nm[1, 11:] = 0
        mask = additive_mask_from_node_mask(jnp.asarray(nm))
        ref = triplet_aggregate(p, e, mask, num_heads=h, use_pallas="dense")
        td.set_dense_data_mesh(Mesh(np.array(jax.devices()[:2]), ("data",)))
        try:
            got = triplet_aggregate(p, e, mask, num_heads=h,
                                    use_pallas="dense")
        finally:
            td.set_dense_data_mesh(None)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-6, atol=1e-6)

    def test_fully_masked_sample_stays_finite_and_equal(self):
        """Bucketed batches pad with all-masked samples (pad_batch_dim);
        the kernel must stay finite and oracle-equal there — a 0/0 in its
        softmax would poison the masked loss (0 * NaN = NaN)."""
        from tgt_tpu.ops.pallas.triplet_dense import triplet_attention_dense
        b, n, w, h = 2, 16, 128, 8
        p = triplet_attention_init(jax.random.PRNGKey(0), w, h, gated=True)
        e = jax.random.normal(jax.random.PRNGKey(2), (b, n, n, w))
        nm = np.ones((b, n), np.float32)
        nm[1, :] = 0
        mask = additive_mask_from_node_mask(jnp.asarray(nm))
        ref = triplet_attention(p, e, mask, num_heads=h)
        got = triplet_attention_dense(p, e, mask, num_heads=h, gated=True)
        assert np.isfinite(np.asarray(got)).all()
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)
        g = jax.grad(lambda ee: (triplet_attention_dense(
            p, ee, mask, num_heads=h, gated=True) ** 2).sum())(e)
        assert np.isfinite(np.asarray(g)).all()

    def test_padding_invariance_across_buckets(self):
        """Same real nodes padded to N=16 vs N=32 give identical outputs at
        valid positions — the kernel's additive-mask handling must ignore
        padding exactly like the jnp path (bucketed serving/training repads
        between these shapes)."""
        from tgt_tpu.ops.pallas.triplet_dense import triplet_attention_dense
        b, w, h, real = 2, 128, 8, 11
        p = triplet_attention_init(jax.random.PRNGKey(0), w, h, gated=True)
        e_real = jax.random.normal(jax.random.PRNGKey(2), (b, real, real, w))
        outs = {}
        for n in (16, 32):
            e = jnp.zeros((b, n, n, w)).at[:, :real, :real].set(e_real)
            nm = np.zeros((b, n), np.float32)
            nm[:, :real] = 1
            mask = additive_mask_from_node_mask(jnp.asarray(nm))
            out = triplet_attention_dense(p, e, mask, num_heads=h, gated=True)
            outs[n] = np.asarray(out)[:, :real, :real]
        np.testing.assert_allclose(outs[32], outs[16], rtol=1e-5, atol=1e-5)

    def test_dense_via_use_pallas_flag(self, dense_inputs):
        """use_pallas='dense' routes through _triplet_attention_impl."""
        p, _, e, mask, h = dense_inputs
        ref = triplet_attention(p, e, mask, num_heads=h)
        got = triplet_attention(p, e, mask, num_heads=h, use_pallas="dense")
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_unsupported_geometry_falls_back(self, inputs):
        """n=12 violates the density contract -> jnp path, same numbers,
        and the silent-fallback warning fires."""
        import tgt_tpu.ops.triplet as tri_mod
        p, _, e, mask, h = inputs
        ref = triplet_attention(p, e, mask, num_heads=h)
        tri_mod._pallas_fallback_warned.clear()
        with pytest.warns(RuntimeWarning, match="lane-dense"):
            got = triplet_attention(p, e, mask, num_heads=h,
                                    use_pallas="dense")
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


class TestAggregateDenseKernel:
    """Lane-dense k-aggregation for the aggregate variants."""

    @pytest.fixture(scope="class")
    def agg_inputs(self):
        from tgt_tpu.ops.triplet import triplet_aggregate_init
        b, n, w, h = 2, 16, 128, 8
        p = triplet_aggregate_init(jax.random.PRNGKey(0), w, h, gated=True)
        pu = triplet_aggregate_init(jax.random.PRNGKey(1), w, h, gated=False)
        e = jax.random.normal(jax.random.PRNGKey(2), (b, n, n, w))
        node_mask = np.ones((b, n), np.float32)
        node_mask[1, 11:] = 0
        mask = additive_mask_from_node_mask(jnp.asarray(node_mask))
        return p, pu, e, mask, h

    @pytest.mark.parametrize("gated", [True, False])
    def test_forward_matches_jnp(self, agg_inputs, gated):
        from tgt_tpu.ops.triplet import (triplet_aggregate,
                                         triplet_aggregate_ungated)
        p, pu, e, mask, h = agg_inputs
        fn = triplet_aggregate if gated else triplet_aggregate_ungated
        pp = p if gated else pu
        ref = fn(pp, e, mask, num_heads=h)
        got = fn(pp, e, mask, num_heads=h, use_pallas="dense")
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_gradients_match(self, agg_inputs):
        from tgt_tpu.ops.triplet import triplet_aggregate
        p, _, e, mask, h = agg_inputs

        def loss(use_pallas, pp, ee):
            return (triplet_aggregate(pp, ee, mask, num_heads=h,
                                      use_pallas=use_pallas) ** 2).sum()

        g_ref = jax.grad(functools.partial(loss, False),
                         argnums=(0, 1))(p, e)
        g_den = jax.grad(functools.partial(loss, "dense"),
                         argnums=(0, 1))(p, e)
        for a, b_ in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_den)):
            a, b_ = np.asarray(a), np.asarray(b_)
            scale = np.abs(a).max() + 1e-9
            np.testing.assert_allclose(b_ / scale, a / scale, rtol=0,
                                       atol=1e-4)

    def test_flagship_geometry_numerics(self):
        """Aggregate kernel at the published geometry (N=48, edge 256,
        16 heads) — forward and gradients vs the jnp oracle."""
        from tgt_tpu.ops.triplet import (triplet_aggregate,
                                         triplet_aggregate_init)
        b, n, w, h = 1, 48, 256, 16
        p = triplet_aggregate_init(jax.random.PRNGKey(0), w, h, gated=True)
        e = jax.random.normal(jax.random.PRNGKey(2), (b, n, n, w)) * 0.5
        nm = np.ones((b, n), np.float32)
        nm[0, 37:] = 0
        mask = additive_mask_from_node_mask(jnp.asarray(nm))
        ref = triplet_aggregate(p, e, mask, num_heads=h)
        got = triplet_aggregate(p, e, mask, num_heads=h, use_pallas="dense")
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

        def loss(use_pallas, pp, ee):
            return (triplet_aggregate(pp, ee, mask, num_heads=h,
                                      use_pallas=use_pallas) ** 2).sum()

        g_ref = jax.grad(functools.partial(loss, False), argnums=(0, 1))(p, e)
        g_den = jax.grad(functools.partial(loss, "dense"),
                         argnums=(0, 1))(p, e)
        for a, b_ in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_den)):
            a, b_ = np.asarray(a), np.asarray(b_)
            scale = np.abs(a).max() + 1e-9
            np.testing.assert_allclose(b_ / scale, a / scale, rtol=0,
                                       atol=1e-5)

    def test_dropout_supported(self, agg_inputs):
        """Aggregate-dense keeps dropout in XLA -> exact same masks/numbers
        as the jnp path for the same key."""
        from tgt_tpu.ops.triplet import triplet_aggregate
        p, _, e, mask, h = agg_inputs
        kw = dict(num_heads=h, attention_dropout=0.3, deterministic=False,
                  rng=jax.random.PRNGKey(7))
        ref = triplet_aggregate(p, e, mask, **kw)
        got = triplet_aggregate(p, e, mask, use_pallas="dense", **kw)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


class TestTPULowering:
    """The dense kernels must LOWER for the TPU platform (Mosaic dialect
    tracing + serialization) even on the CPU backend — catches kernel-body
    constructs Mosaic cannot represent before any hardware run. (Server-side
    codegen is validated by the TPU bench campaign.)"""

    @pytest.fixture(autouse=True)
    def force_interpret(self):
        """Shadow the module-level interpret patch: these tests must go
        through REAL Mosaic lowering (the patch was silently rerouting them
        to the interpreter path, which lowers trivially for any platform)."""
        yield

    def test_dense_kernels_lower_for_tpu(self):
        from tgt_tpu.ops.pallas.triplet_dense import (
            triplet_aggregate_dense, triplet_attention_dense)
        from tgt_tpu.ops.triplet import (triplet_aggregate_init,
                                         triplet_attention_init)
        n, h, w, b = 48, 16, 256, 2
        e = jnp.zeros((b, n, n, w), jnp.bfloat16)
        mask = jnp.zeros((b, n, n, 1), jnp.bfloat16)
        to_bf16 = functools.partial(jax.tree.map,
                                    lambda x: x.astype(jnp.bfloat16))
        # interpret=False pins the COMPILED Mosaic path: interpret=None
        # (the model-routed default) auto-resolves off the CPU backend here
        cases = [
            (to_bf16(triplet_attention_init(jax.random.PRNGKey(0), w, h)),
             functools.partial(triplet_attention_dense, num_heads=h,
                               interpret=False)),
            (to_bf16(triplet_aggregate_init(jax.random.PRNGKey(1), w, h)),
             functools.partial(triplet_aggregate_dense, num_heads=h,
                               interpret=False)),
        ]
        for p, fn in cases:
            def loss(pp, ee):
                return (fn(pp, ee, mask).astype(jnp.float32) ** 2).sum()
            txt = jax.jit(fn).trace(p, e, mask).lower(
                lowering_platforms=("tpu",)).as_text()
            # prove Mosaic ran (the interpreter path lowers trivially)
            assert "tpu_custom_call" in txt
            jax.jit(jax.grad(loss, argnums=1)).trace(p, e).lower(
                lowering_platforms=("tpu",))

    def test_dense_kernel_lowers_under_data_mesh(self):
        """GSPMD cannot partition Mosaic kernels (NotImplementedError at
        lowering); with the registered data mesh the shard_map wrapper must
        make the SAME data-sharded grad program lower for TPU."""
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
        from tgt_tpu.ops.pallas import triplet_dense as td
        from tgt_tpu.ops.triplet import triplet_attention_init
        n, h, w, b = 48, 16, 256, 8
        e = jnp.zeros((b, n, n, w), jnp.bfloat16)
        mask = jnp.zeros((b, n, n, 1), jnp.bfloat16)
        p = jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                         triplet_attention_init(jax.random.PRNGKey(0), w, h))
        mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
        sh = NamedSharding(mesh, P("data"))
        rep = NamedSharding(mesh, P())
        fn = functools.partial(td.triplet_attention_dense, num_heads=h,
                               interpret=False)  # pin compiled Mosaic path

        def loss(pp, ee):
            return (fn(pp, ee, mask).astype(jnp.float32) ** 2).sum()

        def make_jit():
            # fresh jit per trace: the registered mesh is read at TRACE
            # time, and jit would otherwise serve the cached pre-mesh jaxpr
            return jax.jit(jax.grad(loss, argnums=1),
                           in_shardings=(jax.tree.map(lambda _: rep, p), sh))

        with pytest.raises(NotImplementedError, match="shard_map"):
            make_jit().trace(p, e).lower(lowering_platforms=("tpu",))
        td.set_dense_data_mesh(mesh)
        try:
            txt = make_jit().trace(p, e).lower(
                lowering_platforms=("tpu",)).as_text()
        finally:
            td.set_dense_data_mesh(None)
        assert "tpu_custom_call" in txt


class TestModelIntegration:
    def test_full_model_with_pallas_matches_jnp(self, inputs):
        """use_pallas=True through the encoder flag (interpret mode)."""
        from tests.conftest import make_synthetic_batch
        from tgt_tpu.models import TGTConfig, make_model
        cfg = TGTConfig(node_width=16, edge_width=16, num_heads=4,
                        model_height=2, triplet_heads=2,
                        triplet_type="attention", num_dist_bins=8)
        init, apply = make_model("gap")
        params = init(jax.random.PRNGKey(0), cfg)
        batch = make_synthetic_batch(jax.random.PRNGKey(0), b=2, n=8, seed=4)
        ref = apply(params, batch, cfg)
        fused = apply(params, batch, cfg.replace(use_pallas=True))
        np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                                   rtol=5e-3, atol=5e-3)

    def test_full_model_with_dense_kernel_matches_jnp(self):
        """use_pallas='dense' through the encoder flag at a geometry the
        dense kernel accepts (n*h = d*h = 128); dense_min_nodes=0 forces
        the kernel below the measured production crossover."""
        from tests.conftest import make_synthetic_batch
        from tgt_tpu.models import TGTConfig, make_model
        cfg = TGTConfig(node_width=32, edge_width=128, num_heads=4,
                        model_height=2, triplet_heads=8,
                        triplet_type="attention", num_dist_bins=8)
        init, apply = make_model("gap")
        params = init(jax.random.PRNGKey(0), cfg)
        batch = make_synthetic_batch(jax.random.PRNGKey(0), b=2, n=16, seed=4)
        ref = apply(params, batch, cfg)
        dense = apply(params, batch, cfg.replace(use_pallas="dense",
                                                 dense_min_nodes=0))
        np.testing.assert_allclose(np.asarray(dense), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)

    def test_dense_min_nodes_gates_kernel_per_bucket(self, monkeypatch):
        """Buckets below dense_min_nodes take the XLA path, buckets at or
        above it take the kernel — the measured per-bucket crossover
        (campaign_r4: kernel LOSES 0.8x at n=24/40, wins 1.22x at 48)."""
        from tests.conftest import make_synthetic_batch
        from tgt_tpu.models import TGTConfig, make_model
        import tgt_tpu.ops.pallas.triplet_dense as td
        calls = []
        orig = td.triplet_attention_dense
        monkeypatch.setattr(
            td, "triplet_attention_dense",
            lambda *a, **k: (calls.append(a[1].shape[1]), orig(*a, **k))[1])
        cfg = TGTConfig(node_width=32, edge_width=128, num_heads=4,
                        model_height=2, triplet_heads=8,
                        triplet_type="attention", num_dist_bins=8,
                        use_pallas="dense", dense_min_nodes=32)
        init, apply = make_model("gap")
        params = init(jax.random.PRNGKey(0), cfg)
        below = make_synthetic_batch(jax.random.PRNGKey(0), b=1, n=16, seed=1)
        apply(params, below, cfg)
        assert calls == []            # n=16 < 32: XLA path
        at = make_synthetic_batch(jax.random.PRNGKey(0), b=1, n=32, seed=1)
        apply(params, at, cfg)
        assert calls == [32]          # n=32 >= 32: kernel

    def test_dense_exact_bucket_rule(self, monkeypatch):
        """Round-5 crossover: lane-exact buckets (no j-padding) run the
        kernel from dense_min_exact_nodes up, j-PADDED buckets only from
        dense_min_nodes up (campaign_r5: dense wins 32/48/56, loses the
        padded 24/40)."""
        from tests.conftest import make_synthetic_batch
        from tgt_tpu.models import TGTConfig, make_model
        import tgt_tpu.ops.pallas.triplet_dense as td
        calls = []
        orig = td.triplet_attention_dense
        monkeypatch.setattr(
            td, "triplet_attention_dense",
            lambda *a, **k: (calls.append(a[1].shape[1]), orig(*a, **k))[1])
        # d*h = 128, and n*h % 128 == 0 for n in {24, 32}; _jpad(24) = 32
        cfg = TGTConfig(node_width=32, edge_width=128, num_heads=4,
                        model_height=2, triplet_heads=16,
                        triplet_type="attention", num_dist_bins=8,
                        use_pallas="dense", dense_min_nodes=48,
                        dense_min_exact_nodes=32)
        init, apply = make_model("gap")
        params = init(jax.random.PRNGKey(0), cfg)
        padded = make_synthetic_batch(jax.random.PRNGKey(0), b=1, n=24,
                                      seed=1)
        apply(params, padded, cfg)
        assert calls == []            # 24 is j-padded and < 48: XLA
        exact = make_synthetic_batch(jax.random.PRNGKey(0), b=1, n=32,
                                     seed=1)
        apply(params, exact, cfg)
        assert calls == [32]          # 32 is lane-exact and >= 32: kernel


class TestDenseKernelDropout:
    """In-kernel triplet dropout (round 5): hash-based keep masks applied to
    the gated weights inside the fused kernel — closes the last dense-kernel
    fallback (attention_dropout > 0 in training previously fell back to jnp
    with a warning). The mask is a pure function of (per-b seed, global
    element index), so the backward reproduces the forward's mask despite
    partitioning the j grid into different block sizes."""

    RATE = 0.3

    def test_hash_mask_statistics(self):
        from tgt_tpu.ops.pallas.triplet_dense import _hash_keepf
        lin = jnp.arange(1 << 17, dtype=jnp.int32)
        m0 = np.asarray(_hash_keepf(lin, jnp.int32(1234), self.RATE))
        keep_frac = (m0 > 0).mean()
        assert abs(keep_frac - (1 - self.RATE)) < 0.01
        # inverted dropout preserves expectation
        assert abs(m0.mean() - 1.0) < 0.02
        # a different seed decorrelates the stream
        m1 = np.asarray(_hash_keepf(lin, jnp.int32(1235), self.RATE))
        agree = ((m0 > 0) == (m1 > 0)).mean()
        expected = (1 - self.RATE) ** 2 + self.RATE ** 2
        assert abs(agree - expected) < 0.02

    @staticmethod
    def _core_inputs(b=2, n=16, h=8, d=16, rate=0.3):
        ks = jax.random.split(jax.random.PRNGKey(7), 6)
        q = jax.random.normal(ks[0], (b, n, n, d, h)) * 0.4
        k = jax.random.normal(ks[1], (b, n, n, d, h)) * 0.4
        v = jax.random.normal(ks[2], (b, n, n, d, h)) * 0.4
        bias = jax.random.normal(ks[3], (b, n, n, h)) * 0.4
        gate = jax.random.normal(ks[4], (b, n, n, h)) * 0.4
        seed = jax.random.randint(ks[5], (b, 1), 0,
                                  jnp.iinfo(jnp.int32).max, dtype=jnp.int32)
        return q, k, v, bias, gate, seed

    @staticmethod
    def _core_oracle(q, k, v, bias, gate, seed, rate):
        """Pure-jnp math of _dense_core with the SAME injected hash mask."""
        from tgt_tpu.ops.pallas.triplet_dense import _hash_keepf
        b, n, nj, d, h = q.shape
        s = jnp.einsum("bijdh,bjkdh->bjikh", q, k) + bias[:, None]
        pn = jax.nn.softmax(s, axis=3)
        a = pn * jax.nn.sigmoid(gate)[:, None]
        jj = jnp.arange(nj, dtype=jnp.int32)[None, :, None, None, None]
        ii = jnp.arange(n, dtype=jnp.int32)[None, None, :, None, None]
        kk = jnp.arange(n, dtype=jnp.int32)[None, None, None, :, None]
        hh = jnp.arange(h, dtype=jnp.int32)[None, None, None, None, :]
        lin = (jj * n + ii) * (n * h) + kk * h + hh
        maskf = _hash_keepf(lin, seed[:, 0][:, None, None, None, None], rate)
        va = jnp.einsum("bjikh,bjkdh->bjidh", a * maskf, v)
        return va.reshape(b, nj, n, d * h)

    def test_core_fwd_and_grads_match_injected_mask_oracle(self):
        """_dense_core with dropout == the einsum oracle using the same
        mask, for the forward AND every input gradient (the grads passing
        proves the backward kernel regenerates the forward's exact mask)."""
        from tgt_tpu.ops.pallas.triplet_dense import _dense_core
        rate = self.RATE
        q, k, v, bias, gate, seed = self._core_inputs(rate=rate)

        got = _dense_core(q, k, v, bias, gate, seed, True, True, rate)
        ref = self._core_oracle(q, k, v, bias, gate, seed, rate)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

        def loss_kern(*args):
            return (_dense_core(*args, seed, True, True, rate) ** 2).sum()

        def loss_ref(*args):
            return (self._core_oracle(*args, seed, rate) ** 2).sum()

        g_kern = jax.grad(loss_kern, argnums=(0, 1, 2, 3, 4))(
            q, k, v, bias, gate)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(
            q, k, v, bias, gate)
        for name, a, b_ in zip("qkv bias gate".split() + ["4", "5"],
                               jax.tree.leaves(g_ref),
                               jax.tree.leaves(g_kern)):
            a, b_ = np.asarray(a), np.asarray(b_)
            scale = np.abs(a).max() + 1e-9
            np.testing.assert_allclose(b_ / scale, a / scale, rtol=0,
                                       atol=2e-5, err_msg=name)

    # (24, 16) is lane-dense (24*16=384) but NOT a JBLK multiple: it
    # exercises the j-padded kernel with dropout (padded j rows draw
    # masks too; their cotangents are zero so grads stay exact)
    @pytest.mark.parametrize("n,h", [(16, 8), (24, 16)])
    def test_public_path_matches_jnp_with_injected_masks(self, monkeypatch,
                                                         n, h):
        """triplet_attention(use_pallas='dense', dropout>0) == the jnp path
        when the jnp path's dropout is monkeypatched to draw the kernel's
        hash masks (same seed derivation, same per-direction rng splits) —
        full-path equality incl. both directions and the node mask."""
        import tgt_tpu.ops.triplet as tmod
        from tgt_tpu.ops.pallas.triplet_dense import _hash_keepf
        rate, b, w = self.RATE, 2, 128
        p = triplet_attention_init(jax.random.PRNGKey(0), w, h, gated=True)
        e = jax.random.normal(jax.random.PRNGKey(2), (b, n, n, w)) * 0.5
        nm = np.ones((b, n), np.float32)
        nm[1, n - 3:] = 0
        mask = additive_mask_from_node_mask(jnp.asarray(nm))
        rng = jax.random.PRNGKey(42)

        def hash_dropout(r_dir, a, rate_, deterministic):
            # a: (b, j, h, i, k) native dot-order — same mask the kernel
            # draws for (seed[b], j, i, k*h+hh)
            assert not deterministic and rate_ == rate
            bb, jj_n, hh_n, ii_n, kk_n = a.shape
            seeds = jax.random.randint(r_dir, (bb, 1), 0,
                                       jnp.iinfo(jnp.int32).max,
                                       dtype=jnp.int32)
            jj = jnp.arange(jj_n, dtype=jnp.int32)[:, None, None, None]
            hh = jnp.arange(hh_n, dtype=jnp.int32)[None, :, None, None]
            ii = jnp.arange(ii_n, dtype=jnp.int32)[None, None, :, None]
            kk = jnp.arange(kk_n, dtype=jnp.int32)[None, None, None, :]
            lin = (jj * ii_n + ii) * (kk_n * hh_n) + kk * hh_n + hh
            maskf = _hash_keepf(lin[None],
                                seeds[:, 0][:, None, None, None, None],
                                rate_)
            return a * maskf

        monkeypatch.setattr(tmod, "dropout", hash_dropout)
        ref = triplet_attention(p, e, mask, num_heads=h,
                                attention_dropout=rate, deterministic=False,
                                rng=rng)
        with warnings.catch_warnings():
            warnings.simplefilter("error")  # a fallback would warn -> fail
            got = triplet_attention(p, e, mask, num_heads=h,
                                    attention_dropout=rate,
                                    deterministic=False,
                                    rng=rng, use_pallas="dense")
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

        def loss(fn_kwargs, pp, ee):
            return (triplet_attention(pp, ee, mask, num_heads=h,
                                      attention_dropout=rate,
                                      deterministic=False, rng=rng,
                                      **fn_kwargs) ** 2).sum()

        g_ref = jax.grad(loss, argnums=(1, 2))({}, p, e)
        g_den = jax.grad(loss, argnums=(1, 2))({"use_pallas": "dense"}, p, e)
        for a, b_ in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_den)):
            a, b_ = np.asarray(a), np.asarray(b_)
            scale = np.abs(a).max() + 1e-9
            np.testing.assert_allclose(b_ / scale, a / scale, rtol=0,
                                       atol=2e-4)

    def test_no_fallback_warning_and_rate0_unchanged(self):
        """dropout>0 with use_pallas='dense' must NOT warn/fall back any
        more; dropout=0 in training mode must stay bitwise identical to the
        deterministic kernel program (no seed input is added)."""
        b, n, w, h = 2, 16, 128, 8
        p = triplet_attention_init(jax.random.PRNGKey(0), w, h, gated=True)
        e = jax.random.normal(jax.random.PRNGKey(2), (b, n, n, w)) * 0.5
        mask = jnp.zeros((b, n, n, 1))
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            out = triplet_attention(p, e, mask, num_heads=h,
                                    attention_dropout=self.RATE,
                                    deterministic=False,
                                    rng=jax.random.PRNGKey(1),
                                    use_pallas="dense")
        assert np.isfinite(np.asarray(out, np.float32)).all()
        det = triplet_attention(p, e, mask, num_heads=h, use_pallas="dense")
        assert not np.allclose(np.asarray(out), np.asarray(det))
        # rate 0, training mode: exact deterministic program
        out0 = triplet_attention(p, e, mask, num_heads=h,
                                 attention_dropout=0.0, deterministic=False,
                                 rng=jax.random.PRNGKey(1),
                                 use_pallas="dense")
        np.testing.assert_array_equal(np.asarray(out0), np.asarray(det))
