"""Unit tests for the core ops against numpy oracles."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.conftest import make_synthetic_batch
from tgt_tpu.core.graph import MASK_VALUE, additive_mask_from_node_mask
from tgt_tpu.ops.activations import get_activation
from tgt_tpu.ops.attention import (edge_update, edge_update_init,
                                   egt_attention, egt_attention_init)
from tgt_tpu.ops.common import layernorm, layernorm_init, linear, linear_init
from tgt_tpu.ops.ffn import ffn, ffn_init
from tgt_tpu.ops.triplet import (TRIPLET_VARIANTS, get_triplet_apply,
                                 get_triplet_init)


def np_softmax(x, axis):
    x = x - x.max(axis=axis, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=axis, keepdims=True)


def np_sigmoid(x):
    # numerically stable both tails (avoids overflow RuntimeWarnings)
    return np.where(x >= 0, 1 / (1 + np.exp(-np.abs(x))),
                    np.exp(-np.abs(x)) / (1 + np.exp(-np.abs(x))))


def np_layernorm(p, x, eps=1e-5):
    mean = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mean) / np.sqrt(var + eps) * np.asarray(p["scale"]) + np.asarray(p["bias"])


def np_linear(p, x):
    return x @ np.asarray(p["w"]) + np.asarray(p["b"])


@pytest.fixture(scope="module")
def he_mask():
    rs = np.random.RandomState(1)
    b, n, wh, we = 2, 6, 16, 8
    h = rs.randn(b, n, wh).astype(np.float32)
    e = rs.randn(b, n, n, we).astype(np.float32)
    node_mask = np.ones((b, n), np.float32)
    node_mask[1, 4:] = 0
    mask = np.asarray(additive_mask_from_node_mask(jnp.asarray(node_mask)))
    return h, e, mask


class TestEGTAttention:
    def test_vs_numpy_oracle(self, rng, he_mask):
        h, e, mask = he_mask
        b, n, wh = h.shape
        we = e.shape[-1]
        heads = 4
        d = wh // heads
        p = egt_attention_init(rng, wh, we, heads)
        out_h, out_e = jax.jit(functools.partial(
            egt_attention, num_heads=heads))(p, h, e, mask)

        # numpy oracle
        h_ln = np_layernorm(p["mha_ln_h"], h)
        e_ln = np_layernorm(p["mha_ln_e"], e)
        q, k, v = np.split(np_linear(p["lin_QKV"], h_ln), 3, -1)
        eb, gb = np.split(np_linear(p["lin_EG"], e_ln), 2, -1)
        q = q.reshape(b, n, d, heads) * d ** -0.5
        k = k.reshape(b, n, d, heads)
        v = v.reshape(b, n, d, heads)
        gates = np_sigmoid(gb + mask)
        h_hat = np.einsum("bldh,bmdh->blmh", q, k) + eb
        a = np_softmax(h_hat + mask, 2) * gates
        v_att = np.einsum("blmh,bmdh->bldh", a, v)
        v_att = v_att * np.log1p(gates.sum(2, keepdims=True))
        exp_h = np_linear(p["lin_O_h"], v_att.reshape(b, n, wh))
        exp_e = np_linear(p["lin_O_e"], h_hat)

        np.testing.assert_allclose(out_h, exp_h, rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(out_e, exp_e, rtol=2e-5, atol=2e-5)

    def test_masked_columns_do_not_affect_valid(self, rng, he_mask):
        """Changing padded-node h must not change valid outputs."""
        h, e, mask = he_mask
        heads = 4
        p = egt_attention_init(rng, h.shape[-1], e.shape[-1], heads)
        fn = jax.jit(functools.partial(egt_attention, num_heads=heads))
        out_h1, _ = fn(p, h, e, mask)
        h2 = h.copy()
        h2[1, 4:] += 100.0  # perturb padding nodes of graph 1
        out_h2, _ = fn(p, h2, e, mask)
        np.testing.assert_allclose(out_h1[1, :4], out_h2[1, :4], atol=1e-4)

    def test_source_dropout_masks_columns(self, rng, he_mask):
        h, e, mask = he_mask
        heads = 4
        p = egt_attention_init(rng, h.shape[-1], e.shape[-1], heads)
        fn = jax.jit(functools.partial(
            egt_attention, num_heads=heads, source_dropout=0.99,
            deterministic=False))
        out_h, _ = fn(p, h, e, mask, rng=jax.random.PRNGKey(3))
        assert np.all(np.isfinite(np.asarray(out_h)))

    def test_edge_update_qk_only(self, rng, he_mask):
        h, e, mask = he_mask
        heads = 4
        p = edge_update_init(rng, h.shape[-1], e.shape[-1], heads)
        out_h, out_e = jax.jit(functools.partial(
            edge_update, num_heads=heads))(p, h, e, mask)
        np.testing.assert_array_equal(out_h, h)  # node channel untouched
        assert out_e.shape == e.shape


class TestTriplet:
    @pytest.mark.parametrize("variant", TRIPLET_VARIANTS)
    def test_shapes_finite(self, rng, he_mask, variant):
        _, e, mask = he_mask
        heads = 2
        p = get_triplet_init(variant)(rng, e.shape[-1], heads)
        out = jax.jit(functools.partial(
            get_triplet_apply(variant), num_heads=heads))(p, e, mask)
        assert out.shape == e.shape
        assert np.all(np.isfinite(np.asarray(out)))

    def test_aggregate_vs_numpy(self, rng, he_mask):
        _, e, mask = he_mask
        b, n, _, w = e.shape
        heads = 2
        d = w // heads
        p = get_triplet_init("aggregate")(rng, w, heads)
        out = jax.jit(functools.partial(
            get_triplet_apply("aggregate"), num_heads=heads))(p, e, mask)

        e_ln = np_layernorm(p["tri_ln_e"], np.asarray(e))
        v_in, v_out = np.split(np_linear(p["lin_V"], e_ln), 2, -1)
        e_in, g_in, e_out, g_out = np.split(np_linear(p["lin_EG"], e_ln), 4, -1)
        v_in = v_in.reshape(b, n, n, d, heads)
        v_out = v_out.reshape(b, n, n, d, heads)
        a_in = np_softmax(e_in + mask, 2) * np_sigmoid(g_in + mask)
        va_in = np.einsum("bikh,bjkdh->bijdh", a_in, v_in)
        a_out = np_softmax(e_out, 1) * np_sigmoid(g_out)  # reference quirk: unmasked
        va_out = np.einsum("bkih,bkjdh->bijdh", a_out, v_out)
        va = np.concatenate([va_in, va_out], -1).reshape(b, n, n, 2 * w)
        exp = np_linear(p["lin_O"], va)
        np.testing.assert_allclose(out, exp, rtol=2e-5, atol=2e-5)

    def test_attention_vs_numpy(self, rng, he_mask):
        _, e, mask = he_mask
        b, n, _, w = e.shape
        heads = 2
        d = w // heads
        p = get_triplet_init("attention")(rng, w, heads)
        out = jax.jit(functools.partial(
            get_triplet_apply("attention"), num_heads=heads))(p, e, mask)

        e_ln = np_layernorm(p["tri_ln_e"], np.asarray(e))
        q, k, v = np.split(np_linear(p["lin_QKV_in"], e_ln), 3, -1)
        eb, gb = np.split(np_linear(p["lin_EG_in"], e_ln), 2, -1)
        q = q.reshape(b, n, n, d, heads) * d ** -0.5
        k = k.reshape(b, n, n, d, heads)
        v = v.reshape(b, n, n, d, heads)
        h_in = np.einsum("bijdh,bjkdh->bijkh", q, k) + eb[:, :, None]
        m_in = mask[:, :, None]
        a_in = np_softmax(h_in + m_in, 3) * np_sigmoid(gb[:, :, None] + m_in)
        va_in = np.einsum("bijkh,bjkdh->bijdh", a_in, v)

        q2, k2, v2 = np.split(np_linear(p["lin_QKV_out"], e_ln), 3, -1)
        eb2, gb2 = np.split(np_linear(p["lin_EG_out"], e_ln), 2, -1)
        q2 = q2.reshape(b, n, n, d, heads) * d ** -0.5
        k2 = k2.reshape(b, n, n, d, heads)
        v2 = v2.reshape(b, n, n, d, heads)
        h_out = np.einsum("bijdh,bkjdh->bkijh", q2, k2) + eb2[:, :, :, None]
        m_out = mask[:, :, :, None]
        a_out = np_softmax(h_out + m_out, 1) * np_sigmoid(gb2[:, :, :, None] + m_out)
        va_out = np.einsum("bkijh,bkjdh->bijdh", a_out, v2)

        va = np.concatenate([va_in, va_out], -1).reshape(b, n, n, 2 * w)
        exp = np_linear(p["lin_O"], va)
        np.testing.assert_allclose(out, exp, rtol=2e-4, atol=2e-4)

    def test_triangular_vs_numpy(self, rng, he_mask):
        _, e, mask = he_mask
        heads = 2
        w = e.shape[-1]
        p = get_triplet_init("triangular_update")(rng, w, heads)
        out = jax.jit(functools.partial(
            get_triplet_apply("triangular_update"), num_heads=heads))(p, e, mask)

        def sl(g, l):
            return np_sigmoid(g) * l

        e_ln = np_layernorm(p["tri_ln_e"], np.asarray(e))
        vig, vil, vog, vol = np.split(np_linear(p["lin_V"], e_ln), 4, -1)
        eig, eil, eog, eol = np.split(np_linear(p["lin_E"], e_ln), 4, -1)
        v_in = sl(vig + mask, vil)
        v_out = sl(vog + mask, vol)
        e_in = sl(eig + mask, eil)
        e_out = sl(eog + mask, eol)
        va = np.concatenate([
            np.einsum("bikh,bjkh->bijh", e_in, v_in),
            np.einsum("bkih,bkjh->bijh", e_out, v_out)], -1)
        og, ol = np.split(np_linear(p["lin_O"], va), 2, -1)
        exp = sl(og, ol)
        np.testing.assert_allclose(out, exp, rtol=2e-5, atol=2e-5)


class TestFFN:
    @pytest.mark.parametrize("act,mul", [("gelu", 1), ("geglu", 2),
                                         ("swiglu", 2), ("relu", 1)])
    def test_shapes_and_glu_width(self, rng, act, mul):
        _, act_mul = get_activation(act)
        assert act_mul == mul
        p = ffn_init(rng, 16, 2.0, act)
        assert p["lin_W1"]["w"].shape == (16, 32 * mul)
        x = jax.random.normal(rng, (3, 5, 16))
        out = jax.jit(functools.partial(ffn, activation=act))(p, x)
        assert out.shape == x.shape

    def test_gelu_is_exact_erf(self):
        """torch F.gelu defaults to the exact erf form."""
        fn, _ = get_activation("gelu")
        x = jnp.linspace(-3, 3, 11)
        import scipy.stats
        exp = np.asarray(x) * scipy.stats.norm.cdf(np.asarray(x))
        np.testing.assert_allclose(fn(x), exp, atol=1e-6)


class TestMask:
    def test_additive_mask(self):
        nm = jnp.asarray([[1, 1, 0]], jnp.float32)
        m = additive_mask_from_node_mask(nm)
        assert m.shape == (1, 3, 3, 1)
        assert m[0, 0, 0, 0] == 0
        assert m[0, 0, 2, 0] == MASK_VALUE
        assert m[0, 2, 2, 0] == MASK_VALUE
