"""Edge-block (pair-axis) ring execution for triplet attention.

The north-star capability the reference lacks (SURVEY.md §5.7): shard the
(N, N) pair grid of the edge channel over the ``pair`` mesh axis on the
first node axis (i-blocks), and compute the O(N^3) triplet interaction with a
ring exchange of j-blocks over ICI, overlapping each collective hop with the
on-chip block computation — the graph analog of ring attention.

Decomposition (in-direction; the out-direction mirrors with transposed
operands — see ops/pallas/triplet_attention.py for the shared per-j algebra):

  out[i, j] = sum_k softmax_k(Q[i, j]·K[j, k] + E[i, k]) * sig(G[i,k]) V[j, k]

With e sharded on i-blocks:
  - Q rows, E/G bias rows, and output rows (i-local) stay local;
  - K/V j-row-blocks live on the device owning row j and rotate around the
    ring via ``lax.ppermute``; each of the P steps computes the local
    (i_local, j_block) output tile while the next block is in flight.

Per layer the ring moves K/V once around (the all-gather volume), but peak
memory per device drops by P and each hop overlaps with a block's compute.

Used under ``jax.shard_map`` with the ``pair`` axis of parallel/mesh.py;
``tests/test_ring.py`` asserts equality with the unsharded oracle on the
virtual CPU mesh.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from tgt_tpu.parallel.mesh import PAIR_AXIS


def ring_pass(x: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """Send to the next device on the ring (wrapping)."""
    n = jax.lax.axis_size(axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]
    return jax.lax.ppermute(x, axis_name, perm)


def _block_attention(q_blk, k_blk, v_blk, bias, gate, scale,
                     dropout_rate=0.0, rng=None):
    """One (i_local, j_block) tile of per-j biased (optionally gated)
    attention.

    q_blk: (b, i_loc, j_blk, d, h) — Q rows for local i, block j columns
    k_blk/v_blk: (b, j_blk, N, d, h) — K/V rows for the j block
    bias/gate: (b, i_loc, N, h) — additive bias over k (mask folded in);
    gate=None for the ungated variants
    returns (b, i_loc, j_blk, d, h)
    """
    from tgt_tpu.ops.common import dropout

    # k-minor logits layout (matches ops/triplet._triplet_attention_impl;
    # NOTE warm-measured EQUAL to h-minor — layout kept for consistency,
    # not speed: CLAUDE.md measurement rule retracted the early "2.98x")
    s = jnp.einsum("bijdh,bjkdh->bijhk", q_blk * scale, k_blk)
    s = s + jnp.swapaxes(bias, 2, 3)[:, :, None]
    a = jax.nn.softmax(s.astype(jnp.float32), axis=-1)
    if gate is not None:
        a = a * jax.nn.sigmoid(
            jnp.swapaxes(gate, 2, 3).astype(jnp.float32))[:, :, None]
    if rng is not None and dropout_rate > 0.0:
        # per-block mask: same DISTRIBUTION as the unsharded op's single
        # N^3 mask (each (i,j,k) element is computed on exactly one device)
        a = dropout(rng, a, dropout_rate, deterministic=False)
    return jnp.einsum("bijhk,bjkdh->bijdh", a.astype(v_blk.dtype), v_blk)


def ring_triplet_direction(q_local: jnp.ndarray, k_local: jnp.ndarray,
                           v_local: jnp.ndarray, bias_local: jnp.ndarray,
                           gate_local: jnp.ndarray, scale: float,
                           axis_name: str = PAIR_AXIS,
                           attention_dropout: float = 0.0,
                           rng=None) -> jnp.ndarray:
    """One triplet direction under i-block sharding with a j-block ring.

    Shapes (per device, inside shard_map):
      q_local:    (b, i_loc, N, d, h)   Q[i, j] for local i rows, all j
      k_local:    (b, j_loc, N, d, h)   K[j, k] for local j rows, all k
      v_local:    (b, j_loc, N, d, h)
      bias_local: (b, i_loc, N, h)      E[i, k] + mask for local i rows
      gate_local: (b, i_loc, N, h)      G[i, k] + mask
    Returns out_local (b, i_loc, N, d, h): output rows for local i, all j.

    The j dimension of the output is assembled block-by-block as K/V blocks
    arrive around the ring; compute on block t overlaps the ppermute of
    block t+1 (XLA schedules the independent ops concurrently).
    """
    p = jax.lax.axis_size(axis_name)
    my = jax.lax.axis_index(axis_name)
    b, i_loc, n, d, h = q_local.shape
    j_blk = k_local.shape[1]
    # independent dropout bits per (i-block owner, j-block): every global
    # (i,j,k) element gets exactly one mask draw
    blk_rng = None if rng is None else jax.random.fold_in(rng, my)

    def step(carry, t):
        k_blk, v_blk = carry
        # which global j-block is this? blocks rotate: at step t we hold the
        # block originally owned by device (my - t) mod p
        src = (my - t) % p
        q_blk = jax.lax.dynamic_slice_in_dim(q_local, src * j_blk, j_blk,
                                             axis=2)
        step_rng = None if blk_rng is None else jax.random.fold_in(blk_rng,
                                                                   src)
        out_blk = _block_attention(q_blk, k_blk, v_blk, bias_local,
                                   gate_local, scale,
                                   dropout_rate=attention_dropout,
                                   rng=step_rng)
        next_k = ring_pass(k_blk, axis_name)
        next_v = ring_pass(v_blk, axis_name)
        return (next_k, next_v), (src, out_blk)

    (_, _), (srcs, out_blocks) = jax.lax.scan(
        step, (k_local, v_local), jnp.arange(p))

    # out_blocks: (p, b, i_loc, j_blk, d, h) with global block index srcs[t];
    # scatter back into j order. pcast marks the zeros as device-varying so
    # the fori carry types match (the updates depend on axis_index).
    out = jax.lax.pcast(jnp.zeros((b, i_loc, n, d, h), out_blocks.dtype),
                        axis_name, to="varying")

    def place(t, acc):
        blk = out_blocks[t]
        return jax.lax.dynamic_update_slice_in_dim(acc, blk, srcs[t] * j_blk,
                                                   axis=2)

    out = jax.lax.fori_loop(0, p, place, out)
    return out


def triplet_attention_ring(params, e_local: jnp.ndarray,
                           mask_local: jnp.ndarray, *, num_heads: int,
                           gated: bool = True,
                           axis_name: str = PAIR_AXIS,
                           attention_dropout: float = 0.0,
                           deterministic: bool = True,
                           rng=None) -> jnp.ndarray:
    """Full gated/ungated triplet attention under pair-axis i-block sharding.

    e_local: (b, i_loc, N, W) — the edge channel sharded on the first node
    axis. mask_local: (b, i_loc, N, 1) additive. Must run inside shard_map
    with ``axis_name`` mapped over the pair mesh axis. Semantics match
    ops/triplet.triplet_attention for the gathered result.

    Note the layernorm is row-local (per-(i,j) over W) so i-sharding
    commutes with it.
    """
    from tgt_tpu.ops.common import layernorm, linear

    b, i_loc, n, w = e_local.shape
    h = num_heads
    d = w // h
    scale = d ** -0.5
    e_ln = layernorm(params["tri_ln_e"], e_local)
    m3 = mask_local[..., 0]
    use_dropout = (not deterministic) and attention_dropout > 0.0 \
        and rng is not None
    r_in, r_out = jax.random.split(rng) if use_dropout else (None, None)
    drop_rate = attention_dropout if use_dropout else 0.0

    def heads(x):
        return x.reshape(b, i_loc, n, d, h)

    # ---- in direction -------------------------------------------------
    q, k, v = map(heads, jnp.split(linear(params["lin_QKV_in"], e_ln), 3, -1))
    if gated:
        e_b, g_b = jnp.split(linear(params["lin_EG_in"], e_ln), 2, -1)
        gate = g_b + m3[..., None]
    else:
        e_b = linear(params["lin_E_in"], e_ln)
        gate = None
    bias = e_b + m3[..., None]
    # q rows are i-local with j columns ✓; k/v rows are j-local (the i axis
    # of e_local IS the j-row owner axis for K/V) ✓
    va_in = ring_triplet_direction(q, k, v, bias, gate, scale, axis_name,
                                   attention_dropout=drop_rate, rng=r_in)

    # ---- out direction ------------------------------------------------
    # out[i,j] = sum_k softmax_k(Q[i,j]·K[k,j] + E_out[k,i]) V[k,j]
    # == the in-direction with K' = K^T, V' = V^T, E' = E_out^T (pair-axes
    # transposed), Q unchanged, output directly (i, j). Under i-sharding the
    # pair transpose is an all_to_all over the ring axis.
    q2, k2, v2 = map(heads, jnp.split(linear(params["lin_QKV_out"], e_ln),
                                      3, -1))
    if gated:
        e_b2, g_b2 = jnp.split(linear(params["lin_EG_out"], e_ln), 2, -1)
        gate2 = _pair_transpose_bias(g_b2 + m3[..., None], axis_name)
    else:
        e_b2 = linear(params["lin_E_out"], e_ln)
        gate2 = None
    kt = _pair_transpose(k2, axis_name)
    vt = _pair_transpose(v2, axis_name)
    bias2 = _pair_transpose_bias(e_b2 + m3[..., None], axis_name)
    va_out = ring_triplet_direction(q2, kt, vt, bias2, gate2, scale,
                                    axis_name,
                                    attention_dropout=drop_rate, rng=r_out)

    va = jnp.concatenate([va_in, va_out], axis=-1).reshape(b, i_loc, n, 2 * w)
    return linear(params["lin_O"], va)


def ring_aggregate_direction(a_local: jnp.ndarray, v_local: jnp.ndarray,
                             axis_name: str = PAIR_AXIS) -> jnp.ndarray:
    """One triplet-AGGREGATE direction under i-block sharding.

    out[i, j] = sum_k a[i, k, h] * v[j, k, d, h] — the attention weights are
    N^2 and i-row-local; only the V j-blocks ring around.

    a_local: (b, i_loc, N, h)     weights for local i rows (softmax*gate done)
    v_local: (b, j_loc, N, d, h)  V rows owned by this device
    Returns (b, i_loc, N, d, h): output rows for local i, all j.
    """
    p = jax.lax.axis_size(axis_name)
    my = jax.lax.axis_index(axis_name)
    b, i_loc, n, h = a_local.shape
    j_blk, d = v_local.shape[1], v_local.shape[3]

    def step(carry, t):
        v_blk = carry
        src = (my - t) % p
        out_blk = jnp.einsum("bikh,bjkdh->bijdh", a_local, v_blk)
        return ring_pass(v_blk, axis_name), (src, out_blk)

    _, (srcs, out_blocks) = jax.lax.scan(step, v_local, jnp.arange(p))

    out = jax.lax.pcast(jnp.zeros((b, i_loc, n, d, h), out_blocks.dtype),
                        axis_name, to="varying")

    def place(t, acc):
        return jax.lax.dynamic_update_slice_in_dim(
            acc, out_blocks[t], srcs[t] * j_blk, axis=2)

    return jax.lax.fori_loop(0, p, place, out)


def triplet_aggregate_ring(params, e_local: jnp.ndarray,
                           mask_local: jnp.ndarray, *, num_heads: int,
                           gated: bool = True,
                           axis_name: str = PAIR_AXIS,
                           attention_dropout: float = 0.0,
                           deterministic: bool = True,
                           rng=None) -> jnp.ndarray:
    """Gated/ungated triplet aggregation under pair-axis i-block sharding.

    Semantics match ops/triplet.triplet_aggregate{,_ungated} for the gathered
    result, including the gated variant's UNMASKED out-direction quirk
    (reference lib/tgt/layers/triplet.py:63-64). attention_dropout applies to
    the N^2 weights like the unsharded op (device-index-folded keys: the
    weights are i-row-local, so masks are drawn once per element).
    """
    from tgt_tpu.ops.common import dropout, layernorm, linear

    b, i_loc, n, w = e_local.shape
    h = num_heads
    d = w // h
    e_ln = layernorm(params["tri_ln_e"], e_local)
    use_dropout = (not deterministic) and attention_dropout > 0.0 \
        and rng is not None
    if use_dropout:
        my = jax.lax.axis_index(axis_name)
        r_in, r_out = jax.random.split(jax.random.fold_in(rng, my))
    else:
        r_in, r_out = None, None

    v_in, v_out = jnp.split(linear(params["lin_V"], e_ln), 2, axis=-1)
    v_in = v_in.reshape(b, i_loc, n, d, h)
    v_out = v_out.reshape(b, i_loc, n, d, h)
    if gated:
        e_in, g_in, e_out, g_out = jnp.split(
            linear(params["lin_EG"], e_ln), 4, axis=-1)
    else:
        e_in, e_out = jnp.split(linear(params["lin_E"], e_ln), 2, axis=-1)

    # in direction: weights (i, k) are row-local
    if gated:
        a_in = jax.nn.softmax(e_in + mask_local, axis=2) \
            * jax.nn.sigmoid(g_in + mask_local)
    else:
        a_in = jax.nn.softmax(e_in + mask_local, axis=2)
    if r_in is not None:
        a_in = dropout(r_in, a_in, attention_dropout, deterministic=False)
    va_in = ring_aggregate_direction(a_in, v_in, axis_name)

    # out direction: pair-transposed weights/V (all_to_all), then same ring.
    e_out_t = _pair_transpose_bias(
        e_out if gated else e_out + mask_local, axis_name)
    if gated:
        # reference quirk: out-direction softmax/gates NOT masked
        a_out = jax.nn.softmax(e_out_t, axis=2) \
            * jax.nn.sigmoid(_pair_transpose_bias(g_out, axis_name))
    else:
        a_out = jax.nn.softmax(e_out_t, axis=2)
    if r_out is not None:
        a_out = dropout(r_out, a_out, attention_dropout, deterministic=False)
    v_out_t = _pair_transpose(v_out, axis_name)
    va_out = ring_aggregate_direction(a_out, v_out_t, axis_name)

    va = jnp.concatenate([va_in, va_out], axis=-1).reshape(b, i_loc, n, 2 * w)
    return linear(params["lin_O"], va)


def _pair_transpose(x: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """Transpose the two node axes of an i-sharded (b, i_loc, N, ...) tensor,
    returning the result sharded the same way (all_to_all over the pair axis).
    """
    p = jax.lax.axis_size(axis_name)
    b, i_loc, n = x.shape[:3]
    if n % p != 0:
        raise ValueError(f"pair-sharded node axis {n} must divide the ring "
                         f"size {p} (pad N to a multiple of the pair axis)")
    blk = n // p
    # split the full axis into p blocks: (b, i_loc, p, blk, ...)
    xs = x.reshape(x.shape[0], i_loc, p, blk, *x.shape[3:])
    # all_to_all: exchange so each device gets its column block of every row
    xt = jax.lax.all_to_all(xs, axis_name, split_axis=2, concat_axis=2,
                            tiled=False)
    # xt: (b, i_loc, p, blk, ...) where axis 2 indexes source devices =
    # global i-block; reassemble global-i axis then swap with local columns
    xt = jnp.moveaxis(xt, 2, 1)                     # (b, p, i_loc, blk, ...)
    xt = xt.reshape(x.shape[0], p * i_loc, blk, *x.shape[3:])
    return jnp.swapaxes(xt, 1, 2)                   # (b, blk, N, ...)


def _pair_transpose_bias(bias: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """Same pair-transpose for (b, i_loc, N, h) bias tensors."""
    return _pair_transpose(bias, axis_name)
