"""Ring attention: sequence-parallel exact attention over a mesh axis.

For DiT at 256x256 latents (patch 2 => 16384 tokens) a single chip can hold
the sequence, but at pod scale the token axis is sharded. This implements
exact (non-approximate) attention over a token-sharded sequence using the
ring schedule: each device holds one Q/K/V token block; K/V blocks rotate
around the ring with ``jax.lax.ppermute`` while each device accumulates its
queries' output with the online-softmax (log-sum-exp) merge — the same
math as flash attention's streaming accumulation, lifted to the inter-chip
level. Communication rides ICI; compute overlaps with the next rotation in
XLA's pipeline.

The reference has no distributed execution at all (SURVEY §2.3); this is a
new TPU capability, exposed as ``ring_attention`` (inside shard_map) and
``ring_attention_sharded`` (host-level: takes a mesh + sharded arrays).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

Array = jax.Array


def _block_attn(q, k, v, scale):
    """One Q-block vs one K/V-block: returns (m, l, o) partials in fp32.

    q: [B, Tq, H, D], k/v: [B, Tk, H, D]
    m: [B, H, Tq] row max; l: [B, H, Tq] row sum; o: [B, Tq, H, D].
    """
    s = (
        jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
        * scale
    )
    m = jnp.max(s, axis=-1)  # [B, H, Tq]
    p = jnp.exp(s - m[..., None])
    l = jnp.sum(p, axis=-1)  # [B, H, Tq]
    o = jnp.einsum(
        "bhqk,bkhd->bqhd", p.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    return m, l, o.astype(jnp.float32)


def ring_attention(q: Array, k: Array, v: Array, *, axis_name: str) -> Array:
    """Exact attention with K/V rotating around the ``axis_name`` ring.

    Call INSIDE shard_map. q/k/v: the local [B, T_local, H, D] token blocks.
    Returns the local output block [B, T_local, H, D] in q's dtype.
    """
    axis_size = jax.lax.psum(1, axis_name)
    d = q.shape[-1]
    scale = 1.0 / math.sqrt(d)

    m0, l0, o0 = _block_attn(q, k, v, scale)

    def step(i, carry):
        m, l, o, k_blk, v_blk = carry
        perm = [(j, (j + 1) % axis_size) for j in range(axis_size)]
        k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
        v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
        m_b, l_b, o_b = _block_attn(q, k_blk, v_blk, scale)
        # online-softmax merge of the new block into the running state
        m_new = jnp.maximum(m, m_b)
        alpha = jnp.exp(m - m_new)  # [B, H, Tq]
        beta = jnp.exp(m_b - m_new)
        l = l * alpha + l_b * beta
        a_t = jnp.transpose(alpha, (0, 2, 1))[..., None]  # [B, Tq, H, 1]
        b_t = jnp.transpose(beta, (0, 2, 1))[..., None]
        o = o * a_t + o_b * b_t
        return m_new, l, o, k_blk, v_blk

    m, l, o, _, _ = jax.lax.fori_loop(0, axis_size - 1, step, (m0, l0, o0, k, v))
    l_t = jnp.transpose(l, (0, 2, 1))[..., None]  # [B, Tq, H, 1]
    return (o / l_t).astype(q.dtype)


def ring_attention_sharded(
    q: Array, k: Array, v: Array, mesh: Mesh, *, seq_axis: str = "seq"
) -> Array:
    """Host-level entry: token-sharded [B, T, H, D] in/out over ``seq_axis``."""
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    spec = P(None, seq_axis, None, None)
    fn = shard_map(
        functools.partial(ring_attention, axis_name=seq_axis),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
    )
    return fn(q, k, v)


def reference_attention(q: Array, k: Array, v: Array) -> Array:
    """Unsharded ground truth for tests: [B, T, H, D]."""
    d = q.shape[-1]
    s = (
        jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
        / math.sqrt(d)
    )
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    return jnp.einsum(
        "bhqk,bkhd->bqhd", p, v, preferred_element_type=jnp.float32
    ).astype(q.dtype)
