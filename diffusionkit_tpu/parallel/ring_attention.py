"""Ring attention: context-parallel SDPA over a mesh axis.

True sequence parallelism for the joint text+image attention — each chip
holds seq/N queries, keys and values; K/V blocks rotate around the ring
(jax.lax.ppermute over ICI) while an online-softmax accumulator builds the
exact full-attention result. Per-chip memory is O(seq/N), never the full
sequence — the multi-chip extension of the single-chip flash kernel
(ops/flash_attention.py), and a capability the reference cannot express
(single Metal device, SURVEY.md parallelism accounting).

Collectives are XLA's (`ppermute` compiles to ICI neighbour exchanges), per
the scaling-book recipe: annotate, let XLA schedule, overlap with compute.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

NEG_INF = -1e30


def _ring_attention_local(q, k, v, scale: float, axis_name: str):
    """Per-shard body under shard_map: q/k/v (b, h, s_local, d)."""
    n = jax.lax.psum(1, axis_name)
    me = jax.lax.axis_index(axis_name)

    def step(carry, _):
        m, l, acc, k_blk, v_blk = carry
        s = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k_blk, preferred_element_type=jnp.float32
        ) * scale
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m, m_cur)
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        l_new = alpha * l + jnp.sum(p, axis=-1, keepdims=True)
        pv = jnp.einsum(
            "bhqk,bhkd->bhqd", p.astype(v_blk.dtype), v_blk,
            preferred_element_type=jnp.float32,
        )
        acc_new = acc * alpha + pv
        # Rotate K/V to the next chip in the ring.
        perm = [(i, (i + 1) % n) for i in range(n)]
        k_next = jax.lax.ppermute(k_blk, axis_name, perm)
        v_next = jax.lax.ppermute(v_blk, axis_name, perm)
        return (m_new, l_new, acc_new, k_next, v_next), None

    b, h, s_local, d = q.shape
    # Mark accumulators as device-varying so the scan carry types match
    # (shard_map's varying-axis typing).
    m0 = jax.lax.pvary(jnp.full((b, h, s_local, 1), NEG_INF, jnp.float32), axis_name)
    l0 = jax.lax.pvary(jnp.zeros((b, h, s_local, 1), jnp.float32), axis_name)
    acc0 = jax.lax.pvary(jnp.zeros((b, h, s_local, d), jnp.float32), axis_name)
    (m, l, acc, _, _), _ = jax.lax.scan(
        step, (m0, l0, acc0, k, v), None, length=n
    )
    del me
    return (acc / l).astype(q.dtype)


def ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float,
    mesh: Mesh,
    axis: str = "model",
):
    """Exact full attention with the sequence sharded over ``axis``.

    q/k/v: (B, H, S, D) global arrays (any current sharding); the result is
    returned sequence-sharded over ``axis``. S must divide the axis size.
    """
    seq_spec = P(None, None, axis, None)
    fn = jax.shard_map(
        partial(_ring_attention_local, scale=scale, axis_name=axis),
        mesh=mesh,
        in_specs=(seq_spec, seq_spec, seq_spec),
        out_specs=seq_spec,
    )
    sharding = NamedSharding(mesh, seq_spec)
    q, k, v = (jax.device_put(x, sharding) for x in (q, k, v))
    return fn(q, k, v)
