"""Ring attention: context-parallel SDPA over a mesh axis.

True sequence parallelism for the joint text+image attention — each chip
holds seq/N queries, keys and values; K/V blocks rotate around the ring
(jax.lax.ppermute over ICI) while an online-softmax accumulator builds the
exact full-attention result. Per-chip memory is O(seq/N), never the full
sequence — the multi-chip extension of the single-chip flash kernel
(ops/flash_attention.py), and a capability the reference cannot express
(single Metal device, SURVEY.md parallelism accounting).

Wired into the model as ``sdpa_impl="ring"`` (ops/attention.py -> apply_mmdit
-> pipeline(sdpa_impl="ring", mesh=...)): arbitrary joint sequence lengths
are padded to the ring size and the padded key positions masked inside the
online softmax, mirroring the flash kernel's padding contract.

Collectives are XLA's (`ppermute` compiles to ICI neighbour exchanges), per
the scaling-book recipe: annotate, let XLA schedule, overlap with compute.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

NEG_INF = -1e30


def _ring_attention_local(q, k, v, vlen, scale: float, axis_name: str, vary_axes=None):
    """Per-shard body under shard_map: q/k/v (b, h, s_local, d); ``vlen`` the
    number of valid (unpadded) global key positions. ``vary_axes``: all mesh
    axes the inputs vary over (for the scan carry's vma typing)."""
    vary_axes = vary_axes or (axis_name,)
    n = jax.lax.psum(1, axis_name)
    me = jax.lax.axis_index(axis_name)
    b, h, s_local, d = q.shape
    col_local = jnp.arange(s_local)

    def step(carry, step_idx):
        m, l, acc, k_blk, v_blk = carry
        s = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k_blk, preferred_element_type=jnp.float32
        ) * scale
        # The block currently held originated on chip (me - step) % n; mask
        # global key positions beyond vlen (ring-size padding).
        src = (me - step_idx) % n
        col = src * s_local + col_local
        s = jnp.where(col[None, None, None, :] < vlen, s, NEG_INF)
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

    # Mark accumulators as device-varying so the scan carry types match
    # (shard_map's varying-axis typing).
    m0 = jax.lax.pvary(jnp.full((b, h, s_local, 1), NEG_INF, jnp.float32), vary_axes)
    l0 = jax.lax.pvary(jnp.zeros((b, h, s_local, 1), jnp.float32), vary_axes)
    acc0 = jax.lax.pvary(jnp.zeros((b, h, s_local, d), jnp.float32), vary_axes)
    (m, l, acc, _, _), _ = jax.lax.scan(
        step, (m0, l0, acc0, k, v), jnp.arange(n)
    )
    # Padded q rows attend to real keys, so l > 0 everywhere; guard anyway.
    return (acc / jnp.maximum(l, 1e-30)).astype(q.dtype)


def ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float,
    mesh: Mesh,
    axis: str = "model",
):
    """Exact full attention with the sequence sharded over ``axis``.

    q/k/v: (B, H, S, D). Any S — inputs are padded to a multiple of the axis
    size and padded keys masked. Works standalone (eager) and inside jit
    (device_put lowers to a sharding constraint under tracing).
    """
    n = mesh.shape[axis]
    b, h, s, d = q.shape
    pad = (-s) % n
    if pad:
        pads = ((0, 0), (0, 0), (0, pad), (0, 0))
        q, k, v = (jnp.pad(x, pads) for x in (q, k, v))
    # Keep the batch data-parallel when the mesh has a data axis (avoids an
    # all-gather of the CFG/image batch around the ring).
    batch_axis = "data" if "data" in mesh.axis_names and b % mesh.shape["data"] == 0 else None
    seq_spec = P(batch_axis, None, axis, None)
    vary_axes = (axis,) if batch_axis is None else (batch_axis, axis)
    fn = jax.shard_map(
        partial(_ring_attention_local, scale=scale, axis_name=axis,
                vary_axes=vary_axes),
        mesh=mesh,
        in_specs=(seq_spec, seq_spec, seq_spec, P()),
        out_specs=seq_spec,
    )
    sharding = NamedSharding(mesh, seq_spec)
    q, k, v = (jax.device_put(x, sharding) for x in (q, k, v))
    out = fn(q, k, v, jnp.asarray(s, jnp.int32))
    return out[:, :, :s, :] if pad else out
