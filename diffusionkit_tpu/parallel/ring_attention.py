"""Ring attention: context-parallel SDPA over a mesh axis.

True sequence parallelism for the joint text+image attention — each chip
holds seq/N queries, keys and values; K/V blocks rotate around the ring
(jax.lax.ppermute over ICI) while an online-softmax accumulator builds the
exact full-attention result. Per-chip memory is O(seq/N * tile), never the
full per-shard score matrix: each ring step runs the Pallas flash kernel
over the visiting K/V chunk (ops/flash_attention.flash_attention_stats) and
merges its (o, m, l) statistics into the running accumulator — the
multi-chip composition of the same online softmax the kernel runs over kv
tiles. A capability the reference cannot express (single Metal device,
SURVEY.md parallelism accounting).

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


def _chunk_stats_flash(q, k_blk, v_blk, vlen_local, scale, interpret):
    """(o, m, l) for one K/V chunk via the Pallas flash kernel — the
    per-shard score matrix never materialises (O(s_local * tile) VMEM)."""
    from ..ops.flash_attention import flash_attention_stats

    return flash_attention_stats(
        q, k_blk, v_blk, scale, vlen_local, interpret=interpret
    )


def _chunk_stats_xla(q, k_blk, v_blk, vlen_local, scale):
    """Reference chunk statistics (materialised scores). Used off-TPU where
    interpret-mode Pallas inside a scanned shard_map is prohibitively slow,
    and as the numeric oracle in tests."""
    s_local = k_blk.shape[-2]
    s = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k_blk, preferred_element_type=jnp.float32
    ) * scale
    col = jnp.arange(s_local)
    valid = col[None, None, None, :] < vlen_local
    s = jnp.where(valid, s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    # Fully-masked chunk: m == NEG_INF and s - m == 0; zero those weights.
    p = jnp.where(valid, jnp.exp(s - m), 0.0)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.einsum(
        "bhqk,bhkd->bhqd", p.astype(v_blk.dtype), v_blk,
        preferred_element_type=jnp.float32,
    ) / jnp.maximum(l, 1e-30)
    # o stays f32 (like flash_attention_stats): the combiner accumulates
    # chunk outputs across the ring in f32 and casts once at the end.
    return o, m, l


def _ring_attention_local(
    q, k, v, vlen, scale: float, axis_name: str, vary_axes=None,
    use_flash: bool = True, interpret: bool = False,
):
    """Per-shard body under shard_map: q/k/v (b, h, s_local, d); ``vlen`` the
    number of valid (unpadded) global key positions. ``vary_axes``: all mesh
    axes the inputs vary over (for the scan carry's vma typing)."""
    vary_axes = vary_axes or (axis_name,)
    n = jax.lax.psum(1, axis_name)
    me = jax.lax.axis_index(axis_name)
    b, h, s_local, d = q.shape

    def step(carry, step_idx):
        m, l, acc, k_blk, v_blk = carry
        # The block currently held originated on chip (me - step) % n; its
        # global key positions are [src*s_local, src*s_local + s_local).
        src = (me - step_idx) % n
        vlen_local = jnp.clip(vlen - src * s_local, 0, s_local)
        if use_flash:
            o_i, m_i, l_i = _chunk_stats_flash(
                q, k_blk, v_blk, vlen_local, scale, interpret
            )
        else:
            o_i, m_i, l_i = _chunk_stats_xla(q, k_blk, v_blk, vlen_local, scale)
        # Merge chunk statistics into the running accumulator. The chunk
        # output is normalized by l_i, so its unnormalized numerator is
        # o_i * l_i; a fully-masked chunk has l_i == 0 and drops out.
        m_new = jnp.maximum(m, m_i)
        c_old = jnp.exp(m - m_new)
        c_new = l_i * jnp.exp(m_i - m_new)
        acc_new = acc * c_old + o_i.astype(jnp.float32) * c_new
        l_new = l * c_old + c_new
        # Rotate K/V to the next chip in the ring.
        perm = [(i, (i + 1) % n) for i in range(n)]
        k_next = jax.lax.ppermute(k_blk, axis_name, perm)
        v_next = jax.lax.ppermute(v_blk, axis_name, perm)
        return (m_new, l_new, acc_new, k_next, v_next), None

    # Mark accumulators as device-varying so the scan carry types match
    # (shard_map's varying-axis typing). Skipped on the flash path, which
    # runs under check_vma=False where there is no vma typing to satisfy.
    def vary(x):
        if use_flash:
            return x
        for ax in vary_axes:
            x = jax.lax.pcast(x, ax, to="varying")
        return x

    m0 = vary(jnp.full((b, h, s_local, 1), NEG_INF, jnp.float32))
    l0 = vary(jnp.zeros((b, h, s_local, 1), jnp.float32))
    acc0 = vary(jnp.zeros((b, h, s_local, d), jnp.float32))
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
    use_flash: bool = None,
):
    """Exact full attention with the sequence sharded over ``axis``.

    q/k/v: (B, H, S, D). Any S — inputs are padded to a multiple of the axis
    size and padded keys masked. Works standalone (eager) and inside jit
    (device_put lowers to a sharding constraint under tracing).

    ``use_flash`` None = auto: the Pallas per-chunk kernel on TPU, the XLA
    materialised-score chunk body elsewhere (both merge identical (o, m, l)
    statistics; tests pin their equality).
    """
    import os

    if use_flash is None:
        try:
            on_tpu = jax.default_backend() == "tpu"
        except Exception:  # pragma: no cover
            on_tpu = False
        env = os.environ.get("DIFFUSIONKIT_TPU_RING_FLASH")
        use_flash = on_tpu if env is None else env != "0"
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
                vary_axes=vary_axes, use_flash=use_flash,
                interpret=jax.default_backend() != "tpu"),
        mesh=mesh,
        in_specs=(seq_spec, seq_spec, seq_spec, P()),
        out_specs=seq_spec,
        # The Pallas chunk kernel's out_shapes carry no varying-mesh-axes
        # info (same reason as ops/attention._flash_tp); the per-chunk body
        # itself has no collectives.
        check_vma=not use_flash,
    )
    sharding = NamedSharding(mesh, seq_spec)
    q, k, v = (jax.device_put(x, sharding) for x in (q, k, v))
    out = fn(q, k, v, jnp.asarray(s, jnp.int32))
    return out[:, :, :s, :] if pad else out
