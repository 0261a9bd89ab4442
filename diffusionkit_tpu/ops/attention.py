"""Scaled dot-product attention dispatch.

The reference delegates to MLX's fused Metal SDPA with a flash-attention
threshold in low-memory mode (reference mmdit.py:562,636-639,687,729-732).
Here the default is the Pallas flash kernel on TPU for long sequences, with a
plain XLA einsum path (fp32 softmax) as the reference implementation and
fallback for short sequences, odd head dims, and non-TPU backends.

Mesh-aware dispatch: XLA cannot auto-partition a ``pallas_call``, so under a
mesh the flash kernel is wrapped in ``shard_map`` with the HEAD axis mapped
to the tensor-parallel axis — the heads are already sharded there by the
Megatron column plan (parallel/sharding.py), so the kernel runs on local
heads with zero extra collectives. ``impl="ring"`` selects context-parallel
ring attention (sequence sharded over the same axis;
parallel/ring_attention.py).
"""

from __future__ import annotations

import os
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from .flash_attention import flash_attention

# Sequence length above which the Pallas flash kernel is used; mirrors the
# role of SDPA_FLASH_ATTN_THRESHOLD=1024 (reference mmdit.py:19).
FLASH_ATTN_THRESHOLD = 1024


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def xla_sdpa(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, scale: float
) -> jnp.ndarray:
    """Materialised-score SDPA with fp32 softmax over (B, H, S, D)."""
    s = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    )
    p = jax.nn.softmax(s * scale, axis=-1)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", p.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype)


def _flash_tp(q, k, v, scale: float, mesh, axis: str = "model"):
    """Pallas flash under GSPMD: shard_map over the head axis (already the
    activation sharding produced by column-parallel q/k/v projections)."""
    spec = P(None, axis, None, None)
    fn = jax.shard_map(
        partial(flash_attention, scale=scale),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
    )
    return fn(q, k, v)


def sdpa(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float,
    impl: Optional[str] = None,
    mesh=None,
) -> jnp.ndarray:
    """Dispatching SDPA.

    ``impl``: None/'auto', 'xla', 'flash', or 'ring' (mesh required).
    ``mesh``: jax.sharding.Mesh with a 'model' axis; changes how 'flash'
    lowers (shard_map over heads) and enables 'ring'.
    """
    impl = impl or os.environ.get("DIFFUSIONKIT_TPU_SDPA", "auto")
    seq = q.shape[-2]
    head_dim = q.shape[-1]
    num_heads = q.shape[-3]
    flash_ok = head_dim in (64, 128, 256)
    want_flash = impl == "flash" or (
        impl == "auto" and _on_tpu() and seq > FLASH_ATTN_THRESHOLD and flash_ok
    )
    if impl == "ring":
        if mesh is None:
            raise ValueError("sdpa impl='ring' requires a mesh")
        from ..parallel.ring_attention import ring_attention

        return ring_attention(q, k, v, scale, mesh)
    if mesh is not None:
        if want_flash and flash_ok and num_heads % mesh.shape["model"] == 0:
            return _flash_tp(q, k, v, scale, mesh)
        # GSPMD partitions the einsum+softmax path natively.
        return xla_sdpa(q, k, v, scale)
    if want_flash:
        return flash_attention(q, k, v, scale=scale)
    return xla_sdpa(q, k, v, scale)
