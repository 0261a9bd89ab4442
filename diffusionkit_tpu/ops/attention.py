"""Scaled dot-product attention dispatch.

The reference delegates to MLX's fused Metal SDPA with a flash-attention
threshold in low-memory mode (reference mmdit.py:562,636-639,687,729-732).
Here the default is the Pallas flash kernel on TPU for long sequences, with a
plain XLA einsum path (fp32 softmax) as the reference implementation and
fallback for short sequences, odd head dims, and non-TPU backends.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp

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


def sdpa(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float,
    impl: Optional[str] = None,
) -> jnp.ndarray:
    """Dispatching SDPA. ``impl``: None/'auto', 'xla', or 'flash'."""
    impl = impl or os.environ.get("DIFFUSIONKIT_TPU_SDPA", "auto")
    seq = q.shape[-2]
    head_dim = q.shape[-1]
    if impl == "flash" or (
        impl == "auto"
        and _on_tpu()
        and seq > FLASH_ATTN_THRESHOLD
        and head_dim in (64, 128, 256)
    ):
        return flash_attention(q, k, v, scale=scale)
    return xla_sdpa(q, k, v, scale)
