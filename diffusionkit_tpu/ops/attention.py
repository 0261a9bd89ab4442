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

from .flash_attention import flash_attention, flash_attention_bshd

# Sequence length above which the Pallas flash kernel is used; mirrors the
# role of SDPA_FLASH_ATTN_THRESHOLD=1024 (reference mmdit.py:19).
FLASH_ATTN_THRESHOLD = 1024


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def xla_sdpa(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, scale: float,
    layout: str = "bhsd",
) -> jnp.ndarray:
    """Materialised-score SDPA with fp32 softmax."""
    if layout == "bshd":
        s = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
        )
        p = jax.nn.softmax(s * scale, axis=-1)
        out = jnp.einsum(
            "bhqk,bkhd->bqhd", p.astype(v.dtype), v,
            preferred_element_type=jnp.float32,
        )
        return out.astype(q.dtype)
    s = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    )
    p = jax.nn.softmax(s * scale, axis=-1)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", p.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype)


def _flash_tp(q, k, v, scale: float, mesh, axis: str = "model", layout: str = "bhsd"):
    """Pallas flash under GSPMD: shard_map over the head axis (already the
    activation sharding produced by column-parallel q/k/v projections), and
    over the data axis for the batch when it divides (otherwise the CFG
    batch would be all-gathered and attention computed redundantly on every
    data-axis device). Interpret mode off-TPU so the path is testable on
    the virtual CPU mesh."""
    interpret = not _on_tpu()
    b = q.shape[0]
    data = "data" if ("data" in mesh.shape and mesh.shape["data"] > 1
                      and b % mesh.shape["data"] == 0) else None
    if layout == "bshd":
        spec = P(data, None, axis, None)
        fn = partial(flash_attention_bshd, scale=scale, interpret=interpret)
    else:
        spec = P(data, axis, None, None)
        fn = partial(flash_attention, scale=scale, interpret=interpret)
    return jax.shard_map(
        fn, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        # pallas_call out_shapes carry no varying-mesh-axes info; the kernel
        # is trivially per-shard (no collectives), so skip the vma check.
        check_vma=False,
    )(q, k, v)


def sdpa(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float,
    impl: Optional[str] = None,
    mesh=None,
    layout: str = "bhsd",
) -> jnp.ndarray:
    """Dispatching SDPA.

    ``impl``: None/'auto', 'xla', 'flash', or 'ring' (mesh required).
    ``mesh``: jax.sharding.Mesh with a 'model' axis; changes how 'flash'
    lowers (shard_map over heads) and enables 'ring'.
    ``layout``: 'bhsd' (B, H, S, D) or 'bshd' (B, S, H, D — the layout the
    model's head-split reshape yields; avoids physical transposes around the
    Pallas kernel, which XLA must materialise for custom calls).
    """
    impl = impl or os.environ.get("DIFFUSIONKIT_TPU_SDPA", "auto")
    bshd = layout == "bshd"
    seq = q.shape[1] if bshd else q.shape[-2]
    head_dim = q.shape[-1]
    num_heads = q.shape[2] if bshd else q.shape[-3]
    # 64/128/256 are the MMDiT head dims; any d % 128 == 0 beyond that is
    # lane-aligned with pack=1 (the VAE mid-block's single 512-wide head).
    flash_ok = head_dim in (64, 128, 256) or head_dim % 128 == 0
    want_flash = impl == "flash" or (
        impl == "auto" and _on_tpu() and seq > FLASH_ATTN_THRESHOLD and flash_ok
    )
    if impl == "ring":
        if mesh is None:
            raise ValueError("sdpa impl='ring' requires a mesh")
        from ..parallel.ring_attention import ring_attention

        if bshd:
            # Ring shards the sequence axis; it keeps the (B,H,S,D) form.
            o = ring_attention(
                q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3), scale, mesh,
            )
            return o.transpose(0, 2, 1, 3)
        return ring_attention(q, k, v, scale, mesh)
    # The bshd Pallas path needs lane-aligned blocks: one head per program
    # when d % 128 == 0, or 128//d heads packed per program when d divides
    # 128 (d=64 models). A head count that doesn't divide the pack factor
    # (even per-shard under TP: SD3.5's 38 heads at tp=2 -> 19 local heads)
    # is zero-padded inside flash_attention_bshd — ~1/H extra compute
    # instead of the materialised transposes the odd count used to force.
    pack = max(1, 128 // head_dim) if 128 % head_dim == 0 else 0
    bshd_ok = head_dim % 128 == 0 or pack > 0
    # A/B escape hatch: DIFFUSIONKIT_TPU_ATTN_LAYOUT=bhsd forces the
    # transposing path even for bshd-capable shapes (strided head-column
    # DMAs vs materialised transposes trade off per shape).
    if os.environ.get("DIFFUSIONKIT_TPU_ATTN_LAYOUT") == "bhsd":
        bshd_ok = False
    if bshd and want_flash and not bshd_ok:
        q, k, v = (x.transpose(0, 2, 1, 3) for x in (q, k, v))
        bshd, layout = False, "bhsd"
        untranspose = True
    else:
        untranspose = False

    if mesh is not None:
        if want_flash and flash_ok and num_heads % mesh.shape["model"] == 0:
            out = _flash_tp(q, k, v, scale, mesh, layout=layout)
        else:
            # GSPMD partitions the einsum+softmax path natively.
            out = xla_sdpa(q, k, v, scale, layout)
    elif want_flash:
        fn = flash_attention_bshd if bshd else flash_attention
        out = fn(q, k, v, scale=scale)
    else:
        out = xla_sdpa(q, k, v, scale, layout)
    return out.transpose(0, 2, 1, 3) if untranspose else out
