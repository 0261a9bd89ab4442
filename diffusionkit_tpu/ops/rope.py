"""Multi-axis rotary position embeddings for FLUX.

TPU-native re-design of the reference RoPE (reference mmdit.py:852-942): the
reference materialises a (S, d/2, 2, 2) rotation tensor and contracts it
against q/k; here we build fp32 cos/sin tables once per (resolution, text_len)
— hashable statics under jit — and apply the rotation in ROTATE-HALF form
over contiguous half-head lane segments.

Why rotate-half and not the checkpoint's interleaved (even, odd) pairs: on
TPU the interleaved form forces a (B, S, H, D/2, 2) view whose minor dim of
2 gets a pathological T(2,128) tiling — the round-2 profile showed ~35 ms
per FLUX step of pad/maximum concats, physical reshapes and f32/bf16
convert churn in exactly these chains. Attention scores are invariant
under any fixed permutation applied to BOTH q and k head columns, so the
loader permutes the q/k projection output columns once
(``rope_head_permutation``; model_io._permute_qk_for_rope) and the rotation
becomes two fused multiply-adds on 64-lane-aligned halves — pure VPU work
in the layout the tensors already have. v, o and every downstream consumer
are untouched.

Position layout (reference mmdit.py:865-890): text tokens first with all-zero
(id, y, x) positions, then image tokens in row-major (y, x) order. Axis dims
(16, 56, 56) sum to the head dim 128; axis i rotates its own slice of the
head dimension.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def rope_frequencies(
    latent_image_resolution: Tuple[int, int],
    text_sequence_length: int,
    axes_dim: Sequence[int],
    theta: int = 10000,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Build (cos, sin) tables of shape (S, head_dim // 2), fp32.

    S = text_sequence_length + H*W. Pair j of axis i rotates by
    position_axis_i * theta^(-2j/axes_dim[i]) (reference mmdit.py:892-911).
    Computed with numpy on host: shapes are static per trace and the result is
    a constant input to the jitted denoise step.
    """
    h, w = latent_image_resolution
    # (S, 3) positions: text rows all zero; image rows (0, y, x).
    img_pos = np.zeros((h, w, 3), dtype=np.float32)
    img_pos[..., 1] = np.arange(h, dtype=np.float32)[:, None]
    img_pos[..., 2] = np.arange(w, dtype=np.float32)[None, :]
    positions = np.concatenate(
        [np.zeros((text_sequence_length, 3), np.float32), img_pos.reshape(-1, 3)],
        axis=0,
    )

    angles = []
    for i, dim in enumerate(axes_dim):
        scale = np.arange(0, dim, 2, dtype=np.float32) / dim
        omega = 1.0 / (float(theta) ** scale)  # (dim/2,)
        angles.append(positions[:, i : i + 1] * omega[None, :])  # (S, dim/2)
    ang = np.concatenate(angles, axis=-1)  # (S, sum(axes)/2)
    return jnp.asarray(np.cos(ang)), jnp.asarray(np.sin(ang))


def rope_head_permutation(head_dim: int) -> np.ndarray:
    """Half-layout -> interleaved-source index map.

    ``new[j] = 2j`` for the first half, ``new[D/2 + j] = 2j + 1`` for the
    second: half-layout position j holds the checkpoint's pair-j even
    element, position D/2+j its odd partner. Applied once per head to the
    q/k projection OUTPUT columns at load time (q'·k' == q·k under any
    shared column permutation), plus the per-dim QK-RMSNorm scales.
    Pair ordering across the concatenated rope axes is preserved: table
    column j of rope_frequencies corresponds to source dims (2j, 2j+1)
    regardless of which axis the pair belongs to.
    """
    return np.concatenate(
        [np.arange(0, head_dim, 2), np.arange(1, head_dim, 2)]
    )


def apply_rope(
    x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray
) -> jnp.ndarray:
    """Rotate q or k of shape (..., S, head_dim) in fp32, cast back.

    ``x`` is in the HALF layout (loader-permuted, see rope_head_permutation):
    x1 = pair evens in the first D/2 lanes, x2 = pair odds in the second.
    out = [cos*x1 - sin*x2 | sin*x1 + cos*x2] — the same rotation the
    reference's interleaved reshape(..., -1, 1, 2) contraction computes
    (reference mmdit.py:934-942), on lane-aligned contiguous halves.
    """
    in_dtype = x.dtype
    x32 = x.astype(jnp.float32)
    half = x32.shape[-1] // 2
    x1 = x32[..., :half]
    x2 = x32[..., half:]
    out = jnp.concatenate(
        [cos * x1 - sin * x2, sin * x1 + cos * x2], axis=-1
    )
    return out.astype(in_dtype)


def rms_norm_rope(
    x: jnp.ndarray,
    weight: jnp.ndarray,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """Fused QK-RMSNorm + rotate-half RoPE, fp32 end to end.

    ``rms_norm(x, w)`` followed by ``apply_rope`` as separate calls rounds
    the normed tensor to the model dtype between them, so XLA materialises
    the chain as ~6 HBM/VMEM passes per block (upcast + layout copy, stats
    reduce, norm apply + downcast, rope upcast, rotate halves, concat —
    ~25 ms of the 398 ms FLUX 1024² w4a8 step, r4 profile). Keeping the
    normed tensor in fp32 straight into the rotation lets XLA emit one
    stats reduce plus ONE apply pass that reads the projection output and
    writes the rotated model-dtype tensor. The skipped intermediate
    rounding only tightens numerics (rotation of the f32 norm).
    """
    in_dtype = x.dtype
    x32 = x.astype(jnp.float32)
    ms = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
    xn = (x32 * jax.lax.rsqrt(ms + eps)) * weight.astype(jnp.float32)
    half = xn.shape[-1] // 2
    x1 = xn[..., :half]
    x2 = xn[..., half:]
    out = jnp.concatenate(
        [cos * x1 - sin * x2, sin * x1 + cos * x2], axis=-1
    )
    return out.astype(in_dtype)
