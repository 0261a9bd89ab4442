"""Multi-axis rotary position embeddings for FLUX.

TPU-native re-design of the reference RoPE (reference mmdit.py:852-942): the
reference materialises a (S, d/2, 2, 2) rotation tensor and contracts it
against q/k; here we build fp32 cos/sin tables once per (resolution, text_len)
— hashable statics under jit — and apply the rotation as two fused
multiply-adds on de-interleaved pairs, which XLA lowers to pure VPU work.

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


def apply_rope(
    x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray
) -> jnp.ndarray:
    """Rotate q or k of shape (..., S, head_dim) in fp32, cast back.

    Pairs are consecutive (even, odd) head-dim elements, matching the
    reference's reshape(..., -1, 1, 2) contraction (reference mmdit.py:934-942):
    out_even = cos*x_even - sin*x_odd; out_odd = sin*x_even + cos*x_odd.
    """
    in_dtype = x.dtype
    x32 = x.astype(jnp.float32)
    shape = x32.shape
    x32 = x32.reshape(*shape[:-1], shape[-1] // 2, 2)
    x_even, x_odd = x32[..., 0], x32[..., 1]
    out_even = cos * x_even - sin * x_odd
    out_odd = sin * x_even + cos * x_odd
    out = jnp.stack([out_even, out_odd], axis=-1).reshape(shape)
    return out.astype(in_dtype)
