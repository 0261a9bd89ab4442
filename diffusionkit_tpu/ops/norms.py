"""Normalisation primitives with float32 accumulation.

TPU-native equivalents of the reference's fused Metal kernels:
``mx.fast.layer_norm`` (reference mmdit.py:849,958-972) and
``mlx.nn.RMSNorm``/``GroupNorm``. On TPU these reduce+scale patterns fuse
into neighbouring HLO under XLA, so they are expressed directly in jnp with
fp32 statistics; profile before hand-writing a Pallas AdaLN kernel here
(SURVEY.md §7 step 6: "measure first").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def layer_norm(x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Weightless LayerNorm over the last axis (reference mmdit.py:838-849)."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    return ((x32 - mean) * jax.lax.rsqrt(var + eps)).astype(dtype)


def layer_norm_affine(
    x: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray, eps: float = 1e-5
) -> jnp.ndarray:
    """Standard LayerNorm with learned scale/offset (CLIP encoder layers)."""
    return layer_norm(x, eps) * weight + bias


def modulated_layer_norm(
    x: jnp.ndarray,
    shift: jnp.ndarray,
    residual_scale: jnp.ndarray,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """AdaLN modulation: ``norm(x) * (1 + scale) + shift``.

    Equivalent of the reference's ``affine_transform`` with a weightless norm
    (reference mmdit.py:958-972). ``shift``/``residual_scale`` broadcast over
    the sequence axis: shapes (batch, 1, hidden) against (batch, seq, hidden).
    """
    return layer_norm(x, eps) * (1.0 + residual_scale) + shift


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """RMSNorm with fp32 accumulation.

    Matches ``mlx.nn.RMSNorm`` (used for FLUX/SD3.5 QK-norm, reference
    mmdit.py:754-764) and the T5 variant (reference t5.py:144-164), which is
    algebraically the same: x * rsqrt(mean(x^2) + eps) * weight.
    """
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    ms = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
    return (x32 * jax.lax.rsqrt(ms + eps)).astype(dtype) * weight


def group_norm(
    x: jnp.ndarray,
    weight: jnp.ndarray,
    bias: jnp.ndarray,
    num_groups: int,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """GroupNorm over NHWC input, torch-compatible statistics.

    Equivalent of ``mlx.nn.GroupNorm(pytorch_compatible=True)`` used in the
    VAE (reference vae.py:34,72). Statistics per (batch, group) over
    (H, W, channels-in-group), computed in fp32.
    """
    b, h, w, c = x.shape
    dtype = x.dtype
    x32 = x.astype(jnp.float32).reshape(b, h * w, num_groups, c // num_groups)
    mean = jnp.mean(x32, axis=(1, 3), keepdims=True)
    var = jnp.var(x32, axis=(1, 3), keepdims=True)
    x32 = (x32 - mean) * jax.lax.rsqrt(var + eps)
    x32 = x32.reshape(b, h, w, c)
    return (x32 * weight + bias).astype(dtype)
