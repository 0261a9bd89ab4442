"""Shared functional building blocks: linear layers, MLPs, patchify.

Parameters are plain pytrees: ``{"kernel": (in, out), "bias": (out,)}``.
Kernels are stored input-major so application is a single ``x @ kernel`` that
maps straight onto the MXU; checkpoint loaders transpose from the torch/MLX
(out, in) layout once at load time (see model_io.py).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


def linear(params: Params, x: jnp.ndarray, act: str = None) -> jnp.ndarray:
    """y = act(x @ kernel (+ bias)). Accumulates in fp32 on the MXU.

    Transparently handles weight-only-quantized params (see ops/quantized.py)
    so every model works unchanged with int4/int8 checkpoints.
    ``act="gelu"`` (exact erf, reference mmdit.py MLP) fuses into the Pallas
    quantized-kernel epilogues; on the plain/XLA paths it is appended here
    and XLA fuses it into the dot's consumer.
    """
    if "kernel" not in params:
        if "w8" in params:
            from .w8a8 import w8a8_linear

            return w8a8_linear(params, x, act=act)
        from .quantized import quantized_linear

        return quantized_linear(params, x, act=act)
    from .w8a8 import ActQuant

    if isinstance(x, ActQuant):  # shared pre-quant; float path uses the orig
        x = x.to_float()
    y = jnp.dot(x, params["kernel"], preferred_element_type=jnp.float32)
    if params.get("bias") is not None:
        y = y + params["bias"].astype(jnp.float32)
    # Cast BEFORE the activation: computing the GELU in fp32 forced XLA to
    # materialise the full fp32 fc1 output in HBM (SD3 512² profile: a
    # 50 MB f32[2,1024,6144] tensor written by the fc1 fusion and re-read by
    # fc2's producer — the MLP chain ran 14.5 ms/step vs 10.4 roofline).
    # The activation feeds a bf16 matmul anyway, so bf16 GELU costs one
    # rounding at bf16 epsilon and halves the intermediate bytes.
    y = y.astype(x.dtype)
    if act == "gelu":
        y = jax.nn.gelu(y, approximate=False)
    return y


def mlp_silu(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Two-layer MLP with SiLU: Linear -> SiLU -> Linear.

    Used by the pooled-text, timestep and guidance adapters (reference
    mmdit.py:352-392,945-955).
    """
    return linear(params["fc2"], jax.nn.silu(linear(params["fc1"], x)))


def _linear_out_dim(p: Params):
    for key in ("kernel", "q4", "q8", "w8"):
        if p.get(key) is not None:
            return p[key].shape[-1]
    return None


def ffn_gelu(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Transformer FFN with exact (erf) GELU (reference mmdit.py:827-835).

    When fc2 quantizes its activations dynamically (w8a8 / w4a8), the GELU
    and fc2's int8 quantization run as ONE fused Pallas pass over fc1's
    output (ops/fused_quant.gelu_quantize) — the float GELU result never
    reaches HBM. Otherwise the GELU is appended to fc1 and XLA fuses it into
    the dot's consumer."""
    from .fused_quant import fused_eligible, gelu_quantize
    from .w8a8 import needs_act_quant

    if needs_act_quant(params["fc2"]):
        n = _linear_out_dim(params["fc1"])
        if n is not None and fused_eligible(n):
            from .w4a8_matmul import w4a8_ffn_eligible, w4a8_ffn_gelu

            if w4a8_ffn_eligible(params["fc1"], params["fc2"]):
                # Both legs w4a8: the hidden stays int8 end to end — fc1's
                # epilogue applies GELU + per-(row, n-tile) quantization and
                # fc2 rescales per k-tile (ops/w4a8_matmul.w4a8_ffn_gelu).
                return w4a8_ffn_gelu(params["fc1"], params["fc2"], x)
            return linear(params["fc2"], gelu_quantize(linear(params["fc1"], x)))
    return linear(params["fc2"], linear(params["fc1"], x, act="gelu"))


def timestep_embedding(
    t: jnp.ndarray, dim: int, max_period: int = 10000
) -> jnp.ndarray:
    """Sinusoidal frequency embedding, fp32 (reference mmdit.py:379-389).

    The reference computes the frequency table in the activation dtype; here
    it is fp32 for accuracy (a deliberate, documented deviation — the table is
    tiny and the downstream MLP re-casts).
    """
    half = dim // 2
    freqs = jnp.exp(
        -jnp.log(jnp.float32(max_period))
        * jnp.arange(half, dtype=jnp.float32)
        / half
    )
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


def patchify(x: jnp.ndarray, patch_size: int) -> jnp.ndarray:
    """Space-to-depth patchify: (B, H, W, C) -> (B, H/p * W/p, C*p*p).

    Feature order within a patch is (c, ph, pw), matching FLUX's latent
    packing and the SD3 conv weight after loader reshape (reference
    mmdit.py:292-302 and the conv path at mmdit.py:285-290 — the loader folds
    the k=2/s=2 conv into an equivalent matmul over this layout).
    """
    b, h, w, c = x.shape
    p = patch_size
    x = x.reshape(b, h // p, p, w // p, p, c)
    # -> (b, h/p, w/p, c, ph, pw)
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(b, (h // p) * (w // p), c * p * p)


def unpack_flux(
    x: jnp.ndarray, latent_hw: Tuple[int, int], patch_size: int
) -> jnp.ndarray:
    """Inverse of FLUX packing: (B, S, c*p*p) -> (B, H, W, c).

    Feature order (c, ph, pw) (reference mmdit.py:304-321).
    """
    b, s, f = x.shape
    p = patch_size
    h, w = latent_hw[0] // p, latent_hw[1] // p
    c = f // (p * p)
    x = x.reshape(b, h, w, c, p, p)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # (b, h, ph, w, pw, c)
    return x.reshape(b, h * p, w * p, c)


def unpatchify_sd3(
    x: jnp.ndarray, latent_hw: Tuple[int, int], patch_size: int, vae_latent_dim: int
) -> jnp.ndarray:
    """SD3 unpatchify: feature order (ph, pw, c) (reference mmdit.py:975-988)."""
    b, s, f = x.shape
    p = patch_size
    th, tw = latent_hw
    h, w = th // p, tw // p
    x = x.reshape(b, h, w, p, p, vae_latent_dim)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # (b, h, ph, w, pw, c)
    return x.reshape(b, th, tw, vae_latent_dim)
