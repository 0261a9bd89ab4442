"""VAE encoder/decoder, functional NHWC JAX.

Behavioural spec: reference python/src/diffusionkit/mlx/vae.py:20-467 (SD VAE
with 16-channel SD3/FLUX latents). Convolutions use NHWC/HWIO dimension
numbers — the TPU-native layout — and GroupNorm/attention statistics run in
fp32. The reference's per-up-block ``mx.eval`` memory hack (vae.py:395) is
unnecessary under XLA's static allocator and is dropped.

Parameter layout per conv: {"kernel": (kh, kw, in, out), "bias": (out,)}.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import AutoencoderConfig, VAEDecoderConfig, VAEEncoderConfig
from ..ops.common import linear
from ..ops.norms import group_norm

Params = Dict[str, Any]


def conv2d(
    params: Params, x: jnp.ndarray, stride: int = 1, padding=((1, 1), (1, 1))
) -> jnp.ndarray:
    y = jax.lax.conv_general_dilated(
        x,
        params["kernel"].astype(x.dtype),
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    return (y + params["bias"].astype(jnp.float32)).astype(x.dtype)


def upsample_nearest(x: jnp.ndarray, scale: int = 2) -> jnp.ndarray:
    """Nearest-neighbour 2x upsample (reference vae.py:20-25)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, scale, w, scale, c))
    return x.reshape(b, h * scale, w * scale, c)


def _resnet_block(params: Params, x: jnp.ndarray, groups: int) -> jnp.ndarray:
    """ResnetBlock2D (reference vae.py:60-101); no timestep embedding in VAE use."""
    y = jax.nn.silu(group_norm(x, params["norm1"]["weight"], params["norm1"]["bias"], groups))
    y = conv2d(params["conv1"], y)
    y = jax.nn.silu(group_norm(y, params["norm2"]["weight"], params["norm2"]["bias"], groups))
    y = conv2d(params["conv2"], y)
    if "conv_shortcut" in params:
        x = linear(params["conv_shortcut"], x)
    return x + y


def _attn_block(params: Params, x: jnp.ndarray, groups: int) -> jnp.ndarray:
    """Single-head GroupNorm attention (reference vae.py:28-57), fp32 softmax.

    Dispatched through ops.attention.sdpa as one 512-wide head in bshd
    layout: above the flash threshold (mid-block resolution > 32x32) the
    Pallas streaming kernel runs instead of a materialised (h*w)^2 score
    matrix — at 1024^2 output the einsum path allocated a 16384^2 f32
    score tensor (1 GB of HBM traffic and peak), and at 2048^2 it could
    not be allocated at all (17 GB)."""
    from ..ops.attention import sdpa

    b, h, w, c = x.shape
    y = group_norm(x, params["group_norm"]["weight"], params["group_norm"]["bias"], groups)
    q = linear(params["query_proj"], y).reshape(b, h * w, 1, c)
    k = linear(params["key_proj"], y).reshape(b, h * w, 1, c)
    v = linear(params["value_proj"], y).reshape(b, h * w, 1, c)
    y = sdpa(q, k, v, scale=float(1.0 / np.sqrt(c)), layout="bshd").astype(x.dtype)
    return x + linear(params["out_proj"], y.reshape(b, h, w, c))


def _enc_dec_block(
    params: Params, x: jnp.ndarray, groups: int
) -> jnp.ndarray:
    """EncoderDecoderBlock2D (reference vae.py:104-149)."""
    for rp in params["resnets"]:
        x = _resnet_block(rp, x, groups)
    if "downsample" in params:
        # Asymmetric (0,1) pad then stride-2 conv (reference vae.py:142-144).
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        x = conv2d(params["downsample"], x, stride=2, padding=((0, 0), (0, 0)))
    if "upsample" in params:
        x = conv2d(params["upsample"], upsample_nearest(x))
    return x


def _mid_blocks(params: Params, x: jnp.ndarray, groups: int) -> jnp.ndarray:
    x = _resnet_block(params["mid_blocks"][0], x, groups)
    x = _attn_block(params["mid_blocks"][1], x, groups)
    return _resnet_block(params["mid_blocks"][2], x, groups)


def apply_vae_decoder(
    params: Params, x: jnp.ndarray, config: VAEDecoderConfig = VAEDecoderConfig()
) -> jnp.ndarray:
    """16-channel latent -> RGB in [-1, 1] (reference vae.py:336-401)."""
    g = config.resnet_groups
    x = conv2d(params["conv_in"], x)
    x = _mid_blocks(params, x, g)
    # up_blocks stored outermost-resolution-first like the reference list
    # (insert(0, ...) at vae.py:379) and applied in reverse (vae.py:393).
    for bp in reversed(params["up_blocks"]):
        x = _enc_dec_block(bp, x, g)
    x = jax.nn.silu(
        group_norm(x, params["conv_norm_out"]["weight"], params["conv_norm_out"]["bias"], g)
    )
    return conv2d(params["conv_out"], x)


def apply_vae_encoder(
    params: Params, x: jnp.ndarray, config: VAEEncoderConfig = VAEEncoderConfig()
) -> jnp.ndarray:
    """RGB in [-1, 1] -> 32ch (mean, logvar) (reference vae.py:404-467)."""
    g = config.resnet_groups
    x = conv2d(params["conv_in"], x)
    for bp in params["down_blocks"]:
        x = _enc_dec_block(bp, x, g)
    x = _mid_blocks(params, x, g)
    x = jax.nn.silu(
        group_norm(x, params["conv_norm_out"]["weight"], params["conv_norm_out"]["bias"], g)
    )
    return conv2d(params["conv_out"], x)


# ---------------------------------------------------------------------------
# Generic SD autoencoder (reference vae.py:152-334: Encoder/Decoder/Autoencoder)
# ---------------------------------------------------------------------------
#
# The generic `Autoencoder` is exported public API in the reference (it has no
# in-tree caller — the SD3/FLUX pipelines use the specialised VAEDecoder /
# VAEEncoder above — but users of the package can reach it). Same encoder /
# decoder topology as the specialised classes, plus the 1x1 quant projections
# and the scaling-factor latent convention, so the functional applies below
# simply re-dress AutoencoderConfig as the encoder/decoder configs.
# Reference quirks preserved: the decoder runs layers_per_block + 1 resnets
# per block (reference vae.py:303: `config.layers_per_block + 1`), and
# `encode` folds the scaling factor into (mean, logvar) while `decode`
# divides it back out (reference vae.py:312-326).


def _autoencoder_enc_config(config: AutoencoderConfig) -> VAEEncoderConfig:
    return VAEEncoderConfig(
        in_channels=config.in_channels,
        out_channels=config.latent_channels_out,
        block_out_channels=tuple(config.block_out_channels),
        layers_per_block=config.layers_per_block,
        resnet_groups=config.norm_num_groups,
    )


def _autoencoder_dec_config(config: AutoencoderConfig) -> VAEDecoderConfig:
    return VAEDecoderConfig(
        in_channels=config.latent_channels_in,
        out_channels=config.out_channels,
        block_out_channels=tuple(config.block_out_channels),
        layers_per_block=config.layers_per_block + 1,
        resnet_groups=config.norm_num_groups,
    )


def autoencoder_encode(
    params: Params, x: jnp.ndarray, config: AutoencoderConfig = AutoencoderConfig()
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """RGB -> (mean, logvar), scaling factor folded in (reference vae.py:316-324)."""
    h = apply_vae_encoder(params["encoder"], x, _autoencoder_enc_config(config))
    h = linear(params["quant_proj"], h)
    mean, logvar = jnp.split(h, 2, axis=-1)
    mean = mean * config.scaling_factor
    logvar = logvar + 2.0 * math.log(config.scaling_factor)
    return mean, logvar


def autoencoder_decode(
    params: Params, z: jnp.ndarray, config: AutoencoderConfig = AutoencoderConfig()
) -> jnp.ndarray:
    """Latent -> RGB (reference vae.py:312-314)."""
    z = z / config.scaling_factor
    return apply_vae_decoder(
        params["decoder"], linear(params["post_quant_proj"], z),
        _autoencoder_dec_config(config),
    )


def apply_autoencoder(
    params: Params,
    x: jnp.ndarray,
    key: jax.Array,
    config: AutoencoderConfig = AutoencoderConfig(),
) -> Dict[str, jnp.ndarray]:
    """Full roundtrip with reparameterised sampling (reference vae.py:328-333)."""
    mean, logvar = autoencoder_encode(params, x, config)
    z = jax.random.normal(key, mean.shape, mean.dtype) * jnp.exp(0.5 * logvar) + mean
    return {"x_hat": autoencoder_decode(params, z, config), "z": z,
            "mean": mean, "logvar": logvar}


def init_autoencoder_params(
    key: jax.Array, config: AutoencoderConfig = AutoencoderConfig(), dtype=jnp.float32
) -> Params:
    ke, kd, kq, kp = jax.random.split(key, 4)
    return {
        "encoder": init_vae_encoder_params(ke, _autoencoder_enc_config(config), dtype),
        "decoder": init_vae_decoder_params(kd, _autoencoder_dec_config(config), dtype),
        "quant_proj": _init_lin(kq, config.latent_channels_out,
                                config.latent_channels_out, dtype),
        "post_quant_proj": _init_lin(kp, config.latent_channels_in,
                                     config.latent_channels_in, dtype),
    }


# ---------------------------------------------------------------------------
# Random initialisation (tests / benchmarks without checkpoints)
# ---------------------------------------------------------------------------


def _init_conv(key, kh, kw, cin, cout, dtype):
    return {
        "kernel": (
            jax.random.normal(key, (kh, kw, cin, cout), jnp.float32)
            * (0.02 / (kh * kw))
        ).astype(dtype),
        "bias": jnp.zeros((cout,), dtype),
    }


def _init_norm(c, dtype):
    return {"weight": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}


def _init_lin(key, cin, cout, dtype):
    return {
        "kernel": (jax.random.normal(key, (cin, cout), jnp.float32) * 0.02).astype(dtype),
        "bias": jnp.zeros((cout,), dtype),
    }


def _init_resnet(key, cin, cout, dtype):
    k1, k2, k3 = jax.random.split(key, 3)
    p = {
        "norm1": _init_norm(cin, dtype),
        "conv1": _init_conv(k1, 3, 3, cin, cout, dtype),
        "norm2": _init_norm(cout, dtype),
        "conv2": _init_conv(k2, 3, 3, cout, cout, dtype),
    }
    if cin != cout:
        p["conv_shortcut"] = _init_lin(k3, cin, cout, dtype)
    return p


def _init_attn(key, c, dtype):
    ks = jax.random.split(key, 4)
    return {
        "group_norm": _init_norm(c, dtype),
        "query_proj": _init_lin(ks[0], c, c, dtype),
        "key_proj": _init_lin(ks[1], c, c, dtype),
        "value_proj": _init_lin(ks[2], c, c, dtype),
        "out_proj": _init_lin(ks[3], c, c, dtype),
    }


def init_vae_decoder_params(
    key: jax.Array, config: VAEDecoderConfig = VAEDecoderConfig(), dtype=jnp.float32
) -> Params:
    ks = iter(jax.random.split(key, 64))
    boc = config.block_out_channels
    p: Params = {"conv_in": _init_conv(next(ks), 3, 3, config.in_channels, boc[-1], dtype)}
    p["mid_blocks"] = [
        _init_resnet(next(ks), boc[-1], boc[-1], dtype),
        _init_attn(next(ks), boc[-1], dtype),
        _init_resnet(next(ks), boc[-1], boc[-1], dtype),
    ]
    channels = list(reversed(boc))
    channels = [channels[0]] + channels
    up_blocks = []
    for i, (cin, cout) in enumerate(zip(channels, channels[1:])):
        bp: Params = {
            "resnets": [
                _init_resnet(next(ks), cin if j == 0 else cout, cout, dtype)
                for j in range(config.layers_per_block)
            ]
        }
        if i < len(boc) - 1:
            bp["upsample"] = _init_conv(next(ks), 3, 3, cout, cout, dtype)
        up_blocks.insert(0, bp)
    p["up_blocks"] = up_blocks
    p["conv_norm_out"] = _init_norm(boc[0], dtype)
    p["conv_out"] = _init_conv(next(ks), 3, 3, boc[0], config.out_channels, dtype)
    return p


def init_vae_encoder_params(
    key: jax.Array, config: VAEEncoderConfig = VAEEncoderConfig(), dtype=jnp.float32
) -> Params:
    ks = iter(jax.random.split(key, 64))
    boc = config.block_out_channels
    p: Params = {"conv_in": _init_conv(next(ks), 3, 3, config.in_channels, boc[0], dtype)}
    channels = [boc[0]] + list(boc)
    down_blocks = []
    for i, (cin, cout) in enumerate(zip(channels, channels[1:])):
        bp: Params = {
            "resnets": [
                _init_resnet(next(ks), cin if j == 0 else cout, cout, dtype)
                for j in range(config.layers_per_block)
            ]
        }
        if i < len(boc) - 1:
            bp["downsample"] = _init_conv(next(ks), 3, 3, cout, cout, dtype)
        down_blocks.append(bp)
    p["down_blocks"] = down_blocks
    p["mid_blocks"] = [
        _init_resnet(next(ks), boc[-1], boc[-1], dtype),
        _init_attn(next(ks), boc[-1], dtype),
        _init_resnet(next(ks), boc[-1], boc[-1], dtype),
    ]
    p["conv_norm_out"] = _init_norm(boc[-1], dtype)
    p["conv_out"] = _init_conv(next(ks), 3, 3, boc[-1], config.out_channels, dtype)
    return p
