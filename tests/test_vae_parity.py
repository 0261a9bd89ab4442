"""VAE decoder/encoder parity vs an independent torch reimplementation.

Both sides consume the SAME raw sgm-layout state dict (the layout of real
sd3/flux checkpoints): torch modules load it directly; ours goes through the
model_io mapper. Validates conv layout conversion (OIHW->HWIO), GroupNorm
statistics, the single-head attention block, asymmetric downsample padding,
and nearest upsampling (reference vae.py:20-467 semantics).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F

import jax.numpy as jnp

from diffusionkit_tpu.config import VAEDecoderConfig, VAEEncoderConfig
from diffusionkit_tpu.model_io import (
    vae_decoder_params_from_ckpt,
    vae_encoder_params_from_ckpt,
)
from diffusionkit_tpu.models import apply_vae_decoder, apply_vae_encoder

from test_model_io import _vae_raw  # same synthetic raw checkpoint builder


def _t(sd, key):
    return torch.from_numpy(np.asarray(sd[key]))


def _conv(sd, pre, x, stride=1, padding=1):
    return F.conv2d(x, _t(sd, pre + ".weight"), _t(sd, pre + ".bias"), stride, padding)


def _gn(sd, pre, x, groups):
    return F.group_norm(x, groups, _t(sd, pre + ".weight"), _t(sd, pre + ".bias"), eps=1e-6)


def _resnet(sd, pre, x, groups):
    h = _conv(sd, pre + ".conv1", F.silu(_gn(sd, pre + ".norm1", x, groups)))
    h = _conv(sd, pre + ".conv2", F.silu(_gn(sd, pre + ".norm2", h, groups)))
    if pre + ".nin_shortcut.weight" in sd:
        x = F.conv2d(x, _t(sd, pre + ".nin_shortcut.weight"), _t(sd, pre + ".nin_shortcut.bias"))
    return x + h


def _attn(sd, pre, x, groups):
    b, c, h, w = x.shape
    y = _gn(sd, pre + ".norm", x, groups)
    q = F.conv2d(y, _t(sd, pre + ".q.weight"), _t(sd, pre + ".q.bias")).reshape(b, c, h * w)
    k = F.conv2d(y, _t(sd, pre + ".k.weight"), _t(sd, pre + ".k.bias")).reshape(b, c, h * w)
    v = F.conv2d(y, _t(sd, pre + ".v.weight"), _t(sd, pre + ".v.bias")).reshape(b, c, h * w)
    attn = torch.softmax(torch.einsum("bcq,bck->bqk", q, k) / c**0.5, dim=-1)
    o = torch.einsum("bqk,bck->bcq", attn, v).reshape(b, c, h, w)
    return x + F.conv2d(o, _t(sd, pre + ".proj_out.weight"), _t(sd, pre + ".proj_out.bias"))


def _mid(sd, pre, x, groups):
    x = _resnet(sd, pre + "mid.block_1", x, groups)
    x = _attn(sd, pre + "mid.attn_1", x, groups)
    return _resnet(sd, pre + "mid.block_2", x, groups)


def test_vae_decoder_parity():
    channels = (8, 16, 16, 16)
    groups, layers = 4, 3
    sd = {k: np.asarray(v) for k, v in _vae_raw("decoder.", layers, channels, 16, 3, down=False).items()}
    x = np.random.RandomState(0).randn(1, 16, 4, 4).astype(np.float32)

    with torch.no_grad():
        t = _conv(sd, "decoder.conv_in", torch.from_numpy(x))
        t = _mid(sd, "decoder.", t, groups)
        # sgm decoder applies up blocks from index len-1 down to 0.
        for i in reversed(range(len(channels))):
            for j in range(layers):
                t = _resnet(sd, f"decoder.up.{i}.block.{j}", t, groups)
            if f"decoder.up.{i}.upsample.conv.weight" in sd:
                t = F.interpolate(t, scale_factor=2, mode="nearest")
                t = _conv(sd, f"decoder.up.{i}.upsample.conv", t)
        t = _conv(sd, "decoder.conv_out", F.silu(_gn(sd, "decoder.norm_out", t, groups)))
        want = t.permute(0, 2, 3, 1).numpy()

    params = vae_decoder_params_from_ckpt(sd, jnp.float32, prefix="decoder.", layers_per_block=layers)
    config = VAEDecoderConfig(block_out_channels=channels, layers_per_block=layers, resnet_groups=groups)
    got = np.asarray(apply_vae_decoder(params, jnp.asarray(x.transpose(0, 2, 3, 1)), config))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_vae_encoder_parity():
    channels = (8, 16, 16, 16)
    groups, layers = 4, 2
    sd = {k: np.asarray(v) for k, v in _vae_raw("encoder.", layers, channels, 3, 32, down=True).items()}
    x = np.random.RandomState(1).randn(1, 3, 32, 32).astype(np.float32)

    with torch.no_grad():
        t = _conv(sd, "encoder.conv_in", torch.from_numpy(x))
        for i in range(len(channels)):
            for j in range(layers):
                t = _resnet(sd, f"encoder.down.{i}.block.{j}", t, groups)
            if f"encoder.down.{i}.downsample.conv.weight" in sd:
                # sgm downsample: asymmetric (0,1,0,1) pad + stride-2 valid conv
                t = F.pad(t, (0, 1, 0, 1))
                t = F.conv2d(t, _t(sd, f"encoder.down.{i}.downsample.conv.weight"),
                             _t(sd, f"encoder.down.{i}.downsample.conv.bias"), stride=2)
        t = _mid(sd, "encoder.", t, groups)
        t = _conv(sd, "encoder.conv_out", F.silu(_gn(sd, "encoder.norm_out", t, groups)))
        want = t.permute(0, 2, 3, 1).numpy()

    params = vae_encoder_params_from_ckpt(sd, jnp.float32, prefix="encoder.", layers_per_block=layers)
    config = VAEEncoderConfig(block_out_channels=channels, layers_per_block=layers, resnet_groups=groups)
    got = np.asarray(apply_vae_encoder(params, jnp.asarray(x.transpose(0, 2, 3, 1)), config))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)
