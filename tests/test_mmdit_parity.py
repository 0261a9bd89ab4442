"""MMDiT parity vs an independent torch reimplementation.

Both sides consume the SAME raw checkpoint state dicts (sgm SD3 namespace /
BFL FLUX namespace, from test_model_io's builders). The torch side is written
directly from the architectures' definitions — including details our JAX path
implements differently:

- torch applies the FUSED qkv (with its k bias); ours splits and DROPS the k
  bias — outputs must still match (softmax shift invariance).
- torch applies the FLUX unified block's linear1/linear2 UNSPLIT (one fused
  in-projection, one fused out-projection with its single shared bias); ours
  uses the split q/k/v/fc1 + o/fc2 with the bias-on-o rule.

Covers: AdaLN modulation orders, joint-attention sequence order (SD3
image-first vs FLUX text-first), SD3 final K/V-only text block, learned
pos-embed center crop, FLUX 3-axis RoPE, patchify/unpack layouts, timestep
embedding, final layer.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F

import jax.numpy as jnp

from diffusionkit_tpu.model_io import (
    mmdit_params_from_flux_ckpt,
    mmdit_params_from_sd3_ckpt,
)
from diffusionkit_tpu.models import apply_mmdit

from test_model_io import TINY_FLUX, TINY_SD3, _flux_raw_ckpt, _sd3_raw_ckpt


def _t(sd, k):
    return torch.from_numpy(np.asarray(sd[k]))


def _lin(sd, pre, x):
    b = _t(sd, pre + ".bias") if pre + ".bias" in sd else None
    return F.linear(x, _t(sd, pre + ".weight"), b)


def _ln(x):
    return F.layer_norm(x, (x.shape[-1],), eps=1e-6)


def _mod(sd, pre, c, n):
    return _lin(sd, pre, F.silu(c)).chunk(n, dim=-1)


def _heads(x, nh):
    b, s, hdim = x.shape
    return x.reshape(b, s, nh, hdim // nh).transpose(1, 2)


def _timestep_embedding(t, dim, max_period=10000):
    half = dim // 2
    freqs = torch.exp(-np.log(max_period) * torch.arange(half, dtype=torch.float64) / half)
    args = t[:, None].double() * freqs[None]
    return torch.cat([torch.cos(args), torch.sin(args)], -1).float()


def _rope_tables(h, w, txt_len, axes_dim, theta=10000):
    pos = torch.zeros(txt_len + h * w, 3, dtype=torch.float64)
    yy, xx = torch.meshgrid(torch.arange(h), torch.arange(w), indexing="ij")
    pos[txt_len:, 1] = yy.reshape(-1).double()
    pos[txt_len:, 2] = xx.reshape(-1).double()
    angs = []
    for i, d in enumerate(axes_dim):
        omega = 1.0 / theta ** (torch.arange(0, d, 2, dtype=torch.float64) / d)
        angs.append(pos[:, i : i + 1] * omega[None])
    ang = torch.cat(angs, -1)
    return torch.cos(ang).float(), torch.sin(ang).float()


def _apply_rope(x, cos, sin):
    # x: (b, nh, s, d); rotate consecutive (even, odd) pairs.
    xe, xo = x[..., 0::2], x[..., 1::2]
    return torch.stack([cos * xe - sin * xo, sin * xe + cos * xo], -1).reshape(x.shape)


def _joint_attention(q, k, v):
    scale = q.shape[-1] ** -0.5
    attn = torch.softmax(q @ k.transpose(-1, -2) * scale, dim=-1)
    o = attn @ v
    b, nh, s, d = o.shape
    return o.transpose(1, 2).reshape(b, s, nh * d)


def torch_sd3_mmdit(sd, cfg, latent, ctx_text, pooled, t):
    pfx = "model.diffusion_model."
    H, nh, p = cfg.hidden_size, cfg.num_heads, cfg.patch_size
    b, c_in, lh, lw = latent.shape

    x = F.conv2d(latent, _t(sd, pfx + "x_embedder.proj.weight"),
                 _t(sd, pfx + "x_embedder.proj.bias"), stride=p)
    gh, gw = x.shape[-2:]
    x = x.flatten(2).transpose(1, 2)  # (b, gh*gw, H)
    pos = _t(sd, pfx + "pos_embed")[0]  # (R*R, H)
    R = int(round(pos.shape[0] ** 0.5))
    pos = pos.reshape(R, R, H)
    y0, x0 = (R - gh) // 2, (R - gw) // 2
    x = x + pos[y0 : y0 + gh, x0 : x0 + gw].reshape(1, gh * gw, H)

    txt = _lin(sd, pfx + "context_embedder", ctx_text)

    temb = _lin(sd, pfx + "t_embedder.mlp.2",
                F.silu(_lin(sd, pfx + "t_embedder.mlp.0",
                            _timestep_embedding(t, cfg.frequency_embed_dim))))
    yemb = _lin(sd, pfx + "y_embedder.mlp.2",
                F.silu(_lin(sd, pfx + "y_embedder.mlp.0", pooled)))
    c = (temb + yemb)[:, None, :]

    depth = cfg.depth_multimodal
    for i in range(depth):
        last = i == depth - 1
        xb = f"{pfx}joint_blocks.{i}.x_block"
        cb = f"{pfx}joint_blocks.{i}.context_block"
        xm = _mod(sd, xb + ".adaLN_modulation.1", c, 6)
        cm = _mod(sd, cb + ".adaLN_modulation.1", c, 2 if last else 6)

        xh = _ln(x) * (1 + xm[1]) + xm[0]
        th = _ln(txt) * (1 + cm[1]) + cm[0]
        qx, kx, vx = _lin(sd, xb + ".attn.qkv", xh).chunk(3, -1)
        qt, kt, vt = _lin(sd, cb + ".attn.qkv", th).chunk(3, -1)
        # SD3 joint order: image first (reference mmdit.py:607-625).
        q = _heads(torch.cat([qx, qt], 1), nh)
        k = _heads(torch.cat([kx, kt], 1), nh)
        v = _heads(torch.cat([vx, vt], 1), nh)
        o = _joint_attention(q, k, v)
        ox, ot = o[:, : x.shape[1]], o[:, x.shape[1] :]

        x = x + xm[2] * _lin(sd, xb + ".attn.proj", ox)
        mlp_in = _ln(x) * (1 + xm[4]) + xm[3]
        x = x + xm[5] * _lin(sd, xb + ".mlp.fc2",
                             F.gelu(_lin(sd, xb + ".mlp.fc1", mlp_in)))
        if not last:
            txt = txt + cm[2] * _lin(sd, cb + ".attn.proj", ot)
            mlp_in = _ln(txt) * (1 + cm[4]) + cm[3]
            txt = txt + cm[5] * _lin(sd, cb + ".mlp.fc2",
                                     F.gelu(_lin(sd, cb + ".mlp.fc1", mlp_in)))

    fm = _mod(sd, pfx + "final_layer.adaLN_modulation.1", c, 2)
    x = _ln(x) * (1 + fm[1]) + fm[0]
    x = _lin(sd, pfx + "final_layer.linear", x)
    # unpatchify: feature order (ph, pw, c) (reference mmdit.py:975-988)
    x = x.reshape(b, gh, gw, p, p, c_in).permute(0, 1, 3, 2, 4, 5)
    return x.reshape(b, gh * p, gw * p, c_in)


def test_sd3_mmdit_parity():
    cfg = TINY_SD3
    sd = _sd3_raw_ckpt(cfg)
    rs = np.random.RandomState(0)
    latent = rs.randn(2, 16, 8, 8).astype(np.float32)  # NCHW for torch
    ctx = rs.randn(2, 7, 4096).astype(np.float32)
    pooled = rs.randn(2, cfg.pooled_text_embed_dim).astype(np.float32)
    t = np.array([500.0, 250.0], np.float32)

    with torch.no_grad():
        want = torch_sd3_mmdit(
            sd, cfg, torch.from_numpy(latent), torch.from_numpy(ctx),
            torch.from_numpy(pooled), torch.from_numpy(t),
        ).numpy()

    params = mmdit_params_from_sd3_ckpt(sd, cfg, jnp.float32)
    got = np.asarray(apply_mmdit(
        params, cfg, jnp.asarray(latent.transpose(0, 2, 3, 1)),
        jnp.asarray(ctx), jnp.asarray(pooled), jnp.asarray(t),
    ))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def torch_flux_mmdit(sd, cfg, latent, ctx_text, pooled, t):
    H, nh, p = cfg.hidden_size, cfg.num_heads, cfg.patch_size
    b, c_in, lh, lw = latent.shape
    gh, gw = lh // p, lw // p

    # FLUX packing: b c (h ph) (w pw) -> b (h w) (c ph pw)
    x = latent.reshape(b, c_in, gh, p, gw, p).permute(0, 2, 4, 1, 3, 5)
    x = x.reshape(b, gh * gw, c_in * p * p)
    x = _lin(sd, "img_in", x)
    txt = _lin(sd, "txt_in", ctx_text)
    txt_len = txt.shape[1]

    temb = _lin(sd, "time_in.out_layer",
                F.silu(_lin(sd, "time_in.in_layer",
                            _timestep_embedding(t, cfg.frequency_embed_dim))))
    yemb = _lin(sd, "vector_in.out_layer",
                F.silu(_lin(sd, "vector_in.in_layer", pooled)))
    c = (temb + yemb)[:, None, :]

    cos, sin = _rope_tables(gh, gw, txt_len, cfg.rope_axes_dim)
    cos, sin = cos[None, None], sin[None, None]

    def qk_norm(x, wkey):
        w = _t(sd, wkey)
        return x * torch.rsqrt(x.double().pow(2).mean(-1, keepdim=True) + 1e-6).float() * w

    for i in range(cfg.depth_multimodal):
        bpre = f"double_blocks.{i}"
        im = _mod(sd, bpre + ".img_mod.lin", c, 6)
        tm = _mod(sd, bpre + ".txt_mod.lin", c, 6)
        xh = _ln(x) * (1 + im[1]) + im[0]
        th = _ln(txt) * (1 + tm[1]) + tm[0]
        qx, kx, vx = (_heads(z, nh) for z in _lin(sd, bpre + ".img_attn.qkv", xh).chunk(3, -1))
        qt, kt, vt = (_heads(z, nh) for z in _lin(sd, bpre + ".txt_attn.qkv", th).chunk(3, -1))
        qx = qk_norm(qx, bpre + ".img_attn.norm.query_norm.scale")
        kx = qk_norm(kx, bpre + ".img_attn.norm.key_norm.scale")
        qt = qk_norm(qt, bpre + ".txt_attn.norm.query_norm.scale")
        kt = qk_norm(kt, bpre + ".txt_attn.norm.key_norm.scale")
        # FLUX joint order: text first (reference mmdit.py:594-606).
        q = torch.cat([qt, qx], 2)
        k = torch.cat([kt, kx], 2)
        v = torch.cat([vt, vx], 2)
        q, k = _apply_rope(q, cos, sin), _apply_rope(k, cos, sin)
        o = _joint_attention(q, k, v)
        ot, ox = o[:, :txt_len], o[:, txt_len:]
        x = x + im[2] * _lin(sd, bpre + ".img_attn.proj", ox)
        x = x + im[5] * _lin(sd, bpre + ".img_mlp.2",
                             F.gelu(_lin(sd, bpre + ".img_mlp.0",
                                         _ln(x) * (1 + im[4]) + im[3])))
        txt = txt + tm[2] * _lin(sd, bpre + ".txt_attn.proj", ot)
        txt = txt + tm[5] * _lin(sd, bpre + ".txt_mlp.2",
                                 F.gelu(_lin(sd, bpre + ".txt_mlp.0",
                                             _ln(txt) * (1 + tm[4]) + tm[3])))

    u = torch.cat([txt, x], 1)
    for i in range(cfg.depth_unified):
        bpre = f"single_blocks.{i}"
        sm = _mod(sd, bpre + ".modulation.lin", c, 3)
        h = _ln(u) * (1 + sm[1]) + sm[0]
        # UNSPLIT fused projections — the strongest check of our split rules.
        lin1 = _lin(sd, bpre + ".linear1", h)
        qkv, mlp_h = lin1[..., : 3 * H], lin1[..., 3 * H :]
        q, k, v = (_heads(z, nh) for z in qkv.chunk(3, -1))
        q = qk_norm(q, bpre + ".norm.query_norm.scale")
        k = qk_norm(k, bpre + ".norm.key_norm.scale")
        q, k = _apply_rope(q, cos, sin), _apply_rope(k, cos, sin)
        attn = _joint_attention(q, k, v)
        u = u + sm[2] * _lin(sd, bpre + ".linear2",
                             torch.cat([attn, F.gelu(mlp_h)], -1))
    x = u[:, txt_len:]

    fm = _mod(sd, "final_layer.adaLN_modulation.1", c, 2)
    x = _ln(x) * (1 + fm[1]) + fm[0]
    x = _lin(sd, "final_layer.linear", x)
    # unpack: (c ph pw) feature order
    x = x.reshape(b, gh, gw, c_in, p, p).permute(0, 1, 4, 2, 5, 3)
    return x.reshape(b, gh * p, gw * p, c_in)


def test_flux_mmdit_parity():
    cfg = TINY_FLUX
    sd = _flux_raw_ckpt(cfg)
    rs = np.random.RandomState(1)
    latent = rs.randn(2, 16, 8, 8).astype(np.float32)
    ctx = rs.randn(2, 7, 4096).astype(np.float32)
    pooled = rs.randn(2, cfg.pooled_text_embed_dim).astype(np.float32)
    t = np.array([750.0, 100.0], np.float32)

    with torch.no_grad():
        want = torch_flux_mmdit(
            sd, cfg, torch.from_numpy(latent), torch.from_numpy(ctx),
            torch.from_numpy(pooled), torch.from_numpy(t),
        ).numpy()

    params = mmdit_params_from_flux_ckpt(sd, cfg, jnp.float32)
    got = np.asarray(apply_mmdit(
        params, cfg, jnp.asarray(latent.transpose(0, 2, 3, 1)),
        jnp.asarray(ctx), jnp.asarray(pooled), jnp.asarray(t),
    ))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)
