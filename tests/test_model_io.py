"""Checkpoint-mapper tests against synthetic raw state dicts.

Builds flat state dicts in the *raw checkpoint layouts* (sgm SD3 namespace,
BFL FLUX namespace, HF CLIP/T5 namespaces — the layouts consumed by reference
model_io.py:130-612) and checks that the mappers produce forward-runnable
pytrees with the documented split/transpose semantics.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from diffusionkit_tpu.config import (
    CLIPTextModelConfig,
    MMDiTConfig,
    PositionalEncoding,
    T5Config,
)
from diffusionkit_tpu.model_io import (
    clip_params_from_hf_ckpt,
    dequantize_mlx_4bit,
    mmdit_params_from_flux_ckpt,
    mmdit_params_from_sd3_ckpt,
    t5_params_from_ckpt,
    vae_decoder_params_from_ckpt,
    vae_encoder_params_from_ckpt,
)
from diffusionkit_tpu.models import (
    apply_clip,
    apply_mmdit,
    apply_t5_encoder,
    apply_vae_decoder,
    apply_vae_encoder,
)
from diffusionkit_tpu.config import VAEDecoderConfig, VAEEncoderConfig

TINY_SD3 = MMDiTConfig(
    depth_multimodal=2, num_heads=2, hidden_size_override=64,
    max_latent_resolution=8, dtype=jnp.float32,
)
TINY_FLUX = MMDiTConfig(
    depth_multimodal=1, depth_unified=2, num_heads=2, hidden_size_override=64,
    patchify_via_reshape=True, pos_embed_type=PositionalEncoding.PreSDPARope,
    rope_axes_dim=(8, 12, 12), pooled_text_embed_dim=96, use_qk_norm=True,
    guidance_embed=False, dtype=jnp.float32,
)

_rs = np.random.RandomState(42)


def _w(*shape):
    return (_rs.randn(*shape) * 0.02).astype(np.float32)


def _sd3_raw_ckpt(config):
    H = config.hidden_size
    sd = {}
    pfx = "model.diffusion_model."
    for i in range(config.depth_multimodal):
        last = i == config.depth_multimodal - 1
        for blk in ["x_block", "context_block"]:
            b = f"{pfx}joint_blocks.{i}.{blk}"
            sd[f"{b}.attn.qkv.weight"] = _w(3 * H, H)
            sd[f"{b}.attn.qkv.bias"] = _w(3 * H)
            skip = last and blk == "context_block"
            n_mod = 2 if skip else 6
            sd[f"{b}.adaLN_modulation.1.weight"] = _w(n_mod * H, H)
            sd[f"{b}.adaLN_modulation.1.bias"] = _w(n_mod * H)
            if not skip:
                sd[f"{b}.attn.proj.weight"] = _w(H, H)
                sd[f"{b}.attn.proj.bias"] = _w(H)
                sd[f"{b}.mlp.fc1.weight"] = _w(4 * H, H)
                sd[f"{b}.mlp.fc1.bias"] = _w(4 * H)
                sd[f"{b}.mlp.fc2.weight"] = _w(H, 4 * H)
                sd[f"{b}.mlp.fc2.bias"] = _w(H)
    sd[pfx + "x_embedder.proj.weight"] = _w(H, 16, 2, 2)
    sd[pfx + "x_embedder.proj.bias"] = _w(H)
    R = config.max_latent_resolution
    sd[pfx + "pos_embed"] = _w(1, R * R, H)
    sd[pfx + "context_embedder.weight"] = _w(H, 4096)
    sd[pfx + "context_embedder.bias"] = _w(H)
    for name, din in [("t_embedder", 256), ("y_embedder", config.pooled_text_embed_dim)]:
        sd[f"{pfx}{name}.mlp.0.weight"] = _w(H, din)
        sd[f"{pfx}{name}.mlp.0.bias"] = _w(H)
        sd[f"{pfx}{name}.mlp.2.weight"] = _w(H, H)
        sd[f"{pfx}{name}.mlp.2.bias"] = _w(H)
    sd[pfx + "final_layer.adaLN_modulation.1.weight"] = _w(2 * H, H)
    sd[pfx + "final_layer.adaLN_modulation.1.bias"] = _w(2 * H)
    sd[pfx + "final_layer.linear.weight"] = _w(4 * 16, H)
    sd[pfx + "final_layer.linear.bias"] = _w(4 * 16)
    return sd


def test_sd3_mapper_forward():
    sd = _sd3_raw_ckpt(TINY_SD3)
    params = mmdit_params_from_sd3_ckpt(sd, TINY_SD3, jnp.float32)
    # qkv row-split semantics: q rows are the first H rows, transposed.
    want_q = sd["model.diffusion_model.joint_blocks.0.x_block.attn.qkv.weight"][:64].T
    np.testing.assert_allclose(
        np.asarray(params["mm_blocks"]["img"]["q"]["kernel"][0]), want_q, atol=1e-7
    )
    # k bias dropped.
    assert params["mm_blocks"]["img"]["k"]["bias"] is None
    out = apply_mmdit(
        params, TINY_SD3,
        jnp.zeros((1, 8, 8, 16)), jnp.zeros((1, 7, 4096)),
        jnp.zeros((1, 2048)), jnp.asarray([500.0]),
    )
    assert out.shape == (1, 8, 8, 16)
    assert jnp.isfinite(out).all()


def test_sd3_patch_conv_fold_matches_conv():
    """Folded x_embedder matmul == the reference k=2/s=2 conv (mmdit.py:285-290)."""
    import torch

    sd = _sd3_raw_ckpt(TINY_SD3)
    params = mmdit_params_from_sd3_ckpt(sd, TINY_SD3, jnp.float32)
    x = _rs.randn(1, 16, 8, 8).astype(np.float32)  # NCHW for torch
    w = torch.from_numpy(sd["model.diffusion_model.x_embedder.proj.weight"])
    b = torch.from_numpy(sd["model.diffusion_model.x_embedder.proj.bias"])
    conv = torch.nn.functional.conv2d(torch.from_numpy(x), w, b, stride=2)
    # (1, H, 4, 4) -> (1, 16, H) token-major
    want = conv.permute(0, 2, 3, 1).reshape(1, 16, -1).numpy()

    from diffusionkit_tpu.ops.common import linear, patchify

    tokens = patchify(jnp.asarray(x.transpose(0, 2, 3, 1)), 2)
    got = np.asarray(linear(params["x_embedder"], tokens))
    np.testing.assert_allclose(got, want, atol=1e-5)


def _flux_raw_ckpt(config):
    H = config.hidden_size
    hd = H // config.num_heads
    mlp = config.mlp_ratio
    sd = {}
    for i in range(config.depth_multimodal):
        b = f"double_blocks.{i}"
        for tag in ["img", "txt"]:
            sd[f"{b}.{tag}_attn.qkv.weight"] = _w(3 * H, H)
            sd[f"{b}.{tag}_attn.qkv.bias"] = _w(3 * H)
            sd[f"{b}.{tag}_attn.proj.weight"] = _w(H, H)
            sd[f"{b}.{tag}_attn.proj.bias"] = _w(H)
            sd[f"{b}.{tag}_attn.norm.query_norm.scale"] = _w(hd) + 1
            sd[f"{b}.{tag}_attn.norm.key_norm.scale"] = _w(hd) + 1
            sd[f"{b}.{tag}_mlp.0.weight"] = _w(mlp * H, H)
            sd[f"{b}.{tag}_mlp.0.bias"] = _w(mlp * H)
            sd[f"{b}.{tag}_mlp.2.weight"] = _w(H, mlp * H)
            sd[f"{b}.{tag}_mlp.2.bias"] = _w(H)
            sd[f"{b}.{tag}_mod.lin.weight"] = _w(6 * H, H)
            sd[f"{b}.{tag}_mod.lin.bias"] = _w(6 * H)
    for i in range(config.depth_unified):
        b = f"single_blocks.{i}"
        sd[f"{b}.linear1.weight"] = _w((3 + mlp) * H, H)
        sd[f"{b}.linear1.bias"] = _w((3 + mlp) * H)
        sd[f"{b}.linear2.weight"] = _w(H, (1 + mlp) * H)
        sd[f"{b}.linear2.bias"] = _w(H)
        sd[f"{b}.modulation.lin.weight"] = _w(3 * H, H)
        sd[f"{b}.modulation.lin.bias"] = _w(3 * H)
        sd[f"{b}.norm.query_norm.scale"] = _w(hd) + 1
        sd[f"{b}.norm.key_norm.scale"] = _w(hd) + 1
    sd["img_in.weight"] = _w(H, 16 * 4)
    sd["img_in.bias"] = _w(H)
    sd["txt_in.weight"] = _w(H, 4096)
    sd["txt_in.bias"] = _w(H)
    for name, din in [("time_in", 256), ("vector_in", config.pooled_text_embed_dim)]:
        sd[f"{name}.in_layer.weight"] = _w(H, din)
        sd[f"{name}.in_layer.bias"] = _w(H)
        sd[f"{name}.out_layer.weight"] = _w(H, H)
        sd[f"{name}.out_layer.bias"] = _w(H)
    sd["final_layer.adaLN_modulation.1.weight"] = _w(2 * H, H)
    sd["final_layer.adaLN_modulation.1.bias"] = _w(2 * H)
    sd["final_layer.linear.weight"] = _w(4 * 16, H)
    sd["final_layer.linear.bias"] = _w(4 * 16)
    return sd


def test_flux_mapper_forward():
    sd = _flux_raw_ckpt(TINY_FLUX)
    params = mmdit_params_from_flux_ckpt(sd, TINY_FLUX, jnp.float32)
    H = 64
    # linear1 row-split: fc1 rows start at 3H.
    want_fc1 = sd["single_blocks.0.linear1.weight"][3 * H :].T
    np.testing.assert_allclose(
        np.asarray(params["uni_blocks"]["fc1"]["kernel"][0]), want_fc1, atol=1e-7
    )
    # linear2 col-split: o takes the first H cols; shared bias on o only.
    want_o = sd["single_blocks.0.linear2.weight"][:, :H].T
    np.testing.assert_allclose(
        np.asarray(params["uni_blocks"]["o"]["kernel"][0]), want_o, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(params["uni_blocks"]["o"]["bias"][0]),
        sd["single_blocks.0.linear2.bias"], atol=1e-7,
    )
    assert params["uni_blocks"]["fc2"]["bias"] is None
    out = apply_mmdit(
        params, TINY_FLUX,
        jnp.zeros((1, 8, 8, 16)), jnp.zeros((1, 7, 4096)),
        jnp.zeros((1, 96)), jnp.asarray([500.0]),
    )
    assert out.shape == (1, 8, 8, 16)
    assert jnp.isfinite(out).all()


def _vae_raw(prefix, layers, channels, in_ch, out_ch, down):
    sd = {}
    cs = channels
    sd[prefix + "conv_in.weight"] = _w(cs[0] if down else cs[-1], in_ch, 3, 3)
    sd[prefix + "conv_in.bias"] = _w(cs[0] if down else cs[-1])
    mid_c = cs[-1]
    for blk in ["block_1", "block_2"]:
        for n in ["norm1", "norm2"]:
            sd[f"{prefix}mid.{blk}.{n}.weight"] = _w(mid_c) + 1
            sd[f"{prefix}mid.{blk}.{n}.bias"] = _w(mid_c)
        sd[f"{prefix}mid.{blk}.conv1.weight"] = _w(mid_c, mid_c, 3, 3)
        sd[f"{prefix}mid.{blk}.conv1.bias"] = _w(mid_c)
        sd[f"{prefix}mid.{blk}.conv2.weight"] = _w(mid_c, mid_c, 3, 3)
        sd[f"{prefix}mid.{blk}.conv2.bias"] = _w(mid_c)
    sd[f"{prefix}mid.attn_1.norm.weight"] = _w(mid_c) + 1
    sd[f"{prefix}mid.attn_1.norm.bias"] = _w(mid_c)
    for n in ["q", "k", "v", "proj_out"]:
        sd[f"{prefix}mid.attn_1.{n}.weight"] = _w(mid_c, mid_c, 1, 1)
        sd[f"{prefix}mid.attn_1.{n}.bias"] = _w(mid_c)

    if down:
        seq = list(zip([cs[0]] + list(cs), cs))
        word = "down"
    else:
        rev = list(reversed(cs))
        seq = list(zip([rev[0]] + rev, rev))
        word = "up"
    for i, (cin, cout) in enumerate(seq[: len(cs)]):
        for j in range(layers):
            cin_j = cin if j == 0 else cout
            b = f"{prefix}{word}.{i}.block.{j}"
            # decoder's up list is indexed 0 = lowest resolution
            if not down:
                b = f"{prefix}{word}.{len(cs)-1-i}.block.{j}"
                cin_j = cin if j == 0 else cout
            sd[f"{b}.norm1.weight"] = _w(cin_j) + 1
            sd[f"{b}.norm1.bias"] = _w(cin_j)
            sd[f"{b}.conv1.weight"] = _w(cout, cin_j, 3, 3)
            sd[f"{b}.conv1.bias"] = _w(cout)
            sd[f"{b}.norm2.weight"] = _w(cout) + 1
            sd[f"{b}.norm2.bias"] = _w(cout)
            sd[f"{b}.conv2.weight"] = _w(cout, cout, 3, 3)
            sd[f"{b}.conv2.bias"] = _w(cout)
            if cin_j != cout:
                sd[f"{b}.nin_shortcut.weight"] = _w(cout, cin_j, 1, 1)
                sd[f"{b}.nin_shortcut.bias"] = _w(cout)
        if i < len(cs) - 1:
            if down:
                sd[f"{prefix}down.{i}.downsample.conv.weight"] = _w(cout, cout, 3, 3)
                sd[f"{prefix}down.{i}.downsample.conv.bias"] = _w(cout)
            else:
                idx = len(cs) - 1 - i
                sd[f"{prefix}up.{idx}.upsample.conv.weight"] = _w(cout, cout, 3, 3)
                sd[f"{prefix}up.{idx}.upsample.conv.bias"] = _w(cout)
    last = cs[0] if not down else cs[-1]
    sd[prefix + "norm_out.weight"] = _w(last) + 1
    sd[prefix + "norm_out.bias"] = _w(last)
    sd[prefix + "conv_out.weight"] = _w(out_ch, last, 3, 3)
    sd[prefix + "conv_out.bias"] = _w(out_ch)
    return sd


def test_vae_decoder_mapper_forward():
    channels = (8, 16, 16, 16)
    sd = _vae_raw("first_stage_model.decoder.", 3, channels, 16, 3, down=False)
    params = vae_decoder_params_from_ckpt(
        sd, jnp.float32, prefix="first_stage_model.decoder.", layers_per_block=3
    )
    config = VAEDecoderConfig(block_out_channels=channels, layers_per_block=3, resnet_groups=4)
    out = apply_vae_decoder(params, jnp.zeros((1, 4, 4, 16)), config)
    assert out.shape == (1, 32, 32, 3)
    assert jnp.isfinite(out).all()


def test_vae_encoder_mapper_forward():
    channels = (8, 16, 16, 16)
    sd = _vae_raw("encoder.", 2, channels, 3, 32, down=True)
    params = vae_encoder_params_from_ckpt(sd, jnp.float32, prefix="encoder.", layers_per_block=2)
    config = VAEEncoderConfig(block_out_channels=channels, layers_per_block=2, resnet_groups=4)
    out = apply_vae_encoder(params, jnp.zeros((1, 32, 32, 3)), config)
    assert out.shape == (1, 4, 4, 32)
    assert jnp.isfinite(out).all()


def test_clip_mapper_forward():
    config = CLIPTextModelConfig(
        num_layers=2, model_dims=32, num_heads=2, max_length=16,
        vocab_size=50, projection_dim=24, hidden_act="gelu",
    )
    d = 32
    sd = {
        "text_model.embeddings.token_embedding.weight": _w(50, d),
        "text_model.embeddings.position_embedding.weight": _w(16, d),
        "text_model.final_layer_norm.weight": _w(d) + 1,
        "text_model.final_layer_norm.bias": _w(d),
        "text_projection.weight": _w(24, d),
    }
    for i in range(2):
        pre = f"text_model.encoder.layers.{i}"
        for ln in ["layer_norm1", "layer_norm2"]:
            sd[f"{pre}.{ln}.weight"] = _w(d) + 1
            sd[f"{pre}.{ln}.bias"] = _w(d)
        for proj in ["q_proj", "k_proj", "v_proj", "out_proj"]:
            sd[f"{pre}.self_attn.{proj}.weight"] = _w(d, d)
            sd[f"{pre}.self_attn.{proj}.bias"] = _w(d)
        sd[f"{pre}.mlp.fc1.weight"] = _w(4 * d, d)
        sd[f"{pre}.mlp.fc1.bias"] = _w(4 * d)
        sd[f"{pre}.mlp.fc2.weight"] = _w(d, 4 * d)
        sd[f"{pre}.mlp.fc2.bias"] = _w(d)
    params = clip_params_from_hf_ckpt(sd, config, jnp.float32)
    out = apply_clip(params, jnp.asarray([[49, 3, 5, 48, 0]], jnp.int32), config)
    assert out.pooled_output.shape == (1, 24)
    assert out.last_hidden_state.shape == (1, 5, 32)


def test_t5_mapper_forward():
    config = T5Config(vocab_size=60, d_model=32, d_kv=8, d_ff=48, num_layers=2, num_heads=4)
    sd = {"shared.weight": _w(60, 32)}
    sd["encoder.final_layer_norm.weight"] = _w(32) + 1
    sd["encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight"] = _w(32, 4)
    for i in range(2):
        pre = f"encoder.block.{i}"
        sd[f"{pre}.layer.0.layer_norm.weight"] = _w(32) + 1
        sd[f"{pre}.layer.1.layer_norm.weight"] = _w(32) + 1
        for n, shape in [("q", (32, 32)), ("k", (32, 32)), ("v", (32, 32)), ("o", (32, 32))]:
            sd[f"{pre}.layer.0.SelfAttention.{n}.weight"] = _w(*shape)
        sd[f"{pre}.layer.1.DenseReluDense.wi_0.weight"] = _w(48, 32)
        sd[f"{pre}.layer.1.DenseReluDense.wi_1.weight"] = _w(48, 32)
        sd[f"{pre}.layer.1.DenseReluDense.wo.weight"] = _w(32, 48)
    params = t5_params_from_ckpt(sd, config, jnp.float32)
    out = apply_t5_encoder(params, jnp.asarray([[1, 2, 3, 4]], jnp.int32), config)
    assert out.shape == (1, 4, 32)
    assert jnp.isfinite(out).all()


def test_dequantize_mlx_4bit_roundtrip():
    """Pack known 4-bit values the MLX way and check exact recovery."""
    rs = np.random.RandomState(0)
    out_dim, in_dim, group = 4, 128, 64
    q = rs.randint(0, 16, size=(out_dim, in_dim)).astype(np.uint32)
    packed = np.zeros((out_dim, in_dim // 8), dtype=np.uint32)
    for j in range(8):
        packed |= q[:, j::8] << (4 * j)
    scales = rs.rand(out_dim, in_dim // group).astype(np.float32) + 0.5
    biases = rs.randn(out_dim, in_dim // group).astype(np.float32)
    got = dequantize_mlx_4bit(packed, scales, biases, group)
    want = q.astype(np.float32) * np.repeat(scales, group, 1) + np.repeat(biases, group, 1)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_mmap_safetensors_reader_roundtrip(tmp_path):
    """Zero-copy reader vs the safetensors package writer (incl. bf16)."""
    import ml_dtypes
    from safetensors.numpy import save_file

    from diffusionkit_tpu.model_io import load_safetensors

    rs = np.random.RandomState(0)
    tensors = {
        "a.weight": rs.randn(16, 8).astype(np.float32),
        "b.weight": rs.randn(4, 4, 2).astype(np.float16),
        "c.bias": rs.randn(7).astype(np.float32).astype(ml_dtypes.bfloat16),
        "d.packed": rs.randint(0, 2**32 - 1, size=(3, 5), dtype=np.uint32),
    }
    path = tmp_path / "test.safetensors"
    save_file(tensors, str(path))
    got = load_safetensors(path)
    assert set(got) == set(tensors)
    for k in tensors:
        assert got[k].dtype == tensors[k].dtype
        np.testing.assert_array_equal(
            np.asarray(got[k], dtype=np.float64)
            if got[k].dtype != np.uint32
            else got[k],
            np.asarray(tensors[k], dtype=np.float64)
            if tensors[k].dtype != np.uint32
            else tensors[k],
        )


def test_native_dtype_conversions():
    """native/dkio.cpp conversions vs numpy (falls back silently if no g++)."""
    import ml_dtypes

    from diffusionkit_tpu import native

    rs = np.random.RandomState(1)
    x16 = rs.randn(1000).astype(np.float16)
    np.testing.assert_array_equal(native.f16_to_f32(x16), x16.astype(np.float32))
    x32 = rs.randn(1000).astype(np.float32)
    np.testing.assert_array_equal(
        np.asarray(native.f32_to_bf16(x32)),
        x32.astype(ml_dtypes.bfloat16),
    )


def test_sd35_mapper_qk_norm():
    """SD3.5-style checkpoints carry attn.ln_q/ln_k RMSNorm scales
    (reference model_io.py:352-358)."""
    cfg = dataclasses.replace(TINY_SD3, use_qk_norm=True, depth_multimodal=2)
    sd = _sd3_raw_ckpt(cfg)
    hd = cfg.head_dim
    for i in range(2):
        for blk in ["x_block", "context_block"]:
            b = f"model.diffusion_model.joint_blocks.{i}.{blk}"
            sd[f"{b}.attn.ln_q.weight"] = _w(hd) + 1
            sd[f"{b}.attn.ln_k.weight"] = _w(hd) + 1
    params = mmdit_params_from_sd3_ckpt(sd, cfg, jnp.float32)
    assert "qk_norm" in params["mm_blocks"]["img"]
    want = sd["model.diffusion_model.joint_blocks.0.x_block.attn.ln_q.weight"]
    np.testing.assert_allclose(
        np.asarray(params["mm_blocks"]["img"]["qk_norm"]["q_scale"][0]), want
    )
    out = apply_mmdit(
        params, cfg,
        jnp.zeros((1, 8, 8, 16)), jnp.zeros((1, 7, 4096)),
        jnp.zeros((1, 2048)), jnp.asarray([500.0]),
    )
    assert jnp.isfinite(out).all()


def test_tree_num_params():
    from diffusionkit_tpu.utils import tree_num_params

    tree = {"a": np.zeros((2, 3)), "b": {"c": np.zeros(5), "d": None}}
    assert tree_num_params(tree) == 11


def test_save_load_params_roundtrip(tmp_path):
    """Native-layout checkpoint cache round trip (incl. stacked + quantized
    leaves and skipped None biases)."""
    from diffusionkit_tpu.model_io import load_params, save_params
    from diffusionkit_tpu.models import init_mmdit_params

    params = init_mmdit_params(jax.random.PRNGKey(0), TINY_SD3)
    path = tmp_path / "mmdit.safetensors"
    save_params(params, path)
    back = load_params(path, to_device=False)

    flat_a = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_b = jax.tree_util.tree_flatten_with_path(back)[0]
    assert len(flat_a) == len(flat_b)
    for (pa, va), (pb, vb) in zip(flat_a, flat_b):
        assert jax.tree_util.keystr(pa) == jax.tree_util.keystr(pb)
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))
    # Forward parity
    args = (jnp.zeros((1, 8, 8, 16)), jnp.zeros((1, 7, 4096)),
            jnp.zeros((1, 2048)), jnp.asarray([500.0]))
    np.testing.assert_allclose(
        np.asarray(apply_mmdit(params, TINY_SD3, *args)),
        np.asarray(apply_mmdit(jax.device_put(back), TINY_SD3, *args)),
        atol=1e-5,
    )


# ---------------------------------------------------------------------------
# Generic autoencoder (reference vae.py:152-334 + model_io.py:826-855)
# ---------------------------------------------------------------------------

TINY_AE_CFG = dict(
    in_channels=3, out_channels=3, latent_channels_out=8, latent_channels_in=4,
    block_out_channels=(8, 16), layers_per_block=1, norm_num_groups=4,
    scaling_factor=0.13025,
)


def _ae_to_diffusers_sd(params, n_blocks, layers_enc, layers_dec):
    """Inverse of autoencoder_params_from_diffusers_ckpt: emit an HF-diffusers
    AutoencoderKL state dict from a pytree, so mapping it back must reproduce
    the tree exactly (pins every transpose, the decoder up_blocks flip, and
    the 1x1-conv squeeze)."""
    sd = {}

    def conv(key, p):
        sd[key + ".weight"] = np.asarray(p["kernel"]).transpose(3, 2, 0, 1)
        sd[key + ".bias"] = np.asarray(p["bias"])

    def lin(key, p, as_conv=False):
        w = np.asarray(p["kernel"]).T
        sd[key + ".weight"] = w[:, :, None, None] if as_conv else w
        if p.get("bias") is not None:
            sd[key + ".bias"] = np.asarray(p["bias"])

    def norm(key, p):
        sd[key + ".weight"] = np.asarray(p["weight"])
        sd[key + ".bias"] = np.asarray(p["bias"])

    def resnet(key, p):
        norm(key + ".norm1", p["norm1"])
        conv(key + ".conv1", p["conv1"])
        norm(key + ".norm2", p["norm2"])
        conv(key + ".conv2", p["conv2"])
        if "conv_shortcut" in p:
            lin(key + ".conv_shortcut", p["conv_shortcut"], as_conv=True)

    def attn(key, p):
        norm(key + ".group_norm", p["group_norm"])
        lin(key + ".to_q", p["query_proj"])
        lin(key + ".to_k", p["key_proj"])
        lin(key + ".to_v", p["value_proj"])
        lin(key + ".to_out.0", p["out_proj"])

    def mid(side, blocks):
        resnet(f"{side}.mid_block.resnets.0", blocks[0])
        attn(f"{side}.mid_block.attentions.0", blocks[1])
        resnet(f"{side}.mid_block.resnets.1", blocks[2])

    enc = params["encoder"]
    conv("encoder.conv_in", enc["conv_in"])
    for i, bp in enumerate(enc["down_blocks"]):
        for j, rp in enumerate(bp["resnets"]):
            resnet(f"encoder.down_blocks.{i}.resnets.{j}", rp)
        if "downsample" in bp:
            conv(f"encoder.down_blocks.{i}.downsamplers.0.conv", bp["downsample"])
    mid("encoder", enc["mid_blocks"])
    norm("encoder.conv_norm_out", enc["conv_norm_out"])
    conv("encoder.conv_out", enc["conv_out"])

    dec = params["decoder"]
    conv("decoder.conv_in", dec["conv_in"])
    mid("decoder", dec["mid_blocks"])
    # pytree stores up_blocks outermost-first (applied reversed); diffusers
    # stores them in application order -> flip back.
    for i, bp in enumerate(reversed(dec["up_blocks"])):
        for j, rp in enumerate(bp["resnets"]):
            resnet(f"decoder.up_blocks.{i}.resnets.{j}", rp)
        if "upsample" in bp:
            conv(f"decoder.up_blocks.{i}.upsamplers.0.conv", bp["upsample"])
    norm("decoder.conv_norm_out", dec["conv_norm_out"])
    conv("decoder.conv_out", dec["conv_out"])

    lin("quant_conv", params["quant_proj"], as_conv=True)
    lin("post_quant_conv", params["post_quant_proj"], as_conv=True)
    return sd


def test_autoencoder_diffusers_mapper_roundtrip():
    """Map(inverse-map(tree)) == tree, and the mapped model runs e2e."""
    from diffusionkit_tpu.config import AutoencoderConfig
    from diffusionkit_tpu.model_io import autoencoder_params_from_diffusers_ckpt
    from diffusionkit_tpu.models import apply_autoencoder, init_autoencoder_params

    config = AutoencoderConfig(**TINY_AE_CFG)
    params = init_autoencoder_params(jax.random.PRNGKey(0), config, jnp.float32)
    sd = _ae_to_diffusers_sd(
        params, len(config.block_out_channels),
        config.layers_per_block, config.layers_per_block + 1,
    )
    back = autoencoder_params_from_diffusers_ckpt(sd, config, jnp.float32)

    want = jax.tree.leaves(params)
    got = jax.tree.leaves(back)
    assert len(want) == len(got)
    for w, g in zip(want, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=1e-7)

    x = jnp.asarray(_rs.randn(1, 16, 16, 3).astype(np.float32))
    out = apply_autoencoder(jax.device_put(back), x, jax.random.PRNGKey(1), config)
    assert out["x_hat"].shape == (1, 16, 16, 3)
    # one downsampling block pair -> latent at half resolution
    assert out["z"].shape == (1, 8, 8, config.latent_channels_in)
    assert out["mean"].shape == out["logvar"].shape == out["z"].shape
    for v in out.values():
        assert jnp.isfinite(v).all()


def test_autoencoder_scaling_factor_roundtrip():
    """encode folds the scaling factor into (mean, logvar); decode divides it
    out (reference vae.py:312-326): decode(encode-mean) must be invariant to
    the scaling factor choice."""
    from diffusionkit_tpu.config import AutoencoderConfig
    from diffusionkit_tpu.models import (
        autoencoder_decode,
        autoencoder_encode,
        init_autoencoder_params,
    )

    c1 = AutoencoderConfig(**TINY_AE_CFG)
    c2 = AutoencoderConfig(**{**TINY_AE_CFG, "scaling_factor": 1.0})
    params = init_autoencoder_params(jax.random.PRNGKey(2), c1, jnp.float32)
    x = jnp.asarray(_rs.randn(1, 16, 16, 3).astype(np.float32))
    m1, lv1 = autoencoder_encode(params, x, c1)
    m2, lv2 = autoencoder_encode(params, x, c2)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2) * c1.scaling_factor, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(lv1), np.asarray(lv2) + 2 * np.log(c1.scaling_factor), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(autoencoder_decode(params, m1, c1)),
        np.asarray(autoencoder_decode(params, m2, c2)),
        atol=1e-5,
    )


def test_load_autoencoder_local_mirror(tmp_path, monkeypatch):
    """load_autoencoder end-to-end from a fabricated local HF-diffusers VAE
    (config.json + safetensors under <root>/argmaxinc/stable-diffusion/vae/),
    mirroring reference model_io.py:826-855 — including its forced
    latent_channels = 16."""
    import json as _json

    from safetensors.numpy import save_file

    from diffusionkit_tpu.config import AutoencoderConfig
    from diffusionkit_tpu.model_io import load_autoencoder
    from diffusionkit_tpu.models import init_autoencoder_params

    cfg = dict(TINY_AE_CFG, latent_channels_out=32, latent_channels_in=16)
    config = AutoencoderConfig(**cfg)
    params = init_autoencoder_params(jax.random.PRNGKey(3), config, jnp.float32)
    sd = _ae_to_diffusers_sd(
        params, len(config.block_out_channels),
        config.layers_per_block, config.layers_per_block + 1,
    )
    vae_dir = tmp_path / "argmaxinc/stable-diffusion/vae"
    vae_dir.mkdir(parents=True)
    with open(vae_dir / "config.json", "w") as f:
        _json.dump(
            {
                "in_channels": 3, "out_channels": 3,
                "latent_channels": 4,  # loader must override to 16
                "block_out_channels": list(config.block_out_channels),
                "layers_per_block": config.layers_per_block,
                "norm_num_groups": config.norm_num_groups,
                "scaling_factor": 0.13025,
            },
            f,
        )
    save_file({k: np.ascontiguousarray(v) for k, v in sd.items()},
              str(vae_dir / "diffusion_pytorch_model.safetensors"))
    monkeypatch.setenv("DIFFUSIONKIT_TPU_CKPT_DIR", str(tmp_path))
    loaded, lconfig = load_autoencoder()
    assert lconfig.latent_channels_in == 16 and lconfig.latent_channels_out == 32
    assert lconfig.scaling_factor == 0.13025
    want = jax.tree.leaves(params)
    got = jax.tree.leaves(loaded)
    assert len(want) == len(got)
    for w, g in zip(want, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=1e-7)
