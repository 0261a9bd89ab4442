"""MLX-namespace 4-bit checkpoint loading: lossless repack + mapper parity.

The two ``*-4bit-quantized`` registry models ship PRE-ADJUSTED in the MLX
module namespace with ``nn.quantize`` storage (reference model_io.py:726-734,
764-776). These tests fabricate tiny checkpoints in that exact file format
and assert (a) the nibble repack is bit-identical to MLX dequantisation, and
(b) the mapped model forward equals a float model built from the dequantised
weights.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffusionkit_tpu.config import MMDiTConfig, PositionalEncoding
from diffusionkit_tpu.model_io import (
    dequantize_mlx_4bit,
    detect_mmdit_namespace,
    mlx_q4_to_exec,
    mmdit_params_from_mlx_ckpt,
)
from diffusionkit_tpu.models import apply_mmdit
from diffusionkit_tpu.ops.quantized import _dequant, is_quantized, mlx_quantize_host

GROUP = 32


def test_mlx_q4_to_exec_bit_identical():
    rs = np.random.RandomState(0)
    w = rs.randn(48, 128).astype(np.float32)
    q = mlx_quantize_host(w, group_size=GROUP)
    exec_p = mlx_q4_to_exec(q["weight"], q["scales"], q["biases"], None, jnp.float32)
    ref = dequantize_mlx_4bit(q["weight"], q["scales"], q["biases"])  # (out, in)
    got = np.asarray(_dequant(exec_p, jnp.float32))  # (in, out)
    # Bit-identical: same nibbles, same fp32 affine, only transposed.
    np.testing.assert_array_equal(got, ref.T)
    # And faithful to the source weights within the 4-bit grid spacing.
    max_step = np.repeat(q["scales"], GROUP, axis=1)
    assert np.all(np.abs(ref - w) <= max_step * 0.5 + 1e-6)


def test_mlx_quantize_group_size_inference():
    rs = np.random.RandomState(1)
    w = rs.randn(8, 256).astype(np.float32)
    for g in (32, 64, 128):
        q = mlx_quantize_host(w, group_size=g)
        # group size comes from shapes, never a hardcoded 64
        ref = dequantize_mlx_4bit(q["weight"], q["scales"], q["biases"])
        assert np.all(np.abs(ref - w) <= np.repeat(q["scales"], g, 1) * 0.5 + 1e-6)


# ---------------------------------------------------------------------------
# Fabricated MLX-namespace checkpoints (the real 4-bit file layout)
# ---------------------------------------------------------------------------


def _tiny_flux_config():
    return MMDiTConfig(
        depth_multimodal=2, depth_unified=2, num_heads=2,
        hidden_size_override=64, patchify_via_reshape=True,
        pos_embed_type=PositionalEncoding.PreSDPARope,
        rope_axes_dim=(16, 8, 8), use_qk_norm=True,
        pooled_text_embed_dim=64, token_level_text_embed_dim=64,
        parallel_mlp_for_unified_blocks=True, dtype=jnp.float32,
    )


def _tiny_sd35_config():
    return MMDiTConfig(
        depth_multimodal=3, depth_unified=0, num_heads=2,
        hidden_size_override=64, use_qk_norm=True,
        max_latent_resolution=8,
        pooled_text_embed_dim=64, token_level_text_embed_dim=64,
        dtype=jnp.float32,
    )


class _SDBuilder:
    def __init__(self, seed=0):
        self.rs = np.random.RandomState(seed)
        self.sd = {}

    def qlin(self, key, out_d, in_d, bias=True, bias_val=None):
        w = (self.rs.randn(out_d, in_d) * 0.05).astype(np.float32)
        for k, v in mlx_quantize_host(w, group_size=GROUP).items():
            self.sd[f"{key}.{k}"] = v
        if bias:
            self.sd[f"{key}.bias"] = (
                bias_val if bias_val is not None
                else (self.rs.randn(out_d) * 0.01).astype(np.float32)
            )

    def arr(self, key, *shape, scale=0.05):
        self.sd[key] = (self.rs.randn(*shape) * scale).astype(np.float32)


def _block_keys(b, pre, H, hd, mlp=4, n_mod=6, post=True, shared_bias=False):
    b.qlin(f"{pre}.attn.q_proj", H, H)
    b.qlin(f"{pre}.attn.k_proj", H, H)  # k bias present in FLUX-style files
    b.qlin(f"{pre}.attn.v_proj", H, H)
    b.qlin(f"{pre}.adaLN_modulation.layers.1", n_mod * H, H)
    if post:
        b.qlin(f"{pre}.attn.o_proj", H, H)
        b.qlin(f"{pre}.mlp.fc1", mlp * H, H)
        shared = b.sd.get(f"{pre}.attn.o_proj.bias") if shared_bias else None
        b.qlin(f"{pre}.mlp.fc2", H, mlp * H, bias_val=shared)
    b.arr(f"{pre}.qk_norm.q_norm.weight", hd, scale=1.0)
    b.arr(f"{pre}.qk_norm.k_norm.weight", hd, scale=1.0)


def _fabricate_flux_4bit(config):
    b = _SDBuilder(0)
    H = config.hidden_size
    hd = config.head_dim
    for i in range(config.depth_multimodal):
        for tag in ("image", "text"):
            pre = f"multimodal_transformer_blocks.{i}.{tag}_transformer_block"
            _block_keys(b, pre, H, hd)
    for i in range(config.depth_unified):
        pre = f"unified_transformer_blocks.{i}.transformer_block"
        _block_keys(b, pre, H, hd, n_mod=3, shared_bias=True)
    b.arr("x_embedder.proj.weight", H, 1, 1, 64)  # MLX conv OHWI, float
    b.arr("x_embedder.proj.bias", H)
    b.qlin("context_embedder", H, config.token_level_text_embed_dim)
    b.qlin("t_embedder.mlp.layers.0", H, config.frequency_embed_dim)
    b.qlin("t_embedder.mlp.layers.2", H, H)
    b.qlin("y_embedder.mlp.layers.0", H, config.pooled_text_embed_dim)
    b.qlin("y_embedder.mlp.layers.2", H, H)
    b.qlin("final_layer.adaLN_modulation.layers.1", 2 * H, H)
    b.qlin("final_layer.linear", 64, H)
    return b.sd


def _fabricate_sd35_4bit(config):
    b = _SDBuilder(1)
    H = config.hidden_size
    hd = config.head_dim
    pfx = "model.diffusion_model."
    n = config.depth_multimodal
    for i in range(n):
        for tag in ("image", "text"):
            last_txt = tag == "text" and i == n - 1
            pre = f"{pfx}multimodal_transformer_blocks.{i}.{tag}_transformer_block"
            _block_keys(b, pre, H, hd, n_mod=2 if last_txt else 6, post=not last_txt)
    b.arr(pfx + "x_embedder.proj.weight", H, 2, 2, 16)  # OHWI
    b.arr(pfx + "x_embedder.proj.bias", H)
    b.arr(pfx + "x_pos_embedder.pos_embed.weight",
          config.max_latent_resolution ** 2, H)
    b.qlin(pfx + "context_embedder", H, config.token_level_text_embed_dim)
    b.qlin(pfx + "t_embedder.mlp.layers.0", H, config.frequency_embed_dim)
    b.qlin(pfx + "t_embedder.mlp.layers.2", H, H)
    b.qlin(pfx + "y_embedder.mlp.layers.0", H, config.pooled_text_embed_dim)
    b.qlin(pfx + "y_embedder.mlp.layers.2", H, H)
    b.qlin(pfx + "final_layer.adaLN_modulation.layers.1", 2 * H, H)
    b.qlin(pfx + "final_layer.linear", 64, H)
    return b.sd


def _dequant_tree(p):
    """Quantized exec dicts -> float {"kernel","bias"}; stacked leaves
    dequantised per layer."""
    if isinstance(p, dict):
        if is_quantized(p):
            q_key = "q4" if "q4" in p else "q8"
            if p[q_key].ndim == 3:
                kernels = jnp.stack([
                    _dequant({k: v[i] for k, v in p.items()
                              if k in ("q4", "q8", "scales", "zeros")}, jnp.float32)
                    for i in range(p[q_key].shape[0])
                ])
            else:
                kernels = _dequant(
                    {k: v for k, v in p.items()
                     if k in ("q4", "q8", "scales", "zeros")}, jnp.float32)
            return {"kernel": kernels, "bias": p.get("bias")}
        return {k: _dequant_tree(v) for k, v in p.items()}
    if isinstance(p, list):
        return [_dequant_tree(v) for v in p]
    return p


@pytest.mark.parametrize("family", ["flux", "sd35"])
def test_mlx_quantized_mapper_forward_matches_dequantized_float(family):
    if family == "flux":
        config = _tiny_flux_config()
        sd = _fabricate_flux_4bit(config)
    else:
        config = _tiny_sd35_config()
        sd = _fabricate_sd35_4bit(config)
    assert detect_mmdit_namespace(sd) == "mlx"
    params = mmdit_params_from_mlx_ckpt(sd, config, jnp.float32)

    # quantized leaves survived (no float round trip in the tree)
    assert is_quantized(params["context_embedder"])
    assert is_quantized(params["mm_blocks"]["img"]["q"])

    rs = np.random.RandomState(3)
    lat = jnp.asarray(rs.randn(1, 8, 8, 16), jnp.float32)
    cond = jnp.asarray(rs.randn(1, 8, config.token_level_text_embed_dim), jnp.float32)
    pooled = jnp.asarray(rs.randn(1, config.pooled_text_embed_dim), jnp.float32)
    t = jnp.asarray([500.0], jnp.float32)

    out_q = apply_mmdit(params, config, lat, cond, pooled, t, sdpa_impl="xla")
    out_f = apply_mmdit(
        _dequant_tree(params), config, lat, cond, pooled, t, sdpa_impl="xla"
    )
    np.testing.assert_allclose(
        np.asarray(out_q), np.asarray(out_f), atol=2e-5, rtol=1e-4
    )


def test_flux_unified_shared_bias_dropped():
    """The duplicated linear2 bias must be kept once (on o), dropped on fc2."""
    config = _tiny_flux_config()
    sd = _fabricate_flux_4bit(config)
    params = mmdit_params_from_mlx_ckpt(sd, config, jnp.float32)
    uni = params["uni_blocks"]
    assert uni["fc2"]["bias"] is None
    assert uni["o"]["bias"] is not None
    # and the k bias is dropped everywhere (softmax shift invariance)
    assert uni["k"]["bias"] is None
    assert params["mm_blocks"]["img"]["k"]["bias"] is None


def test_namespace_detection():
    assert detect_mmdit_namespace({"double_blocks.0.img_attn.qkv.weight": 0}) == "flux_raw"
    assert detect_mmdit_namespace(
        {"model.diffusion_model.joint_blocks.0.x_block.attn.qkv.weight": 0}
    ) == "sd3_raw"
    assert detect_mmdit_namespace(
        {"unified_transformer_blocks.0.transformer_block.attn.q_proj.weight": 0}
    ) == "mlx"
