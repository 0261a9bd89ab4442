"""Model forward-pass tests on tiny configs (shapes, dtypes, determinism).

The reference validates modules via Core ML conversion parity on random
inputs (reference tests/torch2coreml/test_mmdit.py:102-132); here the same
role is played by direct forward checks plus checkpoint-mapper round trips in
test_model_io.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusionkit_tpu.config import (
    CLIPTextModelConfig,
    MMDiTConfig,
    PositionalEncoding,
    T5Config,
    VAEDecoderConfig,
    VAEEncoderConfig,
)
from diffusionkit_tpu.models import (
    apply_clip,
    apply_mmdit,
    apply_t5_encoder,
    apply_vae_decoder,
    apply_vae_encoder,
    init_clip_params,
    init_mmdit_params,
    init_t5_params,
    init_vae_decoder_params,
    init_vae_encoder_params,
)

TINY_SD3 = MMDiTConfig(
    depth_multimodal=2,
    num_heads=2,
    hidden_size_override=64,
    max_latent_resolution=16,
    dtype=jnp.float32,
)

TINY_SD35 = MMDiTConfig(
    depth_multimodal=3,
    num_heads=2,
    hidden_size_override=64,
    max_latent_resolution=16,
    use_qk_norm=True,
    upcast_multimodal_blocks=(1,),
    dtype=jnp.float32,
)

TINY_FLUX = MMDiTConfig(
    depth_multimodal=2,
    depth_unified=2,
    num_heads=2,
    hidden_size_override=64,
    patchify_via_reshape=True,
    pos_embed_type=PositionalEncoding.PreSDPARope,
    rope_axes_dim=(8, 12, 12),
    pooled_text_embed_dim=96,
    use_qk_norm=True,
    dtype=jnp.float32,
)

import dataclasses

TINY_FLUX_DEV = dataclasses.replace(TINY_FLUX, guidance_embed=True)


def _mmdit_inputs(config, b=2, lat=8, txt=7):
    rs = np.random.RandomState(0)
    return dict(
        latent=jnp.asarray(rs.randn(b, lat, lat, 16), jnp.float32),
        token_level_text_embeddings=jnp.asarray(
            rs.randn(b, txt, config.token_level_text_embed_dim), jnp.float32
        ),
        pooled_text_embeddings=jnp.asarray(
            rs.randn(b, config.pooled_text_embed_dim), jnp.float32
        ),
        timestep=jnp.asarray([500.0] * b, jnp.float32),
    )


@pytest.mark.parametrize(
    "config", [TINY_SD3, TINY_SD35, TINY_FLUX, TINY_FLUX_DEV],
    ids=["sd3", "sd35-qk-upcast", "flux", "flux-dev"],
)
def test_mmdit_forward_shapes(config):
    params = init_mmdit_params(jax.random.PRNGKey(0), config)
    inputs = _mmdit_inputs(config)
    out = apply_mmdit(params, config, **inputs)
    assert out.shape == inputs["latent"].shape
    assert jnp.isfinite(out).all()
    # Deterministic under jit.
    out2 = jax.jit(lambda p, **kw: apply_mmdit(p, config, **kw))(params, **inputs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=5e-5)


def test_mmdit_guidance_changes_output():
    params = init_mmdit_params(jax.random.PRNGKey(1), TINY_FLUX_DEV)
    inputs = _mmdit_inputs(TINY_FLUX_DEV)
    # guidance_embedder weights are random, so different guidance -> different out
    o1 = apply_mmdit(params, TINY_FLUX_DEV, **inputs, guidance=jnp.asarray([1.0, 1.0]))
    o2 = apply_mmdit(params, TINY_FLUX_DEV, **inputs, guidance=jnp.asarray([4.0, 4.0]))
    assert not np.allclose(np.asarray(o1), np.asarray(o2))


def test_vae_decoder_shapes():
    config = VAEDecoderConfig(block_out_channels=(8, 16, 16, 16), layers_per_block=2, resnet_groups=4)
    params = init_vae_decoder_params(jax.random.PRNGKey(0), config)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 4, 4, 16), jnp.float32)
    out = apply_vae_decoder(params, x, config)
    assert out.shape == (1, 32, 32, 3)  # 8x upsample
    assert jnp.isfinite(out).all()


def test_vae_encoder_shapes():
    config = VAEEncoderConfig(block_out_channels=(8, 16, 16, 16), layers_per_block=2, resnet_groups=4)
    params = init_vae_encoder_params(jax.random.PRNGKey(0), config)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 32, 32, 3), jnp.float32)
    out = apply_vae_encoder(params, x, config)
    assert out.shape == (1, 4, 4, 32)  # 8x downsample, mean+logvar
    assert jnp.isfinite(out).all()


def test_clip_forward():
    config = CLIPTextModelConfig(
        num_layers=2, model_dims=64, num_heads=4, max_length=16,
        vocab_size=100, projection_dim=48, hidden_act="gelu",
    )
    params = init_clip_params(jax.random.PRNGKey(0), config)
    tokens = jnp.asarray([[99, 5, 7, 98, 0, 0, 0, 0]], jnp.int32)
    out = apply_clip(params, tokens, config)
    assert out.last_hidden_state.shape == (1, 8, 64)
    assert out.pooled_output.shape == (1, 48)
    assert len(out.hidden_states) == 2
    # EOS pooling: argmax picks position of id 99 (the max id) -> position 0.
    # With id 99 at pos 0, pooling reads position 0.
    assert jnp.isfinite(out.pooled_output).all()


def test_clip_causal_mask():
    """Changing a later token must not affect earlier hidden states."""
    config = CLIPTextModelConfig(
        num_layers=1, model_dims=32, num_heads=2, max_length=8,
        vocab_size=50, projection_dim=None,
    )
    params = init_clip_params(jax.random.PRNGKey(0), config)
    t1 = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
    t2 = jnp.asarray([[1, 2, 3, 40]], jnp.int32)
    h1 = apply_clip(params, t1, config).last_hidden_state
    h2 = apply_clip(params, t2, config).last_hidden_state
    np.testing.assert_allclose(np.asarray(h1[:, :3]), np.asarray(h2[:, :3]), atol=1e-5)
    assert not np.allclose(np.asarray(h1[:, 3]), np.asarray(h2[:, 3]))


def test_t5_forward():
    config = T5Config(
        vocab_size=100, d_model=32, d_kv=8, d_ff=64, num_layers=2, num_heads=4
    )
    params = init_t5_params(jax.random.PRNGKey(0), config)
    tokens = jnp.asarray([[3, 1, 4, 1, 5, 9, 2, 6]], jnp.int32)
    out = apply_t5_encoder(params, tokens, config)
    assert out.shape == (1, 8, 32)
    assert jnp.isfinite(out).all()


def test_t5_bucketing_matches_transformers():
    """Our host-side bucketing vs the HF reference implementation
    (reference t5.py:19-66 mirrors the same function)."""
    torch = pytest.importorskip("torch")
    from transformers.models.t5.modeling_t5 import T5Attention

    from diffusionkit_tpu.models.t5 import relative_position_bucket

    rel = np.arange(-300, 300).reshape(1, -1)
    ours = relative_position_bucket(rel, True, 32, 128)
    theirs = T5Attention._relative_position_bucket(
        torch.from_numpy(rel), bidirectional=True, num_buckets=32, max_distance=128
    ).numpy()
    np.testing.assert_array_equal(ours, theirs)
