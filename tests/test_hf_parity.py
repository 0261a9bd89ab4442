"""Numerical parity vs canonical HuggingFace implementations (offline).

The strongest oracle available without checkpoints: build small
transformers CLIPTextModelWithProjection / T5EncoderModel with random
weights, export their state dicts through OUR mappers, and compare forward
outputs. This validates both the model implementations and the checkpoint
mappers against the implementations the real checkpoints were trained with —
the role the reference's Core ML parity harness played
(reference tests/torch2coreml/*, PSNR >= 35 dB vs torch).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from diffusionkit_tpu.config import CLIPTextModelConfig, T5Config
from diffusionkit_tpu.model_io import clip_params_from_hf_ckpt, t5_params_from_ckpt
from diffusionkit_tpu.models import apply_clip, apply_t5_encoder


def _sd(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


@pytest.mark.parametrize("hidden_act,use_proj", [("quick_gelu", False), ("gelu", True)])
def test_clip_parity_vs_transformers(hidden_act, use_proj):
    from transformers import CLIPTextConfig, CLIPTextModel, CLIPTextModelWithProjection

    hf_cfg = CLIPTextConfig(
        vocab_size=99,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=3,
        num_attention_heads=4,
        max_position_embeddings=77,
        hidden_act=hidden_act,
        projection_dim=48,
        # eos at the reference's argmax-pooling convention: highest token id
        eos_token_id=98,
        bos_token_id=97,
    )
    torch.manual_seed(0)
    cls = CLIPTextModelWithProjection if use_proj else CLIPTextModel
    hf = cls(hf_cfg).eval()

    config = CLIPTextModelConfig(
        num_layers=3, model_dims=64, num_heads=4, max_length=77, vocab_size=99,
        projection_dim=48 if use_proj else None, hidden_act=hidden_act,
    )
    params = clip_params_from_hf_ckpt(_sd(hf), config, jnp.float32)

    tokens = np.array([[97, 5, 9, 23, 98, 0, 0, 0], [97, 42, 98, 0, 0, 0, 0, 0]], np.int32)
    with torch.no_grad():
        hf_out = hf(torch.from_numpy(tokens.astype(np.int64)), output_hidden_states=True)

    out = apply_clip(params, jnp.asarray(tokens), config)
    np.testing.assert_allclose(
        np.asarray(out.last_hidden_state),
        hf_out.last_hidden_state.numpy(),
        atol=2e-5, rtol=1e-4,
    )
    # Penultimate hidden state — what SD3 consumes (mlx/__init__.py:217).
    # HF hidden_states[-2] is the input to the last layer == our hidden_states[-2].
    np.testing.assert_allclose(
        np.asarray(out.hidden_states[-2]),
        hf_out.hidden_states[-2].numpy(),
        atol=2e-5, rtol=1e-4,
    )
    pooled_hf = (
        hf_out.text_embeds if use_proj else hf_out.pooler_output
    ).numpy()
    np.testing.assert_allclose(
        np.asarray(out.pooled_output), pooled_hf, atol=2e-5, rtol=1e-4
    )


def test_t5_parity_vs_transformers():
    from transformers import T5Config as HFT5Config
    from transformers import T5EncoderModel

    hf_cfg = HFT5Config(
        vocab_size=120,
        d_model=48,
        d_kv=12,
        d_ff=96,
        num_layers=3,
        num_heads=4,
        relative_attention_num_buckets=8,
        relative_attention_max_distance=20,
        feed_forward_proj="gated-gelu",
        dropout_rate=0.0,
    )
    torch.manual_seed(1)
    hf = T5EncoderModel(hf_cfg).eval()

    config = T5Config(
        vocab_size=120, d_model=48, d_kv=12, d_ff=96, num_layers=3, num_heads=4,
        relative_attention_num_buckets=8, relative_attention_max_distance=20,
    )
    params = t5_params_from_ckpt(_sd(hf), config, jnp.float32)

    tokens = np.array([[3, 7, 11, 2, 9, 1, 0, 0]], np.int32)
    with torch.no_grad():
        # No attention mask: the pipeline feeds fixed-length padded tokens
        # without masks (reference t5 usage, mlx/__init__.py:243-246).
        hf_out = hf(torch.from_numpy(tokens.astype(np.int64))).last_hidden_state

    out = apply_t5_encoder(params, jnp.asarray(tokens), config)
    np.testing.assert_allclose(
        np.asarray(out), hf_out.numpy(), atol=5e-5, rtol=1e-4
    )
