"""End-to-end pipeline tests on tiny random models (offline, CPU).

Plays the role of the reference's golden-image E2E test
(reference tests/mlx/test_diffusion_pipeline.py:18-211) for environments
without checkpoints: fixed-seed determinism, phase-log structure, img2img
sigma truncation, CFG on/off paths, and FLUX conditioning layout.
"""

import dataclasses

import jax.numpy as jnp
import jax
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
    init_clip_params,
    init_mmdit_params,
    init_t5_params,
    init_vae_decoder_params,
    init_vae_encoder_params,
)
from diffusionkit_tpu.pipeline import DiffusionPipeline, FluxPipeline
from diffusionkit_tpu.tokenizer import BOS, EOS, CLIPTokenizer


def make_tiny_clip_tokenizer(max_length=16):
    chars = "abcdefghijklmnopqrstuvwxyz ,."
    vocab = {}
    for c in chars:
        vocab[c] = len(vocab)
        vocab[c + "</w>"] = len(vocab)
    vocab[BOS] = len(vocab)
    vocab[EOS] = len(vocab)
    tok = CLIPTokenizer({}, vocab, pad_with_eos=False)
    tok.max_length = max_length
    return tok


class TinyT5Tokenizer:
    max_length = 16
    pad_with_eos = False
    pad_token = 0

    def tokenize(self, text):
        return [(ord(c) % 50) + 1 for c in text[: self.max_length - 1]] + [1]


TINY_VAE_CHANNELS = (8, 8, 8, 8)


def build_sd3_pipeline(use_t5=False):
    pipe = DiffusionPipeline(
        model_version="argmaxinc/mlx-stable-diffusion-3-medium",
        load=False,
        low_memory_mode=False,
        use_t5=use_t5,
        shift=3.0,
    )
    key = jax.random.PRNGKey(0)
    clip_l_cfg = CLIPTextModelConfig(
        num_layers=2, model_dims=8, num_heads=2, max_length=16, vocab_size=64,
        projection_dim=None, hidden_act="quick_gelu",
    )
    clip_g_cfg = CLIPTextModelConfig(
        num_layers=2, model_dims=8, num_heads=2, max_length=16, vocab_size=64,
        projection_dim=8, hidden_act="gelu",
    )
    mmdit_cfg = MMDiTConfig(
        depth_multimodal=2, num_heads=2, hidden_size_override=32,
        max_latent_resolution=16, pooled_text_embed_dim=16,
        dtype=jnp.float32,
    )
    pipe.clip_l, pipe.clip_l_config = init_clip_params(key, clip_l_cfg), clip_l_cfg
    pipe.clip_g, pipe.clip_g_config = init_clip_params(key, clip_g_cfg), clip_g_cfg
    pipe.tokenizer_l = make_tiny_clip_tokenizer()
    pipe.tokenizer_g = make_tiny_clip_tokenizer()
    pipe.mmdit_params = init_mmdit_params(key, mmdit_cfg)
    pipe.mmdit_config = mmdit_cfg
    pipe.decoder_config = VAEDecoderConfig(
        block_out_channels=TINY_VAE_CHANNELS, layers_per_block=2, resnet_groups=4
    )
    pipe.decoder_params = init_vae_decoder_params(key, pipe.decoder_config)
    pipe.encoder_config = VAEEncoderConfig(
        block_out_channels=TINY_VAE_CHANNELS, layers_per_block=2, resnet_groups=4
    )
    pipe.encoder_params = init_vae_encoder_params(key, pipe.encoder_config)
    if use_t5:
        t5_cfg = T5Config(vocab_size=64, d_model=8, d_kv=4, d_ff=16, num_layers=2, num_heads=2)
        pipe.t5_params = init_t5_params(key, t5_cfg)
        pipe.t5_config = t5_cfg
        pipe.t5_tokenizer = TinyT5Tokenizer()
    return pipe


def test_generate_image_e2e_and_log_structure():
    pipe = build_sd3_pipeline()
    img, log = pipe.generate_image(
        "a photo of a cat", num_steps=3, cfg_weight=5.0,
        latent_size=(8, 8), seed=42, verbose=False,
    )
    assert img.size == (64, 64)  # 8x VAE upsample from latent 8x8
    for phase in ["text_encoding", "denoising", "decoding"]:
        assert log[phase]["time"] is not None
    assert len(log["denoising"]["iter_time"]) == 3
    assert log["total_time"] > 0


def test_fixed_seed_determinism():
    pipe = build_sd3_pipeline()
    img1, _ = pipe.generate_image(
        "a cat", num_steps=2, cfg_weight=5.0, latent_size=(8, 8), seed=7, verbose=False
    )
    img2, _ = pipe.generate_image(
        "a cat", num_steps=2, cfg_weight=5.0, latent_size=(8, 8), seed=7, verbose=False
    )
    np.testing.assert_array_equal(np.asarray(img1), np.asarray(img2))
    img3, _ = pipe.generate_image(
        "a cat", num_steps=2, cfg_weight=5.0, latent_size=(8, 8), seed=8, verbose=False
    )
    assert not np.array_equal(np.asarray(img1), np.asarray(img3))


def test_cfg_off_single_batch():
    pipe = build_sd3_pipeline()
    img, log = pipe.generate_image(
        "a cat", num_steps=2, cfg_weight=0.0, latent_size=(8, 8), seed=1, verbose=False
    )
    assert img.size == (64, 64)


def test_num_images_batching():
    pipe = build_sd3_pipeline()
    imgs, _ = pipe.generate_image(
        "a cat", num_steps=2, cfg_weight=5.0, latent_size=(8, 8), seed=1,
        verbose=False, num_images=2,
    )
    assert isinstance(imgs, list) and len(imgs) == 2
    # Each image gets fresh noise from the seeded stream -> distinct images.
    assert not np.array_equal(np.asarray(imgs[0]), np.asarray(imgs[1]))
    # Image 0 is bit-identical to the single-image run at the same seed.
    img_single, _ = pipe.generate_image(
        "a cat", num_steps=2, cfg_weight=5.0, latent_size=(8, 8), seed=1,
        verbose=False,
    )
    np.testing.assert_array_equal(np.asarray(imgs[0]), np.asarray(img_single))


def test_chunked_batch_decode_matches_full():
    """_decode_batched_u8 (VAE OOM guard for serving batches) must equal the
    all-at-once decode, including the padded tail chunk."""
    pipe = build_sd3_pipeline()
    # h*w=7744 -> per=2, n=3 -> chunks [0:2] and padded [2:3].
    lat = jnp.asarray(np.random.RandomState(0).randn(3, 88, 88, 16), jnp.float32)
    full = np.asarray(pipe._decode_latents_to_u8(lat))
    chunked = pipe._decode_batched_u8(lat)
    assert chunked.shape == full.shape and chunked.dtype == np.uint8
    np.testing.assert_array_equal(chunked, full)


def test_img2img_denoise_truncation(tmp_path):
    from PIL import Image

    pipe = build_sd3_pipeline()
    src = (np.random.RandomState(0).rand(64, 64, 3) * 255).astype(np.uint8)
    path = tmp_path / "src.png"
    Image.fromarray(src).save(path)
    img, log = pipe.generate_image(
        "a cat", num_steps=4, cfg_weight=5.0, latent_size=(8, 8), seed=3,
        verbose=False, image_path=str(path), denoise=0.5,
    )
    # denoise=0.5 of 4 steps -> sigmas truncated to 3 entries -> 2 iterations.
    assert len(log["denoising"]["iter_time"]) == 2


def test_encode_text_shapes_sd3():
    pipe = build_sd3_pipeline()
    cond, pooled = pipe.encode_text("hello world", cfg_weight=5.0, negative_text="bad")
    # 2 rows (pos, neg); seq = clip 16 + t5-zeros 16; feature dim 4096.
    assert cond.shape == (2, 32, 4096)
    assert pooled.shape == (2, 16)
    # zero-padding of clip features beyond 16 dims
    assert np.allclose(np.asarray(cond[:, :16, 16:]), 0)


def test_sigma_schedule_matches_sampler():
    pipe = build_sd3_pipeline()
    sig = pipe.get_sigmas(4)
    assert sig[-1] == 0.0 and len(sig) == 5


def build_flux_pipeline(guidance_embed=False):
    version = "argmaxinc/mlx-FLUX.1-dev" if guidance_embed else "argmaxinc/mlx-FLUX.1-schnell"
    pipe = FluxPipeline(model_version=version, load=False, low_memory_mode=False, shift=1.0)
    key = jax.random.PRNGKey(0)
    clip_l_cfg = CLIPTextModelConfig(
        num_layers=2, model_dims=8, num_heads=2, max_length=16, vocab_size=64,
        projection_dim=None, hidden_act="quick_gelu",
    )
    t5_cfg = T5Config(vocab_size=64, d_model=8, d_kv=4, d_ff=16, num_layers=2, num_heads=2)
    mmdit_cfg = MMDiTConfig(
        depth_multimodal=1, depth_unified=2, num_heads=2, hidden_size_override=32,
        patchify_via_reshape=True, pos_embed_type=PositionalEncoding.PreSDPARope,
        rope_axes_dim=(4, 6, 6), pooled_text_embed_dim=8,
        token_level_text_embed_dim=8, use_qk_norm=True,
        guidance_embed=guidance_embed, dtype=jnp.float32,
    )
    pipe.clip_l, pipe.clip_l_config = init_clip_params(key, clip_l_cfg), clip_l_cfg
    pipe.tokenizer_l = make_tiny_clip_tokenizer()
    pipe.t5_params = init_t5_params(key, t5_cfg)
    pipe.t5_config = t5_cfg
    pipe.t5_tokenizer = TinyT5Tokenizer()
    pipe.mmdit_params = init_mmdit_params(key, mmdit_cfg)
    pipe.mmdit_config = mmdit_cfg
    pipe.decoder_config = VAEDecoderConfig(
        block_out_channels=TINY_VAE_CHANNELS, layers_per_block=2, resnet_groups=4
    )
    pipe.decoder_params = init_vae_decoder_params(key, pipe.decoder_config)
    return pipe


def test_flux_e2e():
    pipe = build_flux_pipeline()
    img, log = pipe.generate_image(
        "a dog", num_steps=2, cfg_weight=0.0, latent_size=(8, 8), seed=11, verbose=False
    )
    assert img.size == (64, 64)
    assert len(log["denoising"]["iter_time"]) == 2


def test_flux_conditioning_is_t5_only_padded():
    pipe = build_flux_pipeline()
    cond, pooled = pipe.encode_text("a dog", cfg_weight=0.0)
    assert cond.shape == (1, 256, 8)  # T5_MAX_LENGTH[schnell]=256
    assert pooled.shape == (1, 8)


def test_flux_dev_guidance_path():
    # Compare latents (not uint8 images: on a tiny random model the guidance
    # perturbation is below quantisation).
    pipe = build_flux_pipeline(guidance_embed=True)
    cond, pooled = pipe.encode_text("a dog", cfg_weight=0.0)
    lat1, _ = pipe.denoise_latents(
        cond, pooled, num_steps=2, cfg_weight=0.0, latent_size=(8, 8), seed=5,
        guidance=1.0,
    )
    lat2, _ = pipe.denoise_latents(
        cond, pooled, num_steps=2, cfg_weight=0.0, latent_size=(8, 8), seed=5,
        guidance=4.0,
    )
    assert not np.allclose(np.asarray(lat1), np.asarray(lat2))


def test_clip_tokenizer_bpe():
    tok = make_tiny_clip_tokenizer()
    ids = tok.tokenize("ab a")
    assert ids[0] == tok.bos_token and ids[-1] == tok.eos_token
    # "ab" -> 'a' + 'b</w>'; "a" -> 'a</w>'
    v = tok.vocab
    assert ids[1:-1] == [v["a"], v["b</w>"], v["a</w>"]]


def test_scan_denoise_matches_loop():
    """use_scan=True (single lax.scan program) matches the step-loop path."""
    pipe = build_sd3_pipeline()
    cond, pooled = pipe.encode_text("a cat", cfg_weight=5.0, negative_text="")
    lat_loop, _ = pipe.denoise_latents(
        cond, pooled, num_steps=3, cfg_weight=5.0, latent_size=(8, 8), seed=9
    )
    pipe.use_scan = True
    lat_scan, iters = pipe.denoise_latents(
        cond, pooled, num_steps=3, cfg_weight=5.0, latent_size=(8, 8), seed=9
    )
    assert len(iters) == 3
    np.testing.assert_allclose(
        np.asarray(lat_loop), np.asarray(lat_scan), atol=1e-4, rtol=1e-4
    )


def test_clip_tokenizer_merge_order():
    """BPE must apply merges by ascending rank (reference tokenizer.py:47-90)."""
    vocab = {c: i for i, c in enumerate("abcd")}
    for extra in ["d</w>", "ab", "cd</w>", "abcd</w>", "ab cd</w>", "bc"]:
        vocab[extra] = len(vocab)
    vocab[BOS] = len(vocab)
    vocab[EOS] = len(vocab)
    # rank 0: c+d</w>; rank 1: a+b; bc never merges (not in ranks)
    ranks = {("c", "d</w>"): 0, ("a", "b"): 1}
    tok = CLIPTokenizer(ranks, vocab)
    assert tok.bpe("abcd") == ["ab", "cd</w>"]
    # Single char word
    assert tok.bpe("d") == ["d</w>"]


def test_memory_log_json_serializable(tmp_path):
    """Phase log round-trips through JSON (reference
    tests/mlx/test_diffusion_pipeline.py:104-145 persists the memory log)."""
    import json

    pipe = build_sd3_pipeline()
    _, log = pipe.generate_image(
        "a cat", num_steps=2, cfg_weight=5.0, latent_size=(8, 8), seed=2,
        verbose=False,
    )
    p = tmp_path / "log.json"
    with open(p, "w") as f:
        json.dump(log, f)
    with open(p) as f:
        back = json.load(f)
    assert set(back) >= {"text_encoding", "denoising", "decoding", "peak_memory", "total_time"}


def test_sd3_with_t5_conditioning():
    """SD3 + T5: token-level T5 embeddings replace the zero block
    (reference mlx/__init__.py:239-249)."""
    pipe = build_sd3_pipeline(use_t5=True)
    cond, pooled = pipe.encode_text("hello", cfg_weight=5.0, negative_text="x")
    assert cond.shape == (2, 32, 4096)
    # The T5 half (rows 16:) is non-zero now (but zero beyond d_model=8).
    t5_block = np.asarray(cond[:, 16:, :8])
    assert not np.allclose(t5_block, 0)
    img, _ = pipe.generate_image(
        "hello", num_steps=2, cfg_weight=5.0, latent_size=(8, 8), seed=4, verbose=False
    )
    assert img.size == (64, 64)


def test_compilation_cache_floor_is_zero(tmp_path, monkeypatch):
    """Behind the axon PJRT relay the local compile call returns in <1 s
    while the real compile runs remotely, so any positive
    jax_persistent_cache_min_compile_time_secs floor silently rejects
    writing exactly the expensive Mosaic-bearing programs (the MMDiT step
    recompiled 3-5 min per process before round 3). Pin the floor at 0."""
    import jax

    from diffusionkit_tpu import utils

    monkeypatch.setenv("DIFFUSIONKIT_TPU_COMPILE_CACHE", str(tmp_path))
    monkeypatch.setattr(utils, "_COMPILE_CACHE_SET", False)
    old_dir = jax.config.jax_compilation_cache_dir
    old_floor = jax.config.jax_persistent_cache_min_compile_time_secs
    try:
        utils.enable_compilation_cache()
        assert jax.config.jax_compilation_cache_dir == str(tmp_path)
        assert jax.config.jax_persistent_cache_min_compile_time_secs == 0.0
    finally:
        jax.config.update("jax_compilation_cache_dir", old_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", old_floor)
        utils._COMPILE_CACHE_SET = False


def test_batched_generation_denoise_autosplit(monkeypatch):
    """The denoise-batch auto-split (1024² serving OOM guard) must produce
    images identical to the unsplit batched path: chunks run the same jitted
    scan on row slices whose CFG layout is preserved per chunk."""
    pipe = build_sd3_pipeline()
    texts = ["a cat", "a dog", "a bird"]
    kw = dict(num_steps=2, cfg_weight=5.0, latent_size=(8, 8), seeds=[1, 2, 3])

    monkeypatch.setenv("DIFFUSIONKIT_TPU_DENOISE_BATCH", "8")
    whole = [np.asarray(im) for im in pipe.generate_images_batched(texts, **kw)]
    monkeypatch.setenv("DIFFUSIONKIT_TPU_DENOISE_BATCH", "2")
    split = [np.asarray(im) for im in pipe.generate_images_batched(texts, **kw)]
    assert len(whole) == len(split) == 3
    for w, s in zip(whole, split):
        np.testing.assert_array_equal(w, s)


def test_generate_image_num_images_denoise_autosplit(monkeypatch):
    """num_images auto-split in denoise_latents (the generate_image /
    single-prompt multi-image path) == unsplit, pixel-identical."""
    pipe = build_sd3_pipeline()
    kw = dict(num_steps=2, cfg_weight=5.0, latent_size=(8, 8), seed=11,
              num_images=3, verbose=False)
    monkeypatch.setenv("DIFFUSIONKIT_TPU_DENOISE_BATCH", "8")
    whole = [np.asarray(im) for im in pipe.generate_image("a fox", **kw)[0]]
    monkeypatch.setenv("DIFFUSIONKIT_TPU_DENOISE_BATCH", "2")
    split = [np.asarray(im) for im in pipe.generate_image("a fox", **kw)[0]]
    assert len(whole) == len(split) == 3
    for a, b in zip(whole, split):
        np.testing.assert_array_equal(a, b)
