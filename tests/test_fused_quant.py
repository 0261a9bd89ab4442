"""Fused elementwise->int8 Pallas kernels (ops/fused_quant.py) vs the XLA
reference math, in interpreter mode (CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusionkit_tpu.ops.fused_quant import (
    _gelu_erf,
    gelu_quantize,
    mod_ln_quantize,
    quantize,
)
from diffusionkit_tpu.ops.norms import modulated_layer_norm
from diffusionkit_tpu.ops.w8a8 import quantize_activations


def _ref_quant(x):
    x32 = np.asarray(x, np.float32)
    amax = np.maximum(np.abs(x32).max(axis=-1, keepdims=True), 1e-8)
    scale = amax / 127.0
    x8 = np.clip(np.round(x32 / scale), -127, 127).astype(np.int8)
    return x8, scale


def test_erf_polynomial_accuracy():
    x = jnp.linspace(-6.0, 6.0, 4097, dtype=jnp.float32)
    got = np.asarray(_gelu_erf(x))
    want = np.asarray(jax.nn.gelu(x, approximate=False))
    # A&S 7.1.26: |erf err| <= 1.5e-7; gelu error scales with |x|/2.
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_quantize_matches_reference():
    rs = np.random.RandomState(0)
    y = jnp.asarray(rs.randn(2, 37, 256).astype(np.float32))  # rows pad to 32
    aq = quantize(y, interpret=True)
    x8, scale = _ref_quant(y)
    np.testing.assert_array_equal(np.asarray(aq.x8), x8)
    np.testing.assert_allclose(np.asarray(aq.xscale), scale, rtol=1e-7)
    assert aq.orig is None and aq.dtype == jnp.float32
    # to_float dequantizes when no original is carried.
    deq = np.asarray(aq.to_float())
    np.testing.assert_allclose(deq, x8.astype(np.float32) * scale, rtol=1e-6)


def test_gelu_quantize_matches_xla_chain():
    rs = np.random.RandomState(1)
    y = jnp.asarray(rs.randn(3, 33, 384).astype(np.float32) * 2)
    aq = gelu_quantize(y, interpret=True)
    g = jax.nn.gelu(y, approximate=False)
    x8, scale = _ref_quant(g)
    np.testing.assert_allclose(np.asarray(aq.xscale), scale, rtol=1e-5)
    # erf polynomial (|err|<=1.5e-7) can flip round-to-nearest at a grid
    # boundary: allow 1 LSB on a tiny fraction of elements.
    diff = np.abs(np.asarray(aq.x8, np.int32) - x8.astype(np.int32))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 1e-2


def test_mod_ln_quantize_matches_xla_chain():
    rs = np.random.RandomState(2)
    b, s, h = 2, 45, 256
    x = jnp.asarray(rs.randn(b, s, h).astype(np.float32))
    shift = jnp.asarray(rs.randn(b, 1, h).astype(np.float32) * 0.1)
    scale = jnp.asarray(rs.randn(b, 1, h).astype(np.float32) * 0.1)
    aq = mod_ln_quantize(x, shift, scale, eps=1e-6, interpret=True)
    ref = modulated_layer_norm(x, shift, scale, 1e-6)
    x8, xscale = _ref_quant(ref)
    np.testing.assert_allclose(np.asarray(aq.xscale), xscale, rtol=1e-5)
    diff = np.abs(np.asarray(aq.x8, np.int32) - x8.astype(np.int32))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 1e-2


def test_mod_ln_quantize_bf16_input():
    rs = np.random.RandomState(3)
    x = jnp.asarray(rs.randn(1, 32, 128), jnp.bfloat16)
    shift = jnp.zeros((1, 1, 128), jnp.bfloat16)
    scale = jnp.zeros((1, 1, 128), jnp.bfloat16)
    aq = mod_ln_quantize(x, shift, scale, interpret=True)
    assert aq.x8.dtype == jnp.int8 and aq.dtype == jnp.bfloat16
    ref = modulated_layer_norm(x, shift, scale)
    x8, _ = _ref_quant(np.asarray(ref, np.float32))
    diff = np.abs(np.asarray(aq.x8, np.int32) - x8.astype(np.int32))
    assert diff.max() <= 1


def test_pick_rows_swept_values(monkeypatch):
    """The v5e-swept block rows must not drift: 64 rows at the FLUX MLP
    width (128 overflowed scoped vmem in the full step program), 256 at
    hidden width; power-of-two only; env override wins."""
    from diffusionkit_tpu.ops import chip
    from diffusionkit_tpu.ops.fused_quant import _pick_rows

    monkeypatch.delenv("DIFFUSIONKIT_TPU_FUSED_ROWS", raising=False)
    monkeypatch.delenv("DIFFUSIONKIT_TPU_VMEM_SCALE", raising=False)
    monkeypatch.setattr(chip, "current_spec", lambda: chip.spec_for_kind("v5 lite"))
    assert _pick_rows(12288, 4352) == 64
    assert _pick_rows(3072, 4352) == 256
    assert _pick_rows(128, 4352) == 512  # capped
    monkeypatch.setenv("DIFFUSIONKIT_TPU_FUSED_ROWS", "200")
    assert _pick_rows(12288, 4352) == 192  # rounded down to a 32-multiple


def test_mmdit_forward_fused_equals_unfused(monkeypatch):
    """Tiny w8a8 MMDiT: the fused-quant path (interpret) must reproduce the
    XLA quantize path within quantization-boundary tolerance."""
    from diffusionkit_tpu.config import MMDiTConfig, PositionalEncoding
    from diffusionkit_tpu.models.mmdit import apply_mmdit, init_mmdit_params

    config = MMDiTConfig(
        depth_multimodal=2,
        depth_unified=2,
        hidden_size_override=128,
        num_heads=2,
        pooled_text_embed_dim=64,
        pos_embed_type=PositionalEncoding.PreSDPARope,
        rope_axes_dim=(16, 24, 24),
        patchify_via_reshape=True,
        use_qk_norm=True,
        dtype=jnp.float32,
    )
    params = init_mmdit_params(jax.random.PRNGKey(0), config, quantize_bits="w8a8")
    latent = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 16), jnp.float32)
    cond = jax.random.normal(
        jax.random.PRNGKey(2), (1, 10, config.token_level_text_embed_dim), jnp.float32
    )
    pooled = jax.random.normal(jax.random.PRNGKey(3), (1, 64), jnp.float32)
    t = jnp.asarray([500.0], jnp.float32)

    monkeypatch.setenv("DIFFUSIONKIT_TPU_FUSED_QUANT", "0")
    base = np.asarray(apply_mmdit(params, config, latent, cond, pooled, t))
    monkeypatch.setenv("DIFFUSIONKIT_TPU_FUSED_QUANT", "interpret")
    fused = np.asarray(apply_mmdit(params, config, latent, cond, pooled, t))
    # 1-LSB int8 flips at grid boundaries propagate through 4 blocks; bound
    # the drift relative to the output magnitude.
    denom = np.abs(base).max()
    assert np.abs(fused - base).max() / denom < 0.02, (
        np.abs(fused - base).max(), denom
    )


def test_disable_scope_forces_xla_path(monkeypatch):
    """apply_mmdit enters fused_quant.disable_scope() under a mesh: GSPMD
    cannot partition the opaque pallas_call, so the sharded trace must fall
    back to the XLA quantization math."""
    from diffusionkit_tpu.ops import fused_quant

    monkeypatch.setenv("DIFFUSIONKIT_TPU_FUSED_QUANT", "interpret")
    assert fused_quant._enabled()
    with fused_quant.disable_scope():
        assert not fused_quant._enabled()
        with fused_quant.disable_scope():  # nests
            assert not fused_quant._enabled()
        assert not fused_quant._enabled()
    assert fused_quant._enabled()
