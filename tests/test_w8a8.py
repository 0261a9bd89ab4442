"""w8a8 (int8 weights x dynamic int8 activations) tests — ops/w8a8.py.

Beyond-reference capability: the reference's only quantization is 4-bit
weight-only (reference model_io.py:728-734). w8a8 targets the TPU's 2x-rate
int8 MXU path; these tests pin the numerics (exactness on the int8 grid,
bounded error off it), the tree conversion (stacked scan structure kept,
int4 -> w8a8 re-sampling), the linear() dispatch, the TP sharding rules, and
the pipeline flag end to end on a tiny model.
"""

import jax
import jax.numpy as jnp
import numpy as np

from diffusionkit_tpu.config import MMDiTConfig
from diffusionkit_tpu.models import apply_mmdit, init_mmdit_params
from diffusionkit_tpu.ops.common import linear
from diffusionkit_tpu.ops.quantized import quantize_kernel_host
from diffusionkit_tpu.ops.w8a8 import (
    quantize_activations,
    w8a8_from_kernel_host,
    w8a8_from_quantized_host,
    w8a8_linear,
    w8a8_tree,
)

TINY = MMDiTConfig(
    depth_multimodal=2, depth_unified=0, hidden_size_override=64, num_heads=4,
    max_latent_resolution=16,
    token_level_text_embed_dim=32, pooled_text_embed_dim=48,
    dtype=jnp.float32,
)


def test_w8a8_exact_on_int8_grid():
    """Weights and activations already on their int8 grids -> exact result."""
    rs = np.random.RandomState(0)
    wscale = 0.013
    w8 = rs.randint(-127, 128, size=(64, 32)).astype(np.int8)
    w8[0, :] = 127  # every column spans the grid -> requantisation is identity
    w = w8.astype(np.float32) * wscale
    x8 = rs.randint(-127, 128, size=(5, 64)).astype(np.int8)
    x8[:, 0] = 127  # every row's abs-max is 127 -> xscale is exactly 1
    x = jnp.asarray(x8.astype(np.float32))
    p = w8a8_from_kernel_host(w)
    p["bias"] = None
    np.testing.assert_array_equal(np.asarray(p["w8"]), w8)
    got = np.asarray(w8a8_linear(p, x))
    want = x8.astype(np.float32) @ w
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-3)


def test_w8a8_linear_close_to_float():
    rs = np.random.RandomState(1)
    w = rs.randn(256, 96).astype(np.float32) * 0.05
    x = jnp.asarray(rs.randn(4, 9, 256).astype(np.float32))
    p = w8a8_from_kernel_host(w)
    p["bias"] = jnp.asarray(rs.randn(96).astype(np.float32) * 0.1)
    got = np.asarray(w8a8_linear(p, x))
    want = np.asarray(x) @ w + np.asarray(p["bias"])
    # int8 grids: relative error ~ (1/127) per operand over sqrt(K) terms.
    denom = np.abs(want).max()
    assert np.abs(got - want).max() / denom < 0.02, np.abs(got - want).max() / denom


def test_linear_dispatches_w8a8():
    rs = np.random.RandomState(2)
    w = rs.randn(64, 16).astype(np.float32) * 0.05
    x = jnp.asarray(rs.randn(3, 64).astype(np.float32))
    p = w8a8_from_kernel_host(w)
    p["bias"] = None
    np.testing.assert_allclose(
        np.asarray(linear(p, x)), np.asarray(w8a8_linear(p, x)), atol=1e-6
    )


def test_quantize_activations_grid():
    rs = np.random.RandomState(3)
    x = jnp.asarray(rs.randn(7, 33).astype(np.float32))
    x8, xs = quantize_activations(x)
    assert x8.dtype == jnp.int8 and xs.shape == (7, 1)
    recon = np.asarray(x8, np.float32) * np.asarray(xs)
    assert np.abs(recon - np.asarray(x)).max() <= np.asarray(xs).max() * 0.51


def test_w8a8_from_int4_resampling():
    """int4 group-affine -> w8a8: error stays within ~1.6x the int4 error."""
    rs = np.random.RandomState(4)
    w = rs.randn(128, 32).astype(np.float32) * 0.05
    p4 = quantize_kernel_host(w, bits=4, group_size=64)
    # exact dequant of the int4 grid
    q = np.zeros((128, 32), np.float32)
    packed = np.asarray(p4["q4"])
    for j in range(8):
        q[j::8] = ((packed >> np.uint32(4 * j)) & np.uint32(0xF)).astype(np.float32)
    w4 = q * np.repeat(np.asarray(p4["scales"]), 64, axis=0) + np.repeat(
        np.asarray(p4["zeros"]), 64, axis=0
    )
    p4["bias"] = None
    p88 = w8a8_from_quantized_host(p4)
    w88 = np.asarray(p88["w8"], np.float32) * np.asarray(p88["wscale"])[None, :]
    err4 = np.abs(w4 - w).max()
    err88 = np.abs(w88 - w).max()
    assert err88 < err4 * 1.6, (err88, err4)


def test_w8a8_tree_mmdit_forward():
    key = jax.random.PRNGKey(0)
    params = init_mmdit_params(key, TINY)
    qparams = jax.tree.map(jnp.asarray, w8a8_tree(params, min_size=1))
    # stacked structure preserved: blocks still scannable (leading L axis)
    assert qparams["mm_blocks"]["img"]["q"]["w8"].ndim == 3
    assert qparams["mm_blocks"]["img"]["q"]["w8"].dtype == jnp.int8

    latent = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 16), jnp.float32)
    cond = jax.random.normal(jax.random.PRNGKey(2), (1, 10, 32), jnp.float32)
    pooled = jax.random.normal(jax.random.PRNGKey(3), (1, 48), jnp.float32)
    t = jnp.asarray([500.0], jnp.float32)
    ref = apply_mmdit(params, TINY, latent, cond, pooled, t, sdpa_impl="xla")
    got = apply_mmdit(qparams, TINY, latent, cond, pooled, t, sdpa_impl="xla")
    assert got.shape == ref.shape
    # int8 both-operand error through 2 blocks: loose relative bound.
    denom = np.abs(np.asarray(ref)).max() + 1e-6
    rel = np.abs(np.asarray(got) - np.asarray(ref)).max() / denom
    assert rel < 0.15, rel


def test_w8a8_sharding_rules():
    from jax.sharding import Mesh, PartitionSpec as P

    from diffusionkit_tpu.parallel.sharding import mmdit_shardings

    params = init_mmdit_params(jax.random.PRNGKey(0), TINY)
    qparams = jax.tree.map(jnp.asarray, w8a8_tree(params, min_size=1))
    devs = np.array(jax.devices()[:4]).reshape(1, 4)
    mesh = Mesh(devs, ("data", "model"))
    sh = mmdit_shardings(qparams, mesh)
    blk = sh["mm_blocks"]["img"]
    assert blk["q"]["w8"].spec == P(None, None, "model")
    assert blk["q"]["wscale"].spec == P(None, "model")
    assert blk["o"]["w8"].spec == P(None, "model", None)
    assert blk["o"]["wscale"].spec == P()


def test_pipeline_w8a8_flag():
    import sys

    sys.path.insert(0, "tests")
    from test_pipeline import build_sd3_pipeline

    pipe = build_sd3_pipeline()
    from diffusionkit_tpu.ops.w8a8 import w8a8_tree as conv

    ref_img, _ = pipe.generate_image(
        "a cat", num_steps=2, cfg_weight=5.0, latent_size=(8, 8), seed=7,
        verbose=False,
    )
    pipe.mmdit_params = jax.tree.map(jnp.asarray, conv(pipe.mmdit_params, min_size=1))
    img, _ = pipe.generate_image(
        "a cat", num_steps=2, cfg_weight=5.0, latent_size=(8, 8), seed=7,
        verbose=False,
    )
    a = np.asarray(ref_img, np.float32)
    b = np.asarray(img, np.float32)
    assert b.shape == a.shape
    # same seed, quantized model: images correlated but not identical
    assert np.abs(a - b).mean() < 48.0


def test_t5_w8a8_parity():
    """w8a8-quantized T5 encoder output stays close to the float encoder
    (the quantize_t5 pipeline option, diffusionkit_tpu/pipeline.py)."""
    from diffusionkit_tpu.config import T5Config
    from diffusionkit_tpu.models.t5 import apply_t5_encoder, init_t5_params
    from diffusionkit_tpu.ops.w8a8 import w8a8_tree

    config = T5Config(vocab_size=64, d_model=32, d_kv=8, d_ff=64, num_layers=2, num_heads=4)
    params = init_t5_params(jax.random.PRNGKey(0), config, dtype=jnp.float32)
    tokens = jnp.asarray(np.random.RandomState(0).randint(0, 64, (2, 12)), jnp.int32)
    ref = np.asarray(apply_t5_encoder(params, tokens, config), np.float32)
    qp = jax.tree.map(jnp.asarray, w8a8_tree(params, min_size=1))
    got = np.asarray(apply_t5_encoder(qp, tokens, config), np.float32)
    rel = np.abs(got - ref).max() / np.abs(ref).max()
    assert rel < 0.05, rel


def test_w8a8_linear_accepts_shared_actquant():
    """quantize_shared -> w8a8_linear is bit-identical to the internal
    quantization path, and quantize_shared is idempotent."""
    from diffusionkit_tpu.ops.w8a8 import quantize_shared, random_w8a8_linear, w8a8_linear

    key = jax.random.PRNGKey(0)
    p = random_w8a8_linear(key, 64, 32, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 5, 64), jnp.float32)
    base = np.asarray(w8a8_linear(p, x))
    aq = quantize_shared(x)
    assert quantize_shared(aq) is aq
    np.testing.assert_array_equal(np.asarray(w8a8_linear(p, aq)), base)
