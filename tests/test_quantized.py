"""Weight-only quantisation tests (int4/int8 group-affine).

Covers the execution format behind the two ``*-4bit-quantized`` registry
models and the quantize_mmdit flag (reference model_io.py:728-734,
mlx/__init__.py:605-625).
"""

import jax
import jax.numpy as jnp
import numpy as np

from diffusionkit_tpu.config import MMDiTConfig
from diffusionkit_tpu.models import apply_mmdit, init_mmdit_params
from diffusionkit_tpu.ops.common import linear
from diffusionkit_tpu.ops.quantized import (
    pack_int4_host,
    quantize_kernel_host,
    quantize_tree,
    quantized_linear,
)


def test_pack_unpack_roundtrip():
    rs = np.random.RandomState(0)
    q = rs.randint(0, 16, size=(64, 16)).astype(np.uint8)
    packed = np.asarray(pack_int4_host(q))
    # manual unpack
    got = np.zeros_like(q)
    for j in range(8):
        got[j::8] = (packed >> (4 * j)) & 0xF
    np.testing.assert_array_equal(got, q)


def test_int4_quantized_linear_close():
    rs = np.random.RandomState(1)
    w = rs.randn(128, 32).astype(np.float32) * 0.05
    x = jnp.asarray(rs.randn(2, 7, 128).astype(np.float32))
    p = quantize_kernel_host(w, bits=4, group_size=64)
    p["bias"] = jnp.asarray(rs.randn(32).astype(np.float32))
    got = np.asarray(quantized_linear(p, x))
    want = np.asarray(x) @ w + np.asarray(p["bias"])
    # int4 grid error: per-group scale ~ range/15.
    err = np.abs(got - want).max()
    scale_bound = np.abs(w).max() * 2 / 15 * np.sqrt(128) * 3
    assert err < scale_bound, (err, scale_bound)
    # And much better with int8.
    p8 = quantize_kernel_host(w, bits=8, group_size=64)
    p8["bias"] = p["bias"]
    got8 = np.asarray(quantized_linear(p8, x))
    assert np.abs(got8 - want).max() < err / 4


def test_linear_dispatches_quantized():
    rs = np.random.RandomState(2)
    w = rs.randn(64, 16).astype(np.float32) * 0.05
    x = jnp.asarray(rs.randn(3, 64).astype(np.float32))
    p = quantize_kernel_host(w, bits=8, group_size=64)
    p["bias"] = None
    np.testing.assert_allclose(
        np.asarray(linear(p, x)), np.asarray(quantized_linear(p, x)), atol=1e-6
    )


def test_quantize_tree_mmdit_forward():
    """Quantised MMDiT runs and stays close to the fp32 model."""
    config = MMDiTConfig(
        depth_multimodal=2, num_heads=2, hidden_size_override=64,
        max_latent_resolution=16, dtype=jnp.float32,
    )
    params = init_mmdit_params(jax.random.PRNGKey(0), config)
    qparams = quantize_tree(params, bits=8, group_size=32, min_size=1, min_dim=1)
    # stacked block kernels became stacked quantized dicts
    assert "q8" in qparams["mm_blocks"]["img"]["q"]
    assert qparams["mm_blocks"]["img"]["q"]["q8"].ndim == 3

    rs = np.random.RandomState(0)
    args = (
        jnp.asarray(rs.randn(1, 8, 8, 16), jnp.float32),
        jnp.asarray(rs.randn(1, 7, 4096), jnp.float32),
        jnp.asarray(rs.randn(1, 2048), jnp.float32),
        jnp.asarray([500.0], jnp.float32),
    )
    want = np.asarray(apply_mmdit(params, config, *args))
    got = np.asarray(apply_mmdit(qparams, config, *args))
    assert got.shape == want.shape
    # int8 with tiny groups: outputs track closely.
    assert np.abs(got - want).mean() < 0.1 * (np.abs(want).mean() + 1e-3)


def test_quantize_tree_mixed_overrides():
    """-mixed modes: int4 bulk kernels, int8 AdaLN, float final/embedders —
    closer to fp32 than uniform int4 while running the same forward."""
    from diffusionkit_tpu.ops.quantized import MIXED_OVERRIDES

    config = MMDiTConfig(
        depth_multimodal=2, num_heads=2, hidden_size_override=64,
        max_latent_resolution=16, dtype=jnp.float32,
    )
    params = init_mmdit_params(jax.random.PRNGKey(0), config)
    mixed = quantize_tree(params, bits=4, group_size=32, min_size=1, min_dim=1,
                          overrides=MIXED_OVERRIDES)
    # bulk kernels int4, AdaLN int8, final layer + embedders untouched float
    assert "q4" in mixed["mm_blocks"]["img"]["q"]
    assert "q8" in mixed["mm_blocks"]["img"]["ada"]
    assert mixed["mm_blocks"]["img"]["ada"]["q8"].ndim == 3  # stacked
    assert "kernel" in mixed["final_layer"]["linear"]
    assert "kernel" in mixed["final_layer"]["ada"]  # nested ada cut by parent
    assert "kernel" in mixed["x_embedder"]
    assert "kernel" in mixed["context_embedder"]

    uniform = quantize_tree(params, bits=4, group_size=32, min_size=1, min_dim=1)
    rs = np.random.RandomState(0)
    args = (
        jnp.asarray(rs.randn(1, 8, 8, 16), jnp.float32),
        jnp.asarray(rs.randn(1, 7, 4096), jnp.float32),
        jnp.asarray(rs.randn(1, 2048), jnp.float32),
        jnp.asarray([500.0], jnp.float32),
    )
    want = np.asarray(apply_mmdit(params, config, *args))
    got_mixed = np.asarray(apply_mmdit(mixed, config, *args))
    got_uniform = np.asarray(apply_mmdit(uniform, config, *args))
    assert got_mixed.shape == want.shape
    err_mixed = np.abs(got_mixed - want).mean()
    err_uniform = np.abs(got_uniform - want).mean()
    assert err_mixed < err_uniform  # mixed strictly improves on uniform int4


def test_pipeline_mixed_mode_tree():
    """quantize_mmdit='w4a8-mixed' through the pipeline loader: wscale lands
    on the int4 leaves only; AdaLN stays int8 (no wscale), float leaves
    untouched."""
    from diffusionkit_tpu.ops.quantized import MIXED_OVERRIDES
    from diffusionkit_tpu.ops.w4a8_matmul import add_wscale_tree

    config = MMDiTConfig(
        depth_multimodal=2, num_heads=2, hidden_size_override=64,
        max_latent_resolution=16, dtype=jnp.float32,
    )
    params = init_mmdit_params(jax.random.PRNGKey(1), config)
    mixed = add_wscale_tree(
        quantize_tree(params, bits=4, group_size=32, min_size=1, min_dim=1,
                      overrides=MIXED_OVERRIDES)
    )
    assert "wscale" in mixed["mm_blocks"]["img"]["q"]
    assert "wscale" not in mixed["mm_blocks"]["img"]["ada"]
    rs = np.random.RandomState(1)
    args = (
        jnp.asarray(rs.randn(1, 8, 8, 16), jnp.float32),
        jnp.asarray(rs.randn(1, 7, 4096), jnp.float32),
        jnp.asarray(rs.randn(1, 2048), jnp.float32),
        jnp.asarray([500.0], jnp.float32),
    )
    out = np.asarray(apply_mmdit(mixed, config, *args))
    assert np.isfinite(out).all()


def test_int4_pallas_kernel_interpret_matches_xla():
    """Fused dequant-matmul kernel (interpret mode) vs the in-jit dequant."""
    from diffusionkit_tpu.ops.int4_matmul import int4_linear

    rs = np.random.RandomState(3)
    w = rs.randn(512, 512).astype(np.float32) * 0.05
    x = jnp.asarray(rs.randn(2, 70, 512).astype(np.float32))
    p = quantize_kernel_host(w, bits=4, group_size=64)
    p["bias"] = jnp.asarray(rs.randn(512).astype(np.float32))
    want = np.asarray(quantized_linear(p, x))  # CPU: xla dequant path
    got = np.asarray(int4_linear(p, x, bm=128, bk=256, bn=256, interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-3)


def test_quantized_upcast_block_forward():
    """SD3.5-style fp32-upcast blocks must skip packed quantized leaves."""
    import dataclasses

    config = MMDiTConfig(
        depth_multimodal=3, num_heads=2, hidden_size_override=64,
        max_latent_resolution=16, upcast_multimodal_blocks=(1,),
        use_qk_norm=True, dtype=jnp.float32,
    )
    params = init_mmdit_params(jax.random.PRNGKey(0), config, quantize_bits=4)
    out = apply_mmdit(
        params, config,
        jnp.zeros((1, 8, 8, 16)), jnp.zeros((1, 7, 4096)),
        jnp.zeros((1, 2048)), jnp.asarray([500.0]),
    )
    assert jnp.isfinite(out).all()


def test_int8_pallas_kernel_interpret_matches_xla():
    from diffusionkit_tpu.ops.int4_matmul import int8_linear
    from diffusionkit_tpu.ops.quantized import _dequant

    rs = np.random.RandomState(5)
    w = rs.randn(512, 512).astype(np.float32) * 0.05
    x = jnp.asarray(rs.randn(3, 33, 512).astype(np.float32))
    p = quantize_kernel_host(w, bits=8, group_size=64)
    p["bias"] = jnp.asarray(rs.randn(512).astype(np.float32))
    want = np.asarray(x) @ np.asarray(_dequant(p, jnp.float32)) + np.asarray(p["bias"])
    got = np.asarray(int8_linear(p, x, bm=128, interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-3)


def test_native_int4_quantizer_matches_numpy():
    """native/dkio.cpp dk_quantize_int4 must be bit-identical to the numpy
    quantization path (same min/max affine, same rounding, same packing)."""
    import numpy as np

    from diffusionkit_tpu import native
    from diffusionkit_tpu.ops.quantized import quantize_kernel_host

    if native.quantize_int4(np.zeros((8, 8), np.float32), 8) is None:
        import pytest

        pytest.skip("native toolchain unavailable")
    rs = np.random.RandomState(7)
    w = rs.randn(256, 192).astype(np.float32)
    got = native.quantize_int4(w, 32)

    orig = native.quantize_int4
    native.quantize_int4 = lambda *a, **k: None  # force the numpy path
    try:
        want = quantize_kernel_host(w, 4, 32, refine=False)
    finally:
        native.quantize_int4 = orig
    np.testing.assert_array_equal(got["q4"], np.asarray(want["q4"]))
    np.testing.assert_array_equal(got["scales"], np.asarray(want["scales"]))
    np.testing.assert_array_equal(got["zeros"], np.asarray(want["zeros"]))


def _grid_mse(w, p, group_size):
    from diffusionkit_tpu.ops.quantized import _dequant

    deq = np.asarray(_dequant(p, jnp.float32))
    return float(((deq - w) ** 2).mean())


def test_refined_int4_beats_minmax():
    """The default (ALS-refined, f16-stored) int4 grid must strictly beat the
    min/max grid in weight MSE, stay on the affine grid contract (scales/zeros
    shape + q4 packing unchanged), and store its grid in float16."""
    rs = np.random.RandomState(11)
    w = rs.randn(256, 192).astype(np.float32) * 0.03
    base = quantize_kernel_host(w, 4, 32, refine=False)
    ref = quantize_kernel_host(w, 4, 32)  # default: refined
    assert ref["scales"].dtype == np.float16 and ref["zeros"].dtype == np.float16
    assert ref["q4"].shape == base["q4"].shape
    assert ref["scales"].shape == base["scales"].shape
    e_base = _grid_mse(w, base, 32)
    e_ref = _grid_mse(w, ref, 32)
    assert e_ref < 0.95 * e_base, (e_ref, e_base)


def test_refined_int4_native_matches_numpy_quality():
    """Native ALS (dk_quantize_int4_als) and the numpy reference agree at the
    float level: same-or-near MSE (accumulation order may flip occasional
    rounding ties, so bit-parity is NOT the contract — quality is)."""
    import pytest

    from diffusionkit_tpu import native

    rs = np.random.RandomState(12)
    w = rs.randn(256, 192).astype(np.float32) * 0.03
    got = native.quantize_int4_als(w, 32)
    if got is None:
        pytest.skip("native toolchain unavailable")
    orig = native.quantize_int4_als
    native.quantize_int4_als = lambda *a, **k: None  # force the numpy path
    try:
        want = quantize_kernel_host(w, 4, 32)
    finally:
        native.quantize_int4_als = orig
    e_native = _grid_mse(w, got, 32)
    e_numpy = _grid_mse(w, want, 32)
    assert abs(e_native - e_numpy) <= 0.02 * max(e_native, e_numpy), (
        e_native, e_numpy,
    )
    # Grids themselves are near-identical (f16-rounded on both sides).
    np.testing.assert_allclose(
        np.asarray(got["scales"], np.float32),
        np.asarray(want["scales"], np.float32), rtol=0.02, atol=1e-6,
    )


def test_int4_linear_pad_n_bit_identical():
    """int4_linear at a pad-triggering shape (k tiled at bk<k, n = 128*15):
    identical values with DIFFUSIONKIT_TPU_PAD_N on vs off (padded columns
    dequant to exactly 0 and are sliced off)."""
    import os

    import jax
    import numpy as np
    from jax import numpy as jnp

    from diffusionkit_tpu.ops.int4_matmul import int4_linear
    from diffusionkit_tpu.ops.quantized import quantize_kernel_host

    rs = np.random.RandomState(13)
    K, N, M = 2048, 1920, 16
    p = quantize_kernel_host(rs.randn(K, N).astype(np.float32) * 0.05,
                             bits=4, group_size=64)
    p = {k: jnp.asarray(v) for k, v in p.items()}
    p["bias"] = jnp.asarray(rs.randn(N).astype(np.float32) * 0.1)
    x = jnp.asarray(rs.randn(M, K).astype(np.float32))

    got_pad = np.asarray(int4_linear(p, x, interpret=True))
    os.environ["DIFFUSIONKIT_TPU_PAD_N"] = "0"
    try:
        got_nopad = np.asarray(int4_linear(p, x, interpret=True))
    finally:
        del os.environ["DIFFUSIONKIT_TPU_PAD_N"]
    assert got_pad.shape == (M, N)
    np.testing.assert_array_equal(got_pad, got_nopad)
