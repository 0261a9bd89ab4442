"""w4a8 Pallas kernel tests (ops/w4a8_matmul.py): int4-packed weights
requantized in-kernel onto a per-channel int8 grid, int8 x int8 -> int32 dot.

Interpret mode on CPU; the on-chip lowering (int8 MXU path) is exercised by
the TPU bench/E2E runs.
"""

import jax
import jax.numpy as jnp
import numpy as np

from diffusionkit_tpu.ops.quantized import quantize_kernel_host
from diffusionkit_tpu.ops.w4a8_matmul import (
    add_wscale_tree,
    w4a8_linear,
    w4a8_matmul,
    wscale_from_q4_host,
)
from diffusionkit_tpu.ops.w8a8 import quantize_activations


def _dequant_np(p):
    packed = np.asarray(p["q4"])
    in8, out = packed.shape
    q = np.empty((in8, 8, out), np.float32)
    for j in range(8):
        q[:, j, :] = ((packed >> np.uint32(4 * j)) & np.uint32(0xF)).astype(np.float32)
    q = q.reshape(in8 * 8, out)
    g = q.shape[0] // p["scales"].shape[0]
    return q * np.repeat(np.asarray(p["scales"]), g, 0) + np.repeat(
        np.asarray(p["zeros"]), g, 0
    )


def test_w4a8_matmul_matches_reference_int_math():
    """Kernel result == numpy emulation of the exact same two-level math
    (requant FMA onto the int8 grid + int dot + in-kernel dequant epilogue)."""
    rs = np.random.RandomState(0)
    K, N, M = 256, 128, 16
    w = rs.randn(K, N).astype(np.float32) * 0.05
    p = quantize_kernel_host(w, bits=4, group_size=64)
    wscale = wscale_from_q4_host(p)
    x = rs.randn(M, K).astype(np.float32)
    x8, xs = quantize_activations(jnp.asarray(x))
    bias = rs.randn(N).astype(np.float32) * 0.1

    rws = 1.0 / wscale
    got = np.asarray(
        w4a8_matmul(
            x8, jnp.asarray(p["q4"]), jnp.asarray(p["scales"] * rws),
            jnp.asarray(p["zeros"] * rws), jnp.asarray(wscale),
            xs, jnp.asarray(bias),
            bm=8, bk=128, bn=128, out_dtype=jnp.float32, interpret=True,
        )
    )
    # Same two-level math in numpy: q on the int8 grid via one FMA.
    packed = np.asarray(p["q4"])
    in8, out = packed.shape
    q = np.empty((in8, 8, out), np.float32)
    for j in range(8):
        q[:, j, :] = ((packed >> np.uint32(4 * j)) & np.uint32(0xF)).astype(np.float32)
    q = q.reshape(in8 * 8, out)
    g = q.shape[0] // p["scales"].shape[0]
    s8 = np.repeat(p["scales"] * rws, g, 0).astype(np.float32)
    z8 = np.repeat(p["zeros"] * rws, g, 0).astype(np.float32)
    # The requant ``q * s8 + z8`` may be contracted to a hardware fma by the
    # backend (observed on XLA CPU; the f16-stored grid makes dyadic scales,
    # so .5 ties are systematic, not rare) or kept as mul+add (observed on
    # TPU interpret) — emulate both roundings and accept whichever the
    # backend chose.
    def emulate(prod):
        w8 = np.clip(np.round(prod), -127, 127).astype(np.int32)
        acc = np.asarray(x8, np.int32) @ w8
        return acc.astype(np.float32) * np.asarray(xs) * wscale[None, :] + bias

    want_muladd = emulate(q * s8 + z8)
    want_fma = emulate(
        (q.astype(np.float64) * s8.astype(np.float64)
         + z8.astype(np.float64)).astype(np.float32)
    )
    err = min(
        np.abs(got - want_muladd).max(), np.abs(got - want_fma).max()
    )
    assert err < 1e-5, float(err)


def test_w4a8_linear_close_to_int4_dequant():
    rs = np.random.RandomState(1)
    K, N = 256, 128
    w = rs.randn(K, N).astype(np.float32) * 0.05
    p = quantize_kernel_host(w, bits=4, group_size=64)
    p["bias"] = jnp.asarray(rs.randn(N).astype(np.float32) * 0.1)
    p["wscale"] = jnp.asarray(wscale_from_q4_host(p))
    x = jnp.asarray(rs.randn(3, 5, K).astype(np.float32))

    got = np.asarray(w4a8_linear(p, x, bm=8, interpret=True))
    w4 = _dequant_np(p)
    want = np.asarray(x).reshape(-1, K) @ w4 + np.asarray(p["bias"])
    want = want.reshape(3, 5, N)
    denom = np.abs(want).max()
    rel = np.abs(got - want).max() / denom
    # int8 requant of int4 values + dynamic int8 activations: small on top
    # of the int4 error itself.
    assert rel < 0.03, rel


def test_w4a8_linear_no_bias():
    rs = np.random.RandomState(3)
    K, N = 128, 128
    w = rs.randn(K, N).astype(np.float32) * 0.05
    p = quantize_kernel_host(w, bits=4, group_size=64)
    p["wscale"] = jnp.asarray(wscale_from_q4_host(p))
    x = jnp.asarray(rs.randn(4, K).astype(np.float32))
    got = np.asarray(w4a8_linear(p, x, bm=8, interpret=True))
    want = np.asarray(x) @ _dequant_np(p)
    rel = np.abs(got - want).max() / np.abs(want).max()
    assert rel < 0.03, rel


def test_pick_m_block():
    from diffusionkit_tpu.ops.w4a8_matmul import pick_m_block

    # Large M amortises the per-M-block dequant: picks the biggest block
    # under the VMEM cap.
    assert pick_m_block(4352, 1024, 512) >= 1024
    # Small M: no reason to pad 16 rows up to 1088.
    assert pick_m_block(16, 1024, 512) == 128
    # VMEM cap binds for huge tiles.
    assert pick_m_block(4352, 4096, 1024) <= 448


def test_add_wscale_tree_stacked():
    rs = np.random.RandomState(2)
    kernels = np.stack([rs.randn(128, 64).astype(np.float32) * 0.05 for _ in range(3)])
    per = [quantize_kernel_host(kernels[i], bits=4, group_size=64) for i in range(3)]
    stacked = {k: np.stack([p[k] for p in per]) for k in per[0]}
    stacked["bias"] = None
    tree = {"blocks": {"q": stacked}, "other": {"kernel": kernels[0], "bias": None}}
    out = add_wscale_tree(tree)
    ws = out["blocks"]["q"]["wscale"]
    assert ws.shape == (3, 64)
    for i in range(3):
        np.testing.assert_allclose(ws[i], wscale_from_q4_host(per[i]), rtol=1e-6)
    assert "wscale" not in out["other"]


def test_pipeline_w4a8_mode_tiny():
    """quantize_mmdit='w4a8' on a tiny pipeline: wscale leaves added, image
    generated (CPU falls back to the dequant path for the actual matmul)."""
    import sys

    sys.path.insert(0, "tests")
    from test_pipeline import build_sd3_pipeline

    from diffusionkit_tpu.ops.quantized import quantize_tree

    pipe = build_sd3_pipeline()
    pipe.mmdit_params = jax.tree.map(
        jnp.asarray,
        add_wscale_tree(quantize_tree(pipe.mmdit_params, bits=4, group_size=16, min_size=1, min_dim=1)),
    )
    paths = {
        ".".join(str(getattr(p, "key", p)) for p in path)
        for path, _ in jax.tree_util.tree_flatten_with_path(pipe.mmdit_params)[0]
    }
    assert any(p.endswith("wscale") for p in paths), sorted(paths)[:10]
    img, _ = pipe.generate_image(
        "a cat", num_steps=2, cfg_weight=5.0, latent_size=(8, 8), seed=7,
        verbose=False,
    )
    assert np.asarray(img).shape == (64, 64, 3)


def test_w4a8_linear_fused_gelu():
    """act='gelu' in-kernel epilogue == gelu applied to the unfused output."""
    rs = np.random.RandomState(4)
    K, N = 128, 128
    w = rs.randn(K, N).astype(np.float32) * 0.05
    p = quantize_kernel_host(w, bits=4, group_size=64)
    p["bias"] = jnp.asarray(rs.randn(N).astype(np.float32) * 0.1)
    p["wscale"] = jnp.asarray(wscale_from_q4_host(p))
    x = jnp.asarray(rs.randn(4, K).astype(np.float32))
    base = np.asarray(w4a8_linear(p, x, bm=8, interpret=True), np.float32)
    want = np.asarray(jax.nn.gelu(jnp.asarray(base), approximate=False))
    got = np.asarray(w4a8_linear(p, x, bm=8, act="gelu", interpret=True), np.float32)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_w4a8_linear_accepts_shared_actquant():
    """A pre-quantized ActQuant input (shared across sibling projections)
    produces bit-identical output to the internal quantization path."""
    from diffusionkit_tpu.ops.w8a8 import quantize_shared

    rs = np.random.RandomState(5)
    K, N = 256, 128
    w = rs.randn(K, N).astype(np.float32) * 0.05
    p = quantize_kernel_host(w, bits=4, group_size=64)
    p["bias"] = jnp.asarray(rs.randn(N).astype(np.float32) * 0.1)
    p["wscale"] = jnp.asarray(wscale_from_q4_host(p))
    x = jnp.asarray(rs.randn(2, 7, K).astype(np.float32))
    base = np.asarray(w4a8_linear(p, x, bm=8, interpret=True))
    got = np.asarray(w4a8_linear(p, quantize_shared(x), bm=8, interpret=True))
    np.testing.assert_array_equal(got, base)


def test_materialized_w8_path_bit_identical():
    """dequant_w8_pallas == the XLA reference unpack, and the materialized
    int8 apply (w8_matmul) is bit-identical to the fused w4a8_matmul — the
    two dataflows share the exact requant grid, so the TPU dispatch can pick
    either on speed alone."""
    from diffusionkit_tpu.ops.w4a8_matmul import (
        _scaled_affine,
        dequant_w8,
        dequant_w8_pallas,
        w8_matmul,
    )

    rs = np.random.RandomState(7)
    K, N, M = 256, 256, 48
    w = rs.randn(K, N).astype(np.float32) * 0.05
    p = quantize_kernel_host(w, bits=4, group_size=64)
    p["bias"] = None
    p["wscale"] = jnp.asarray(wscale_from_q4_host(p))
    s8, z8, ws, bias = _scaled_affine(p)
    w8x = dequant_w8(jnp.asarray(p["q4"]), s8, z8)
    w8p = dequant_w8_pallas(
        jnp.asarray(p["q4"]), s8, z8, bk=128, bn=128, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(w8x), np.asarray(w8p))
    x8, xs = quantize_activations(jnp.asarray(rs.randn(M, K), jnp.float32))
    y_fused = w4a8_matmul(
        x8, jnp.asarray(p["q4"]), s8, z8, ws, xs, bias,
        bm=16, bk=128, bn=128, out_dtype=jnp.float32, interpret=True,
    )
    y_mat = w8_matmul(
        x8, w8p, ws, xs, bias,
        bm=16, bk=128, bn=128, out_dtype=jnp.float32, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(y_fused), np.asarray(y_mat))


def test_quantizer_tracked_wscale_matches_host_recompute():
    """with_wscale=True: the per-channel int8-grid scale tracked during
    packing (native) or computed from the unpacked codes (numpy fallback)
    must match wscale_from_q4_host's full nibble-unpack recompute. 1-ulp
    slack: the native FMA may contract the dequant multiply-add."""
    rs = np.random.RandomState(21)
    w = rs.randn(128, 64).astype(np.float32) * 0.04
    p = quantize_kernel_host(w, bits=4, group_size=32, with_wscale=True)
    assert "wscale" in p and p["wscale"].shape == (64,)
    want = np.asarray(wscale_from_q4_host(p))
    np.testing.assert_allclose(np.asarray(p["wscale"]), want, rtol=2e-6)


def test_quantize_tree_with_wscale_stacked():
    """Stacked (L, in, out) kernels get stacked (L, out) wscale leaves and
    add_wscale_tree leaves them untouched."""
    from diffusionkit_tpu.ops.quantized import quantize_tree
    from diffusionkit_tpu.ops.w4a8_matmul import add_wscale_tree

    rs = np.random.RandomState(22)
    tree = {"q": {"kernel": rs.randn(3, 64, 32).astype(np.float32) * 0.04,
                  "bias": None}}
    q = quantize_tree(tree, bits=4, group_size=32, min_size=1, min_dim=1, with_wscale=True)
    assert q["q"]["wscale"].shape == (3, 32)
    before = np.asarray(q["q"]["wscale"]).copy()
    q2 = add_wscale_tree(q)
    np.testing.assert_array_equal(np.asarray(q2["q"]["wscale"]), before)


def test_w4a8_ffn_gelu_fused_matches_unfused():
    """The fused fc1 -> GELU(int8 epilogue) -> fc2(grouped scales) chain
    (w4a8_ffn_gelu) matches the unfused w4a8 chain (fc1 kernel, float GELU,
    per-row requant, fc2 kernel) within the int8 activation-grid noise the
    coarser per-row scale itself carries."""
    from diffusionkit_tpu.ops.w4a8_matmul import w4a8_ffn_gelu

    rs = np.random.RandomState(1)
    K, H, M = 256, 512, 48
    fc1 = quantize_kernel_host(rs.randn(K, H).astype(np.float32) * 0.05,
                               bits=4, group_size=64)
    fc2 = quantize_kernel_host(rs.randn(H, K).astype(np.float32) * 0.05,
                               bits=4, group_size=64)
    fc1 = {**{k: jnp.asarray(v) for k, v in fc1.items()},
           "wscale": jnp.asarray(wscale_from_q4_host(fc1)),
           "bias": jnp.asarray(rs.randn(H).astype(np.float32) * 0.1)}
    fc2 = {**{k: jnp.asarray(v) for k, v in fc2.items()},
           "wscale": jnp.asarray(wscale_from_q4_host(fc2)),
           "bias": jnp.asarray(rs.randn(K).astype(np.float32) * 0.1)}
    x = jnp.asarray(rs.randn(M, K).astype(np.float32) * 0.5)

    got = np.asarray(w4a8_ffn_gelu(fc1, fc2, x, interpret=True))
    assert got.shape == (M, K)

    # Unfused reference: same kernels, float hidden + per-row requant.
    from diffusionkit_tpu.ops.w8a8 import ActQuant

    h = w4a8_linear(fc1, x, interpret=True)
    g = jax.nn.gelu(h, approximate=False)
    x8, xs = quantize_activations(g)
    y_ref = np.asarray(w4a8_linear(fc2, ActQuant(x8, xs, g), interpret=True))
    # Both paths share the exact weight grids; they differ only in the
    # hidden activation's int8 scale granularity (per (row, n-tile) vs
    # per row) and GELU rounding. Hidden magnitudes ~O(1).
    err = np.abs(got - y_ref)
    scale = np.abs(y_ref).max()
    assert err.max() <= 0.05 * scale, (err.max(), scale)

    # And against the float math end to end (both are quantized: loose gate).
    w1 = _dequant_np(jax.tree.map(np.asarray, {k: fc1[k] for k in ("q4", "scales", "zeros")}))
    w2 = _dequant_np(jax.tree.map(np.asarray, {k: fc2[k] for k in ("q4", "scales", "zeros")}))
    ref = jax.nn.gelu(np.asarray(x) @ w1 + np.asarray(fc1["bias"]), approximate=False)
    ref = np.asarray(ref) @ w2 + np.asarray(fc2["bias"])
    rel = np.abs(got - ref).max() / np.abs(ref).max()
    assert rel < 0.08, rel


def test_w4a8_qk_linear_norm_rope_matches_unfused():
    """mode="norm_rope" (fused QK-RMSNorm + rotate-half RoPE epilogue) ==
    rms_norm_rope applied per head to the plain w4a8 output in f32."""
    from diffusionkit_tpu.ops.rope import rms_norm_rope
    from diffusionkit_tpu.ops.w4a8_matmul import w4a8_qk_eligible, w4a8_qk_linear

    rs = np.random.RandomState(7)
    K, N, M, D = 256, 256, 48, 128  # 2 heads of d=128
    H = N // D
    w = rs.randn(K, N).astype(np.float32) * 0.05
    p = add_wscale_tree(quantize_kernel_host(w, bits=4, group_size=64))
    p["bias"] = jnp.asarray(rs.randn(N).astype(np.float32) * 0.1)
    norm_w = jnp.asarray(rs.rand(D).astype(np.float32) + 0.5)
    ang = rs.rand(M, D // 2).astype(np.float32) * 6.28
    cos, sin = jnp.asarray(np.cos(ang)), jnp.asarray(np.sin(ang))
    x = jnp.asarray(rs.randn(1, M, K).astype(np.float32))

    import os

    os.environ["DIFFUSIONKIT_TPU_FUSED_QK"] = "1"
    try:
        assert w4a8_qk_eligible(p, D, interpret=True)
    finally:
        del os.environ["DIFFUSIONKIT_TPU_FUSED_QK"]
    got = np.asarray(
        w4a8_qk_linear(p, x, norm_w, cos, sin, interpret=True)
    )

    y = w4a8_linear(p, x, interpret=True)  # (1, M, N) f32
    ref = np.asarray(
        rms_norm_rope(
            y.reshape(1, M, H, D), norm_w, cos[:, None, :], sin[:, None, :]
        )
    ).reshape(1, M, N)
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-5)


def test_w4a8_qk_eligible_gates():
    """d!=128, missing wscale, and the env toggle all refuse the fused
    path (the model then falls back to the XLA rms_norm_rope chain)."""
    import os

    from diffusionkit_tpu.ops.w4a8_matmul import w4a8_qk_eligible

    rs = np.random.RandomState(3)
    w = rs.randn(256, 256).astype(np.float32) * 0.05
    p = add_wscale_tree(quantize_kernel_host(w, bits=4, group_size=64))
    os.environ["DIFFUSIONKIT_TPU_FUSED_QK"] = "0"
    try:
        assert not w4a8_qk_eligible(p, 128, interpret=True)  # env off
    finally:
        del os.environ["DIFFUSIONKIT_TPU_FUSED_QK"]
    os.environ["DIFFUSIONKIT_TPU_FUSED_QK"] = "1"
    try:
        assert w4a8_qk_eligible(p, 128, interpret=True)
        assert not w4a8_qk_eligible(p, 64, interpret=True)  # SD3.5 head size
        p_nows = {k: v for k, v in p.items() if k != "wscale"}
        assert not w4a8_qk_eligible(p_nows, 128, interpret=True)
    finally:
        del os.environ["DIFFUSIONKIT_TPU_FUSED_QK"]


def test_maybe_pad_n_picks():
    """_maybe_pad_n pads exactly the tiled-k + small-bn cases (SD3.5's
    19-factor dims) and leaves full-K / wide-bn / high-waste shapes alone."""
    from diffusionkit_tpu.ops.w4a8_matmul import _maybe_pad_n

    # SD3.5 fc2 consumer: k=9728 tiles at bk=512, n=2432 caps at bn=128.
    assert _maybe_pad_n(2432, 9728, 512, 128) == (2560, 512)
    # Full-K call (qkv/o/fc1 at k=2432): x stays resident, no pad.
    assert _maybe_pad_n(7296, 2432, 2432, 128) == (7296, 128)
    # bn already wide: no pad.
    assert _maybe_pad_n(3072, 12288, 512, 512) == (3072, 512)
    # Padding 640 -> 1024 would waste 60%: refused.
    assert _maybe_pad_n(640, 2048, 1024, 128) == (640, 128)
    # Env kill switch.
    import os

    os.environ["DIFFUSIONKIT_TPU_PAD_N"] = "0"
    try:
        assert _maybe_pad_n(2432, 9728, 512, 128) == (2432, 128)
    finally:
        del os.environ["DIFFUSIONKIT_TPU_PAD_N"]


def test_w4a8_linear_pad_n_bit_identical():
    """w4a8_linear at a pad-triggering shape (k tiled, n = 128*15) returns
    bit-identical values with padding on vs off: padded columns dequant to
    exactly 0 and are sliced off; real columns see the same int math."""
    import os

    rs = np.random.RandomState(11)
    K, N, M = 2048, 1920, 16
    w = rs.randn(K, N).astype(np.float32) * 0.05
    p = quantize_kernel_host(w, bits=4, group_size=64)
    p = {k: jnp.asarray(v) for k, v in p.items()}
    p["wscale"] = jnp.asarray(wscale_from_q4_host(jax.tree.map(np.asarray, p)))
    p["bias"] = jnp.asarray(rs.randn(N).astype(np.float32) * 0.1)
    x = jnp.asarray(rs.randn(M, K).astype(np.float32))

    from diffusionkit_tpu.ops.w4a8_matmul import _maybe_pad_n, _pick_kn_blocks

    bk, bn = _pick_kn_blocks(K, N, 64)
    assert K // bk > 1 and _maybe_pad_n(N, K, bk, bn)[0] == 2048  # triggers

    got_pad = np.asarray(w4a8_linear(p, x, interpret=True))
    os.environ["DIFFUSIONKIT_TPU_PAD_N"] = "0"
    try:
        got_nopad = np.asarray(w4a8_linear(p, x, interpret=True))
    finally:
        del os.environ["DIFFUSIONKIT_TPU_PAD_N"]
    assert got_pad.shape == (M, N)
    np.testing.assert_array_equal(got_pad, got_nopad)


def test_w4a8_ffn_gelu_pad_n_bit_identical():
    """The fused FFN's fc2 consumer with n2 padding on vs off: identical
    output (the int32 partial dots and f32 rescale per column are unchanged
    by the tile width)."""
    import os

    from diffusionkit_tpu.ops.w4a8_matmul import w4a8_ffn_gelu

    rs = np.random.RandomState(12)
    K, H, N2, M = 256, 2048, 1920, 48
    fc1 = quantize_kernel_host(rs.randn(K, H).astype(np.float32) * 0.05,
                               bits=4, group_size=64)
    fc2 = quantize_kernel_host(rs.randn(H, N2).astype(np.float32) * 0.05,
                               bits=4, group_size=64)
    fc1 = {**{k: jnp.asarray(v) for k, v in fc1.items()},
           "wscale": jnp.asarray(wscale_from_q4_host(fc1)),
           "bias": jnp.asarray(rs.randn(H).astype(np.float32) * 0.1)}
    fc2 = {**{k: jnp.asarray(v) for k, v in fc2.items()},
           "wscale": jnp.asarray(wscale_from_q4_host(fc2)),
           "bias": jnp.asarray(rs.randn(N2).astype(np.float32) * 0.1)}
    x = jnp.asarray(rs.randn(M, K).astype(np.float32) * 0.5)

    got_pad = np.asarray(w4a8_ffn_gelu(fc1, fc2, x, interpret=True))
    os.environ["DIFFUSIONKIT_TPU_PAD_N"] = "0"
    try:
        got_nopad = np.asarray(w4a8_ffn_gelu(fc1, fc2, x, interpret=True))
    finally:
        del os.environ["DIFFUSIONKIT_TPU_PAD_N"]
    assert got_pad.shape == (M, N2)
    np.testing.assert_array_equal(got_pad, got_nopad)
