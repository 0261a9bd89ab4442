"""Multi-modal Diffusion Transformer (MMDiT), TPU-first functional design.

Behavioural spec: reference python/src/diffusionkit/mlx/mmdit.py:22-988
(MMDiT as in https://arxiv.org/abs/2403.03206 plus the FLUX single-stream
blocks). Re-designed for XLA rather than translated:

- Parameters are a plain pytree; per-depth block parameters are STACKED along
  a leading axis and the block loop is a ``lax.scan`` — one compiled block
  body regardless of depth (38 unified blocks in FLUX), which keeps compile
  times flat and gives GSPMD a single sharding decision per weight.
- AdaLN modulation is computed inline each step (a 6*hidden GEMV — trivial on
  the MXU), replacing the reference's modulation pre-compute/weight-offload
  machinery (reference mmdit.py:77-186), which exists only to fit Metal
  memory.
- The joint attention runs through ops.attention.sdpa (Pallas flash kernel on
  TPU for long sequences).

Sequence-order parity notes (easy to get wrong, reference mmdit.py:594-657):
SD3 (depth_unified == 0) concatenates [image, text] for joint SDPA; FLUX
concatenates [text, image] in both block families, and RoPE positions place
text first.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import MMDiTConfig, PositionalEncoding
from ..ops.attention import sdpa
from ..ops.common import (
    ffn_gelu,
    linear,
    mlp_silu,
    patchify,
    timestep_embedding,
    unpack_flux,
    unpatchify_sd3,
)
from ..ops.norms import modulated_layer_norm, rms_norm
from ..ops.rope import apply_rope, rms_norm_rope, rope_frequencies

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Pytree utilities for stacked (scanned) block parameters
# ---------------------------------------------------------------------------


def tree_stack(trees: List[Params]) -> Params:
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *trees)


def tree_slice(tree: Params, start: int, end: int) -> Params:
    return jax.tree.map(lambda a: a[start:end], tree)


def tree_index(tree: Params, i: int) -> Params:
    return jax.tree.map(lambda a: a[i], tree)


def _upcast_leaf(a: jnp.ndarray) -> jnp.ndarray:
    """fp32-upcast for mixed trees: floats only (quantized ints untouched)."""
    return a.astype(jnp.float32) if jnp.issubdtype(a.dtype, jnp.floating) else a


def _segments(n: int, upcast: Tuple[int, ...]) -> List[Tuple[int, int, bool]]:
    """Split [0, n) into maximal runs of same-precision blocks."""
    out: List[Tuple[int, int, bool]] = []
    start = 0
    for i in range(n):
        if i in upcast:
            if start < i:
                out.append((start, i, False))
            out.append((i, i + 1, True))
            start = i + 1
    if start < n:
        out.append((start, n, False))
    return out


# ---------------------------------------------------------------------------
# Attention pieces
# ---------------------------------------------------------------------------


def _split_heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """(b, s, h*d) -> (b, s, h, d): a free reshape. Attention runs in the
    bshd layout end to end (ops/attention.py) so no physical head transpose
    is ever materialised around the Pallas flash kernel."""
    b, s, h = x.shape
    return x.reshape(b, s, num_heads, h // num_heads)


def _merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    b, s, nh, d = x.shape
    return x.reshape(b, s, nh * d)


def _mod_ln_maybe_quant(
    consumer: Params,
    x: jnp.ndarray,
    shift: jnp.ndarray,
    scale: jnp.ndarray,
    eps: float,
):
    """AdaLN LayerNorm whose output is quantized ONCE for its quantized
    consumers.

    The q/k/v projections (and FLUX's parallel-MLP fc1) all read the same
    modulated-LN tensor; on the w8a8/w4a8 paths each would otherwise run its
    own dynamic int8 quantization pass — the dominant elementwise cost of
    the quantized FLUX step (round-2 profile: ~145 ms of ~452 ms). On TPU
    the LayerNorm, modulation, absmax and round all run as ONE fused Pallas
    pass (ops/fused_quant.mod_ln_quantize) and the float normed tensor never
    reaches HBM. Returns an ActQuant the quantized linears consume directly;
    float consumers get the plain modulated_layer_norm output.

    ``consumer`` is the param dict of a representative consumer (they share
    quantization mode by construction of quantize_tree/w8a8_tree).

    Float consumers get the fused Pallas AdaLN-LN (ops/fused_quant.mod_ln)
    when eligible: XLA splits each site into a stats reduction plus one
    apply pass per consumer group (SD3 512² profile: ~4.6 ms/step across the
    four per-block sites — ~3x the read-once/write-once roofline).
    """
    from ..ops.fused_quant import fused_eligible, mod_ln, mod_ln_quantize
    from ..ops.w8a8 import needs_act_quant, quantize_shared

    if needs_act_quant(consumer):
        if fused_eligible(x.shape[-1]) and x.ndim == 3:
            return mod_ln_quantize(x, shift, scale, eps)
        return quantize_shared(modulated_layer_norm(x, shift, scale, eps))
    if fused_eligible(x.shape[-1]) and x.ndim == 3:
        return mod_ln(x, shift, scale, eps)
    return modulated_layer_norm(x, shift, scale, eps)


def _qkv(block: Params, x, config: MMDiTConfig, rope=None):
    """Project to per-head q, k, v; apply QK-RMSNorm and RoPE when configured.

    The key projection has no bias — redundant under softmax invariance
    (reference mmdit.py:820-823). ``x`` may be a shared ActQuant.

    ``rope`` is an optional raw (cos, sin) pair of (S, head_dim/2) tables
    matching x's sequence rows. With QK-norm present the two run as ONE
    fused fp32 chain — in the w4a8 kernel's epilogue when eligible
    (ops/w4a8_matmul.w4a8_qk_linear: the standalone chain was ~25 ms/step of
    VPU passes at FLUX 1024²), else as ops/rope.rms_norm_rope (the
    separate-call form rounds to the model dtype between norm and rotation).
    """
    if rope is not None and config.use_qk_norm:
        from ..ops.w4a8_matmul import w4a8_qk_eligible, w4a8_qk_linear

        if w4a8_qk_eligible(block["q"], config.head_dim) and w4a8_qk_eligible(
            block["k"], config.head_dim
        ):
            cos, sin = rope
            q = w4a8_qk_linear(
                block["q"], x, block["qk_norm"]["q_scale"], cos, sin
            )
            k = w4a8_qk_linear(
                block["k"], x, block["qk_norm"]["k_scale"], cos, sin
            )
            v = linear(block["v"], x)
            return (
                _split_heads(q, config.num_heads),
                _split_heads(k, config.num_heads),
                _split_heads(v, config.num_heads),
            )
    q = _split_heads(linear(block["q"], x), config.num_heads)
    k = _split_heads(linear(block["k"], x), config.num_heads)
    v = _split_heads(linear(block["v"], x), config.num_heads)
    if config.use_qk_norm:
        if rope is not None:
            cos, sin = rope
            q = rms_norm_rope(
                q, block["qk_norm"]["q_scale"], cos[:, None, :], sin[:, None, :]
            )
            k = rms_norm_rope(
                k, block["qk_norm"]["k_scale"], cos[:, None, :], sin[:, None, :]
            )
        else:
            q = rms_norm(q, block["qk_norm"]["q_scale"])
            k = rms_norm(k, block["qk_norm"]["k_scale"])
    elif rope is not None:
        cos, sin = rope
        q = apply_rope(q, cos[:, None, :], sin[:, None, :])
        k = apply_rope(k, cos[:, None, :], sin[:, None, :])
    return q, k, v


def _mod(vectors: jnp.ndarray, n: int) -> List[jnp.ndarray]:
    """Split (b, n*H) modulation output into n (b, 1, H) broadcastables."""
    parts = jnp.split(vectors, n, axis=-1)
    return [p[:, None, :] for p in parts]


def _ada(block: Params, c: jnp.ndarray, n: int, mesh=None) -> List[jnp.ndarray]:
    """adaLN_modulation: SiLU -> Linear -> split (reference mmdit.py:430-435).

    Under a mesh the ada weights are column-sharded over ``model`` (they are
    ~27% of FLUX's parameters — parallel/sharding._COL_PARENTS), so the raw
    linear output is model-sharded on its last axis. Constraining it back to
    replicated HERE makes GSPMD gather the tiny per-sample (B, n*H) vectors
    (~74 KB/block) instead of propagating the sharding into the elementwise
    modulation and all-gathering full (B, S, H) activations at the next
    matmul (25 MB/block — observed without the constraint)."""
    y = linear(block["ada"], jax.nn.silu(c))
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        y = jax.lax.with_sharding_constraint(
            y, NamedSharding(mesh, P("data", None))
        )
    return _mod(y, n)


# ---------------------------------------------------------------------------
# Transformer blocks
# ---------------------------------------------------------------------------


def _mm_block(
    bp: Params,
    img: jnp.ndarray,
    txt: jnp.ndarray,
    c: jnp.ndarray,
    rope: Optional[Tuple[jnp.ndarray, jnp.ndarray]],
    config: MMDiTConfig,
    sdpa_impl: Optional[str],
    mesh=None,
    final_skip_text: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dual-stream block with joint SDPA (reference mmdit.py:554-675).

    When ``final_skip_text`` (last SD3 multimodal block), the text branch has
    only 2 modulation params and no o_proj/MLP — text tokens still contribute
    keys/values but produce no output (reference mmdit.py:62-66,415-427,665-667).
    """
    eps = config.layer_norm_eps
    img_mods = _ada(bp["img"], c, 6, mesh)
    txt_mods = _ada(bp["txt"], c, 2 if final_skip_text else 6, mesh)

    img_h = _mod_ln_maybe_quant(bp["img"]["q"], img, img_mods[0], img_mods[1], eps)
    txt_h = _mod_ln_maybe_quant(bp["txt"]["q"], txt, txt_mods[0], txt_mods[1], eps)

    img_len = img.shape[1]
    txt_len = txt.shape[1]
    if config.depth_unified > 0:
        # FLUX text tokens carry all-zero (id, y, x) positions
        # (reference mmdit.py:865-876), so their rotation is the
        # identity (cos=1, sin=0 by construction — pinned by
        # test_ops.test_rope_text_positions_are_identity). Rotating only the
        # image branch BEFORE the joint concat (inside _qkv, fused with the
        # QK-RMSNorm) lets XLA fuse qk-norm+rope into one pass per branch
        # instead of the materialize-concat-rotate chain, and skips the
        # text rows.
        rope_img = None
        if rope is not None:
            cos, sin = rope
            rope_img = (cos[txt_len:], sin[txt_len:])
        q_i, k_i, v_i = _qkv(bp["img"], img_h, config, rope_img)
        q_t, k_t, v_t = _qkv(bp["txt"], txt_h, config)
        # FLUX order: text first (reference mmdit.py:594-606). Sequence is
        # axis 1 in the bshd layout.
        q = jnp.concatenate([q_t, q_i], axis=1)
        k = jnp.concatenate([k_t, k_i], axis=1)
        v = jnp.concatenate([v_t, v_i], axis=1)
    else:
        # SD3 order: image first (reference mmdit.py:607-625).
        q_i, k_i, v_i = _qkv(bp["img"], img_h, config)
        q_t, k_t, v_t = _qkv(bp["txt"], txt_h, config)
        q = jnp.concatenate([q_i, q_t], axis=1)
        k = jnp.concatenate([k_i, k_t], axis=1)
        v = jnp.concatenate([v_i, v_t], axis=1)
        if rope is not None:
            cos, sin = rope  # (S, d/2); broadcast over the head axis
            q = apply_rope(q, cos[:, None, :], sin[:, None, :])
            k = apply_rope(k, cos[:, None, :], sin[:, None, :])

    o = sdpa(q, k, v, scale=1.0 / (config.head_dim**0.5), impl=sdpa_impl,
             mesh=mesh, layout="bshd")
    o = _merge_heads(o)

    if config.depth_unified > 0:
        o_txt, o_img = o[:, :txt_len], o[:, txt_len:]
    else:
        o_img, o_txt = o[:, :img_len], o[:, img_len:]

    img = img + img_mods[2] * linear(bp["img"]["o"], o_img)
    img = img + img_mods[5] * ffn_gelu(
        bp["img"],
        _mod_ln_maybe_quant(bp["img"]["fc1"], img, img_mods[3], img_mods[4], eps),
    )

    if final_skip_text:
        return img, txt
    txt = txt + txt_mods[2] * linear(bp["txt"]["o"], o_txt)
    txt = txt + txt_mods[5] * ffn_gelu(
        bp["txt"],
        _mod_ln_maybe_quant(bp["txt"]["fc1"], txt, txt_mods[3], txt_mods[4], eps),
    )
    return img, txt


def _unified_block(
    bp: Params,
    x: jnp.ndarray,
    c: jnp.ndarray,
    rope: Optional[Tuple[jnp.ndarray, jnp.ndarray]],
    config: MMDiTConfig,
    sdpa_impl: Optional[str],
    mesh=None,
) -> jnp.ndarray:
    """Single-stream block with parallel MLP (reference mmdit.py:678-751).

    3 modulation params (shift, scale, gate); norm1/modulation shared between
    attention and MLP; the checkpoint's shared o_proj/fc2 bias is resolved at
    load time by zeroing fc2's bias (reference mmdit.py:741-742).
    """
    eps = config.layer_norm_eps
    n_mod = 3 if config.parallel_mlp_for_unified_blocks else 6
    mods = _ada(bp, c, n_mod, mesh)
    h = _mod_ln_maybe_quant(bp["q"], x, mods[0], mods[1], eps)
    q, k, v = _qkv(bp, h, config, rope)
    o = _merge_heads(
        sdpa(q, k, v, scale=1.0 / (config.head_dim**0.5), impl=sdpa_impl,
             mesh=mesh, layout="bshd")
    )
    if config.parallel_mlp_for_unified_blocks:
        return x + mods[2] * (linear(bp["o"], o) + ffn_gelu(bp, h))
    x = x + mods[2] * linear(bp["o"], o)
    return x + mods[5] * ffn_gelu(
        bp, _mod_ln_maybe_quant(bp["fc1"], x, mods[3], mods[4], eps)
    )


# ---------------------------------------------------------------------------
# Full model
# ---------------------------------------------------------------------------


def apply_mmdit(
    params: Params,
    config: MMDiTConfig,
    latent: jnp.ndarray,
    token_level_text_embeddings: jnp.ndarray,
    pooled_text_embeddings: jnp.ndarray,
    timestep: jnp.ndarray,
    guidance: Optional[jnp.ndarray] = None,
    sdpa_impl: Optional[str] = None,
    mesh=None,
) -> jnp.ndarray:
    """MMDiT forward (reference mmdit.py:188-266).

    Args:
      latent: (B, H_lat, W_lat, C) noisy latents, NHWC.
      token_level_text_embeddings: (B, T, token_level_text_embed_dim).
      pooled_text_embeddings: (B, pooled_text_embed_dim).
      timestep: (B,) in sigma*1000 units.
      guidance: (B,) distilled-guidance scale for FLUX.1-dev
        (config.guidance_embed). Unlike the reference — whose dev loader never
        engages guidance_embed (reference model_io.py:756, config.py:109) —
        this path is functional.
      mesh: optional jax.sharding.Mesh — routes attention through the
        mesh-aware dispatch (shard_map'd flash / ring; ops/attention.py).
    Returns: (B, H_lat, W_lat, C) model output (velocity prediction).
    """
    if mesh is not None:
        # The fused elementwise->int8 pallas_calls can't be partitioned by
        # GSPMD over model-axis-sharded activations; force the XLA
        # quantization path (which shards fine) for the whole traced body.
        from ..ops import fused_quant

        with fused_quant.disable_scope():
            return _apply_mmdit_body(
                params, config, latent, token_level_text_embeddings,
                pooled_text_embeddings, timestep, guidance, sdpa_impl, mesh,
            )
    return _apply_mmdit_body(
        params, config, latent, token_level_text_embeddings,
        pooled_text_embeddings, timestep, guidance, sdpa_impl, mesh,
    )


def _apply_mmdit_body(
    params: Params,
    config: MMDiTConfig,
    latent: jnp.ndarray,
    token_level_text_embeddings: jnp.ndarray,
    pooled_text_embeddings: jnp.ndarray,
    timestep: jnp.ndarray,
    guidance: Optional[jnp.ndarray],
    sdpa_impl: Optional[str],
    mesh,
) -> jnp.ndarray:
    b, lh, lw, _ = latent.shape
    dtype = config.dtype
    x = latent.astype(dtype)
    p = config.patch_size

    txt = linear(params["context_embedder"], token_level_text_embeddings.astype(dtype))

    # Patchify + project. Both SD3's k=2/s=2 conv and FLUX's reshape-pack are
    # expressed as space-to-depth + one matmul (the loader folds the conv
    # kernel), which is the MXU-native form of reference mmdit.py:269-302.
    x = linear(params["x_embedder"], patchify(x, p))

    if config.pos_embed_type == PositionalEncoding.LearnedInputEmbedding:
        # Center-cropped learned table (reference mmdit.py:324-349). The table
        # resolution comes from the checkpoint (SD3-medium and SD3.5 ship
        # different table sizes; cf. MAX_LATENT_RESOLUTION, model_io.py:118-127).
        h, w = lh // p, lw // p
        maxhw = int(round(params["pos_embed"].shape[-2] ** 0.5))
        y0 = (maxhw - h) // 2
        x0 = (maxhw - w) // 2
        pos = params["pos_embed"].reshape(maxhw, maxhw, config.hidden_size)
        x = x + pos[y0 : y0 + h, x0 : x0 + w].reshape(1, h * w, -1).astype(dtype)
        rope = None
    else:
        cos, sin = rope_frequencies(
            (lh // p, lw // p),
            txt.shape[1],
            config.rope_axes_dim,
            theta=10000,
        )
        rope = (cos, sin)

    # Modulation input c = y_embed + t_embed (+ guidance embed for FLUX-dev)
    # (reference mmdit.py:94-96,219-220; FLUX-dev per black-forest-labs spec).
    t_emb = mlp_silu(
        params["t_embedder"],
        timestep_embedding(timestep, config.frequency_embed_dim, config.max_period).astype(dtype),
    )
    y_emb = mlp_silu(params["y_embedder"], pooled_text_embeddings.astype(dtype))
    c = t_emb + y_emb
    if config.guidance_embed:
        if guidance is None:
            guidance = jnp.full((b,), 3.5, dtype=jnp.float32)
        c = c + mlp_silu(
            params["guidance_embedder"],
            timestep_embedding(guidance, config.frequency_embed_dim, config.max_period).astype(dtype),
        )

    # Multimodal (dual-stream) blocks.
    n_uniform = config.depth_multimodal - (1 if config.depth_unified == 0 else 0)

    def mm_body(carry, bp):
        img, txt_ = carry
        img, txt_ = _mm_block(bp, img, txt_, c, rope, config, sdpa_impl, mesh)
        return (img, txt_), None

    for start, end, upcast in _segments(n_uniform, tuple(config.upcast_multimodal_blocks)):
        seg = tree_slice(params["mm_blocks"], start, end)
        if upcast:
            # fp32 block (reference config.py:37, SD3.5-large block 35).
            # Only float leaves are cast — packed quantized weights (uint32
            # q4 / uint8 q8) must pass through untouched.
            seg32 = jax.tree.map(_upcast_leaf, seg)
            for i in range(end - start):
                (ximg, xtxt), _ = mm_body(
                    (x.astype(jnp.float32), txt.astype(jnp.float32)),
                    tree_index(seg32, i),
                )
                x, txt = ximg.astype(dtype), xtxt.astype(dtype)
        else:
            (x, txt), _ = jax.lax.scan(mm_body, (x, txt), seg)

    if config.depth_unified == 0:
        # Final SD3 multimodal block: text branch is K/V-only.
        x, _ = _mm_block(
            params["mm_final"], x, txt, c, rope, config, sdpa_impl, mesh,
            final_skip_text=True,
        )
    else:
        # FLUX: concat [text, image] once, run single-stream stack
        # (reference mmdit.py:233-247).
        u = jnp.concatenate([txt, x], axis=1)

        def uni_body(carry, bp):
            return _unified_block(bp, carry, c, rope, config, sdpa_impl, mesh), None

        for start, end, upcast in _segments(
            config.depth_unified, tuple(config.upcast_unified_blocks)
        ):
            seg = tree_slice(params["uni_blocks"], start, end)
            if upcast:
                seg32 = jax.tree.map(_upcast_leaf, seg)
                for i in range(end - start):
                    u32, _ = uni_body(u.astype(jnp.float32), tree_index(seg32, i))
                    u = u32.astype(dtype)
            else:
                u, _ = jax.lax.scan(uni_body, u, seg)
        x = u[:, txt.shape[1] :]

    # Final layer: 2-param AdaLN + linear (reference mmdit.py:767-796).
    shift, scale = _ada(params["final_layer"], c, 2, mesh)
    x = _mod_ln_maybe_quant(
        params["final_layer"]["linear"], x, shift, scale, config.layer_norm_eps
    )
    x = linear(params["final_layer"]["linear"], x)

    if config.patchify_via_reshape:
        return unpack_flux(x, (lh, lw), p)
    return unpatchify_sd3(x, (lh, lw), p, config.vae_latent_dim)


# ---------------------------------------------------------------------------
# Random initialisation (tests / benchmarks without checkpoints)
# ---------------------------------------------------------------------------


def _init_linear(key, d_in, d_out, dtype, bias=True, scale=0.02):
    kk, _ = jax.random.split(key)
    p = {"kernel": (jax.random.normal(kk, (d_in, d_out), jnp.float32) * scale).astype(dtype)}
    p["bias"] = jnp.zeros((d_out,), dtype) if bias else None
    return p


def _init_block(
    key, config: MMDiTConfig, num_mod: int, with_mlp: bool = True,
    quantize_bits: Optional[int] = None,
) -> Params:
    H = config.hidden_size
    keys = jax.random.split(key, 8)
    dtype = config.dtype

    if quantize_bits == "w8a8":
        from ..ops.w8a8 import random_w8a8_linear

        def lin(k, d_in, d_out, bias=True):
            return random_w8a8_linear(k, d_in, d_out, bias=bias, dtype=dtype)
    elif quantize_bits is not None:
        from ..ops.quantized import random_quantized_linear

        def lin(k, d_in, d_out, bias=True):
            return random_quantized_linear(
                k, d_in, d_out, bits=quantize_bits, bias=bias, dtype=dtype
            )
    else:
        def lin(k, d_in, d_out, bias=True):
            return _init_linear(k, d_in, d_out, dtype, bias=bias)

    p: Params = {
        "q": lin(keys[0], H, H),
        "k": lin(keys[1], H, H, bias=False),
        "v": lin(keys[2], H, H),
        "ada": lin(keys[3], H, num_mod * H),
    }
    if with_mlp:
        p["o"] = lin(keys[4], H, H)
        p["fc1"] = lin(keys[5], H, H * config.mlp_ratio)
        p["fc2"] = lin(keys[6], H * config.mlp_ratio, H)
    if config.use_qk_norm:
        p["qk_norm"] = {
            "q_scale": jnp.ones((config.head_dim,), dtype),
            "k_scale": jnp.ones((config.head_dim,), dtype),
        }
    return p


def init_mmdit_params(
    key: jax.Array, config: MMDiTConfig, quantize_bits: Optional[int] = None
) -> Params:
    """Random parameters with checkpoint-compatible shapes.

    ``quantize_bits`` (4, 8, or "w8a8") generates block weights DIRECTLY in
    the quantized execution formats of ops/quantized.py / ops/w8a8.py —
    required to stand up models whose unquantized weights exceed HBM
    (12B FLUX on one v5e).
    """
    H = config.hidden_size
    dtype = config.dtype
    keys = iter(jax.random.split(key, 16))
    patch_in = config.vae_latent_dim * config.patch_size**2

    params: Params = {
        "x_embedder": _init_linear(next(keys), patch_in, H, dtype),
        "context_embedder": _init_linear(
            next(keys), config.token_level_text_embed_dim, H, dtype
        ),
        "y_embedder": {
            "fc1": _init_linear(next(keys), config.pooled_text_embed_dim, H, dtype),
            "fc2": _init_linear(next(keys), H, H, dtype),
        },
        "t_embedder": {
            "fc1": _init_linear(next(keys), config.frequency_embed_dim, H, dtype),
            "fc2": _init_linear(next(keys), H, H, dtype),
        },
        "final_layer": {
            "ada": _init_linear(next(keys), H, 2 * H, dtype),
            "linear": _init_linear(
                next(keys), H, config.patch_size**2 * config.vae_latent_dim, dtype
            ),
        },
    }
    if config.guidance_embed:
        params["guidance_embedder"] = {
            "fc1": _init_linear(next(keys), config.frequency_embed_dim, H, dtype),
            "fc2": _init_linear(next(keys), H, H, dtype),
        }
    if config.pos_embed_type == PositionalEncoding.LearnedInputEmbedding:
        params["pos_embed"] = (
            jax.random.normal(
                next(keys),
                (config.max_latent_resolution**2, H),
                jnp.float32,
            )
            * 0.02
        ).astype(dtype)

    n_uniform = config.depth_multimodal - (1 if config.depth_unified == 0 else 0)
    mm_key = next(keys)
    blocks = []
    for i in range(n_uniform):
        k1, k2, mm_key = jax.random.split(mm_key, 3)
        blocks.append(
            {
                "img": _init_block(k1, config, 6, quantize_bits=quantize_bits),
                "txt": _init_block(k2, config, 6, quantize_bits=quantize_bits),
            }
        )
    params["mm_blocks"] = tree_stack(blocks)

    if config.depth_unified == 0:
        k1, k2 = jax.random.split(next(keys))
        params["mm_final"] = {
            "img": _init_block(k1, config, 6, quantize_bits=quantize_bits),
            "txt": _init_block(k2, config, 2, with_mlp=False, quantize_bits=quantize_bits),
        }
    else:
        uni_key = next(keys)
        ublocks = []
        n_mod = 3 if config.parallel_mlp_for_unified_blocks else 6
        for i in range(config.depth_unified):
            k1, uni_key = jax.random.split(uni_key)
            ublocks.append(_init_block(k1, config, n_mod, quantize_bits=quantize_bits))
        params["uni_blocks"] = tree_stack(ublocks)

    return params
