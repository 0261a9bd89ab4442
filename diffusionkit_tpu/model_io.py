"""Checkpoint I/O: HF-compatible safetensors -> JAX parameter pytrees.

Behavioural spec: reference python/src/diffusionkit/mlx/model_io.py:35-964.
Re-designed rather than translated: instead of string-rewriting a flat MLX
module namespace, each mapper walks the *raw* checkpoint layout directly and
emits this package's pytree layout (input-major matmul kernels, HWIO convs,
stacked-per-depth transformer blocks ready for ``lax.scan`` and per-layer
GSPMD sharding).

Raw-checkpoint facts honoured here (with reference evidence):
- SD3 fused qkv rows split 3-way; FLUX double-block qkv likewise
  (reference model_io.py:143-154,184-194).
- FLUX single-block ``linear1`` rows split (q, k, v, mlp.fc1) at
  (H, 2H, 3H, (3+mlp)H); ``linear2`` columns split (o_proj, mlp.fc2), and the
  single shared linear2 bias belongs to the *sum* o_proj+fc2, so it is
  assigned to o_proj and fc2's bias is dropped (reference
  model_io.py:217-279 and the ``fc2.bias * 0.0`` trick at mmdit.py:742-743).
- Key-projection biases are dropped everywhere — redundant under softmax
  shift invariance (reference model_io.py:388-389, mmdit.py:820-823).
- Conv weights: torch OIHW -> HWIO (TPU-native), replacing the reference's
  OIHW -> OHWI transposes for MLX (reference model_io.py:454-484).
- SD3 ``x_embedder.proj`` k=2/s=2 conv is *folded into a matmul* over
  space-to-depth patches: OIHW (H, C, p, p) -> reshape (H, C*p*p) -> (C*p*p, H),
  feature order (c, ph, pw) matching ops.common.patchify.
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Any, Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from .config import (
    FLUX_DEV,
    FLUX_SCHNELL,
    SD3_2b,
    SD3_8b,
    CLIPTextModelConfig,
    MMDiTConfig,
    T5Config,
    T5_XXL,
)
from .utils import get_logger

logger = get_logger(__name__)

Params = Dict[str, Any]

# ---------------------------------------------------------------------------
# Registry (reference mlx/__init__.py:37-53, model_io.py:35-127)
# ---------------------------------------------------------------------------

MMDIT_CKPT = {
    "argmaxinc/mlx-stable-diffusion-3-medium": "sd3_medium.safetensors",
    "argmaxinc/mlx-stable-diffusion-3.5-large": "sd3.5_large.safetensors",
    "argmaxinc/mlx-stable-diffusion-3.5-large-4bit-quantized": "sd3.5_large_4bit_quantized.safetensors",
    "argmaxinc/mlx-FLUX.1-schnell": "flux-schnell.safetensors",
    "argmaxinc/mlx-FLUX.1-schnell-4bit-quantized": "flux-schnell-4bit-quantized.safetensors",
    "argmaxinc/mlx-FLUX.1-dev": "flux1-dev.safetensors",
}

VAE_CKPT = {
    "argmaxinc/mlx-stable-diffusion-3-medium": "sd3_medium.safetensors",
    "argmaxinc/mlx-stable-diffusion-3.5-large": "sd3.5_large.safetensors",
    "argmaxinc/mlx-stable-diffusion-3.5-large-4bit-quantized": "sd3.5_large_4bit_quantized.safetensors",
    "argmaxinc/mlx-FLUX.1-schnell": "ae.safetensors",
    "argmaxinc/mlx-FLUX.1-schnell-4bit-quantized": "ae.safetensors",
    "argmaxinc/mlx-FLUX.1-dev": "ae.safetensors",
}

# VAE key prefixes inside each checkpoint (reference model_io.py:79-105).
VAE_PREFIX = {
    "argmaxinc/mlx-stable-diffusion-3-medium": "first_stage_model.",
    "argmaxinc/mlx-stable-diffusion-3.5-large": "first_stage_model.",
    "argmaxinc/mlx-stable-diffusion-3.5-large-4bit-quantized": "first_stage_model.",
    "argmaxinc/mlx-FLUX.1-schnell": "",
    "argmaxinc/mlx-FLUX.1-schnell-4bit-quantized": "",
    "argmaxinc/mlx-FLUX.1-dev": "",
}

MMDIT_CONFIG = {
    "argmaxinc/mlx-stable-diffusion-3-medium": SD3_2b,
    "argmaxinc/mlx-stable-diffusion-3.5-large": SD3_8b,
    "argmaxinc/mlx-stable-diffusion-3.5-large-4bit-quantized": SD3_8b,
    "argmaxinc/mlx-FLUX.1-schnell": FLUX_SCHNELL,
    "argmaxinc/mlx-FLUX.1-schnell-4bit-quantized": FLUX_SCHNELL,
    # Deliberate fix of a reference quirk: the reference loads FLUX.1-dev
    # with the schnell config so guidance_embed never engages
    # (reference model_io.py:756-758, config.py:109); here dev gets FLUX_DEV.
    "argmaxinc/mlx-FLUX.1-dev": FLUX_DEV,
}

QUANTIZED_CKPT = {
    "argmaxinc/mlx-stable-diffusion-3.5-large-4bit-quantized",
    "argmaxinc/mlx-FLUX.1-schnell-4bit-quantized",
}

# Aux model files live in one HF repo (reference model_io.py:65-77).
AUX_REPO = "argmaxinc/stable-diffusion"
AUX_FILES = {
    "clip_l_config": "clip_l/config.json",
    "clip_l": "clip_l/model.fp16.safetensors",
    "clip_g_config": "clip_g/config.json",
    "clip_g": "clip_g/model.fp16.safetensors",
    "tokenizer_l_vocab": "tokenizer_l/vocab.json",
    "tokenizer_l_merges": "tokenizer_l/merges.txt",
    "tokenizer_g_vocab": "tokenizer_g/vocab.json",
    "tokenizer_g_merges": "tokenizer_g/merges.txt",
    "t5": "t5/t5xxl.safetensors",
    # Generic-autoencoder rows (reference load_autoencoder reads
    # _MODELS[key]["vae_config"] / ["vae"], model_io.py:831,850 — keys its own
    # registry never defines; defined here so the loader actually works).
    "vae_config": "vae/config.json",
    "vae": "vae/diffusion_pytorch_model.safetensors",
}

T5_MAX_LENGTH = {
    "argmaxinc/mlx-stable-diffusion-3-medium": 512,
    "argmaxinc/mlx-stable-diffusion-3.5-large": 512,
    "argmaxinc/mlx-stable-diffusion-3.5-large-4bit-quantized": 512,
    "argmaxinc/mlx-FLUX.1-schnell": 256,
    "argmaxinc/mlx-FLUX.1-schnell-4bit-quantized": 256,
    "argmaxinc/mlx-FLUX.1-dev": 512,
}

DEPTH = {
    "argmaxinc/mlx-stable-diffusion-3-medium": 24,
    "argmaxinc/mlx-stable-diffusion-3.5-large": 38,
    "argmaxinc/mlx-stable-diffusion-3.5-large-4bit-quantized": 38,
}
MAX_LATENT_RESOLUTION = {
    "argmaxinc/mlx-stable-diffusion-3-medium": 96,
    "argmaxinc/mlx-stable-diffusion-3.5-large": 192,
    "argmaxinc/mlx-stable-diffusion-3.5-large-4bit-quantized": 192,
}


# ---------------------------------------------------------------------------
# Raw safetensors reading
# ---------------------------------------------------------------------------


# safetensors dtype tags -> numpy dtypes (BF16 via ml_dtypes).
def _st_dtype(tag: str):
    import ml_dtypes

    return {
        "F64": np.float64, "F32": np.float32, "F16": np.float16,
        "BF16": ml_dtypes.bfloat16, "I64": np.int64, "I32": np.int32,
        "I16": np.int16, "I8": np.int8, "U8": np.uint8, "U16": np.uint16,
        "U32": np.uint32, "U64": np.uint64, "BOOL": np.bool_,
        "F8_E4M3": ml_dtypes.float8_e4m3fn, "F8_E5M2": ml_dtypes.float8_e5m2,
    }[tag]


def load_safetensors(path: Union[str, Path]) -> Dict[str, np.ndarray]:
    """Zero-copy mmap safetensors reader.

    Native-runtime replacement for the reference's ``mx.load`` (reference
    model_io.py:725): the file is mapped read-only, madvise(WILLNEED)-
    prefetched via native/dkio.cpp, and every tensor is a numpy *view* into
    the mapping — no per-tensor copies for multi-GB checkpoints (the
    ``safetensors`` Python package copies each tensor). Format: 8-byte LE
    header length, JSON header {name: {dtype, shape, data_offsets}}, raw data.
    """
    import mmap as _mmap

    from . import native

    f = open(path, "rb")
    m = _mmap.mmap(f.fileno(), 0, prot=_mmap.PROT_READ)
    native.prefetch(m)
    n = int.from_bytes(m[:8], "little")
    header = json.loads(m[8 : 8 + n].decode("utf-8"))
    base = 8 + n
    out: Dict[str, np.ndarray] = {}
    for k, meta in header.items():
        if k == "__metadata__":
            continue
        dt = np.dtype(_st_dtype(meta["dtype"]))
        o0, o1 = meta["data_offsets"]
        count = (o1 - o0) // dt.itemsize
        arr = np.frombuffer(m, dtype=dt, count=count, offset=base + o0)
        out[k] = arr.reshape(meta["shape"])
    return out


def hub_download(repo: str, filename: str) -> str:
    """hf_hub_download with a clear offline error (reference model_io.py:723)."""
    from huggingface_hub import hf_hub_download

    try:
        return hf_hub_download(repo, filename)
    except Exception as e:
        raise RuntimeError(
            f"Could not fetch {repo}/{filename} from the HF Hub ({type(e).__name__}). "
            "If this host has no network access, mirror the checkpoints locally "
            "and set DIFFUSIONKIT_TPU_CKPT_DIR=<root> (layout: <repo-id>/<file>), "
            "or pass local_ckpt=/--local-ckpt for the MMDiT file."
        ) from e


# ---------------------------------------------------------------------------
# MLX 4-bit affine dequantization
# ---------------------------------------------------------------------------


def dequantize_mlx_4bit(
    packed: np.ndarray, scales: np.ndarray, biases: np.ndarray,
    group_size: Optional[int] = None,
) -> np.ndarray:
    """Unpack MLX ``nn.quantize`` 4-bit affine weights to float.

    MLX packs 8 4-bit values per uint32, little-end first; per-group affine
    w = scale * q + bias (group along the input axis). Equivalent of the
    ``nn.quantize`` load path (reference model_io.py:728-734,772-776).
    ``group_size`` defaults to inference from shapes, so checkpoints
    quantized with group size 32/64/128 all load.
    """
    out_dim, packed_in = packed.shape
    if group_size is None:
        group_size = (packed_in * 8) // scales.shape[1]
    vals = np.zeros((out_dim, packed_in * 8), dtype=np.float32)
    p = packed.astype(np.uint32)
    # Value j of word w sits at bits [4j, 4j+4) -> column w*8 + j.
    for j in range(8):
        vals[:, j::8] = ((p >> (4 * j)) & 0xF).astype(np.float32)
    scales = np.repeat(scales.astype(np.float32), group_size, axis=1)
    biases = np.repeat(biases.astype(np.float32), group_size, axis=1)
    return vals * scales + biases


def mlx_q4_to_exec(
    packed: np.ndarray,
    scales: np.ndarray,
    biases: np.ndarray,
    bias: Optional[np.ndarray],
    dtype,
) -> Params:
    """LOSSLESS repack of an MLX 4-bit QuantizedLinear to the execution format.

    MLX stores ``weight`` (out, in/8) uint32 with 8 nibbles per word along the
    input axis and per-(out, group) ``scales``/``biases`` such that
    w = scale * q + bias. The execution format (ops/quantized.py) is the same
    affine scheme transposed: q4 (in/8, out), scales/zeros (in/g, out). The
    nibbles are moved bit-for-bit and the affine arrays only transposed, so
    dequantisation is bit-identical — no float round trip (fixes the lossy
    re-quantisation flagged in VERDICT round 1; reference load path
    model_io.py:728-734).
    """
    from .ops.quantized import pack_int4_host

    out_dim, packed_in = packed.shape
    in_dim = packed_in * 8
    p = np.asarray(packed, dtype=np.uint32)
    q = np.zeros((out_dim, in_dim), dtype=np.uint8)
    for j in range(8):
        q[:, j::8] = ((p >> np.uint32(4 * j)) & np.uint32(0xF)).astype(np.uint8)
    # Host numpy throughout (device placement happens once in load_mmdit).
    return {
        "q4": pack_int4_host(np.ascontiguousarray(q.T)),
        "scales": np.ascontiguousarray(scales.astype(np.float32).T),
        "zeros": np.ascontiguousarray(biases.astype(np.float32).T),
        "bias": _as(dtype, np.asarray(bias)) if bias is not None else None,
    }


def _mlx_lin(sd: Dict[str, np.ndarray], key: str, dtype, bias: bool = True) -> Params:
    """MLX Linear / QuantizedLinear -> exec params.

    Quantized layers (a ``.scales`` sibling exists and ``.weight`` is uint32)
    repack losslessly; float layers transpose like torch Linears (MLX shares
    the (out, in) layout).
    """
    w = sd[key + ".weight"]
    b = sd.get(key + ".bias") if bias else None
    if key + ".scales" in sd and w.dtype == np.uint32:
        return mlx_q4_to_exec(w, sd[key + ".scales"], sd[key + ".biases"], b, dtype)
    return _lin_from(np.asarray(w), b, dtype)


def _maybe_dequantize(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Collapse ``{k}.weight``(uint32) + ``{k}.scales`` + ``{k}.biases`` triples."""
    out: Dict[str, np.ndarray] = {}
    for k, v in sd.items():
        if k.endswith(".scales") or k.endswith(".biases"):
            continue
        if k.endswith(".weight") and v.dtype == np.uint32:
            base = k[: -len(".weight")]
            out[k] = dequantize_mlx_4bit(
                v, sd[base + ".scales"], sd[base + ".biases"]
            )
        else:
            out[k] = v
    return out


# ---------------------------------------------------------------------------
# Pytree-building helpers
# ---------------------------------------------------------------------------


def _as(dtype, a: np.ndarray) -> np.ndarray:
    """Host-side dtype cast (ml_dtypes covers bfloat16 in numpy).

    Mappers build HOST trees so multi-GB models are never resident on device
    before sharding/quantisation decisions; loaders ``jax.device_put`` the
    finished tree (optionally with NamedShardings) in one pass.
    """
    import ml_dtypes

    np_dtype = np.dtype(dtype) if dtype != jnp.bfloat16 else ml_dtypes.bfloat16
    return np.ascontiguousarray(a).astype(np_dtype)


def _lin(sd, key, dtype, bias=True) -> Params:
    """torch Linear (out,in) -> {"kernel": (in,out), "bias": (out,)}"""
    p = {"kernel": _as(dtype, np.asarray(sd[key + ".weight"]).T)}
    p["bias"] = _as(dtype, sd[key + ".bias"]) if bias and key + ".bias" in sd else None
    return p


def _lin_from(w: np.ndarray, b: Optional[np.ndarray], dtype) -> Params:
    return {
        "kernel": _as(dtype, w.T),
        "bias": _as(dtype, b) if b is not None else None,
    }


def _conv(sd, key, dtype) -> Params:
    """torch Conv2d OIHW -> {"kernel": HWIO, "bias": (out,)}"""
    return {
        "kernel": _as(dtype, np.asarray(sd[key + ".weight"]).transpose(2, 3, 1, 0)),
        "bias": _as(dtype, sd[key + ".bias"]),
    }


def _norm(sd, key, dtype) -> Params:
    return {"weight": _as(dtype, sd[key + ".weight"]), "bias": _as(dtype, sd[key + ".bias"])}


def _stack(trees):
    import jax

    # np.stack, NOT jnp.stack: mappers promise HOST trees (see _as) so
    # multi-GB models never hit HBM before sharding/quantisation decisions —
    # jnp here silently device-put an 8B bf16 stacked tree and OOM'd the
    # chip when load_mmdit(to_device=False) was combined with quantize_mmdit.
    return jax.tree.map(lambda *xs: np.stack(xs, axis=0), *trees)


def _strip_prefix(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    if not prefix:
        return sd
    return {k[len(prefix) :]: v for k, v in sd.items() if k.startswith(prefix)}


# ---------------------------------------------------------------------------
# MMDiT mappers
# ---------------------------------------------------------------------------


def _qkv_split(sd, key, dtype, use_qk_norm, qk_prefix=None) -> Params:
    """Split fused qkv rows into q/k/v; drop the redundant k bias."""
    w = np.asarray(sd[key + ".weight"])
    b = np.asarray(sd[key + ".bias"]) if key + ".bias" in sd else None
    wq, wk, wv = np.split(w, 3, axis=0)
    bq, bk, bv = np.split(b, 3) if b is not None else (None, None, None)
    p = {
        "q": _lin_from(wq, bq, dtype),
        "k": _lin_from(wk, None, dtype),
        "v": _lin_from(wv, bv, dtype),
    }
    if use_qk_norm and qk_prefix is not None:
        p["qk_norm"] = {
            "q_scale": _as(dtype, sd[qk_prefix[0]]),
            "k_scale": _as(dtype, sd[qk_prefix[1]]),
        }
    return p


def _permute_qk_for_rope(params: Params, config: MMDiTConfig) -> Params:
    """Fold the rotate-half RoPE layout change into the q/k projections.

    Attention scores are invariant under a shared permutation of q and k
    head columns, so the interleaved->halves reorder the TPU rope form
    needs (ops/rope.rope_head_permutation) is applied ONCE here to every
    rope-consuming projection's output columns — float kernels, packed-int4
    exec leaves (nibbles pack along the INPUT axis, so output-column gathers
    are exact), their per-output-channel scales/zeros, the q bias, and the
    per-dim QK-RMSNorm scales. Zero runtime cost; v/o and the attention
    math itself are bit-unaffected up to float reassociation.
    """
    from .ops.rope import rope_head_permutation

    d = config.hidden_size // config.num_heads
    perm = rope_head_permutation(d)
    col_perm = (
        np.arange(config.num_heads)[:, None] * d + perm[None, :]
    ).reshape(-1)

    def permute_lin(p: Params) -> Params:
        out = dict(p)
        for key in ("kernel", "q4", "scales", "zeros"):
            if p.get(key) is not None:
                out[key] = p[key][..., col_perm]
        if p.get("bias") is not None:
            out["bias"] = p["bias"][..., col_perm]
        return out

    def permute_block(bp: Params) -> Params:
        bp = dict(bp)
        bp["q"] = permute_lin(bp["q"])
        bp["k"] = permute_lin(bp["k"])
        if "qk_norm" in bp:
            bp["qk_norm"] = {
                "q_scale": bp["qk_norm"]["q_scale"][..., perm],
                "k_scale": bp["qk_norm"]["k_scale"][..., perm],
            }
        return bp

    params = dict(params)
    if "mm_blocks" in params:
        params["mm_blocks"] = {
            side: permute_block(params["mm_blocks"][side])
            for side in params["mm_blocks"]
        }
    if "uni_blocks" in params:
        params["uni_blocks"] = permute_block(params["uni_blocks"])
    return params


def _fold_patch_conv(w: np.ndarray, dtype) -> jnp.ndarray:
    """OIHW (H, C, p, p) conv -> (C*p*p, H) matmul kernel, (c, ph, pw) order."""
    out_dim = w.shape[0]
    return _as(dtype, w.reshape(out_dim, -1).T)


def mmdit_params_from_sd3_ckpt(
    sd: Dict[str, np.ndarray], config: MMDiTConfig, dtype=None
) -> Params:
    """Map a raw SD3/SD3.5 checkpoint (``model.diffusion_model.`` namespace)
    to the stacked-block pytree (reference model_io.py:313-409)."""
    dtype = dtype or config.dtype
    sd = _strip_prefix(sd, "model.diffusion_model.")
    sd = _maybe_dequantize(sd)

    def block(prefix: str, skip_post: bool) -> Params:
        qk = (
            (prefix + ".attn.ln_q.weight", prefix + ".attn.ln_k.weight")
            if config.use_qk_norm
            else None
        )
        p = _qkv_split(sd, prefix + ".attn.qkv", dtype, config.use_qk_norm, qk)
        p["ada"] = _lin(sd, prefix + ".adaLN_modulation.1", dtype)
        if not skip_post:
            p["o"] = _lin(sd, prefix + ".attn.proj", dtype)
            p["fc1"] = _lin(sd, prefix + ".mlp.fc1", dtype)
            p["fc2"] = _lin(sd, prefix + ".mlp.fc2", dtype)
        return p

    depth = config.depth_multimodal
    blocks = []
    for i in range(depth - 1):
        blocks.append(
            {
                "img": block(f"joint_blocks.{i}.x_block", False),
                "txt": block(f"joint_blocks.{i}.context_block", False),
            }
        )
    params: Params = {"mm_blocks": _stack(blocks)}
    params["mm_final"] = {
        "img": block(f"joint_blocks.{depth-1}.x_block", False),
        "txt": block(f"joint_blocks.{depth-1}.context_block", True),
    }

    params["x_embedder"] = {
        "kernel": _fold_patch_conv(np.asarray(sd["x_embedder.proj.weight"]), dtype),
        "bias": _as(dtype, sd["x_embedder.proj.bias"]),
    }
    pos = np.asarray(sd["pos_embed"])  # (1, R*R, H)
    params["pos_embed"] = _as(dtype, pos.reshape(pos.shape[-2], pos.shape[-1]))
    params["context_embedder"] = _lin(sd, "context_embedder", dtype)
    params["t_embedder"] = {
        "fc1": _lin(sd, "t_embedder.mlp.0", dtype),
        "fc2": _lin(sd, "t_embedder.mlp.2", dtype),
    }
    params["y_embedder"] = {
        "fc1": _lin(sd, "y_embedder.mlp.0", dtype),
        "fc2": _lin(sd, "y_embedder.mlp.2", dtype),
    }
    params["final_layer"] = {
        "ada": _lin(sd, "final_layer.adaLN_modulation.1", dtype),
        "linear": _lin(sd, "final_layer.linear", dtype),
    }
    return params


def mmdit_params_from_flux_ckpt(
    sd: Dict[str, np.ndarray], config: MMDiTConfig, dtype=None
) -> Params:
    """Map a raw FLUX checkpoint (BFL namespace: double_blocks/single_blocks)
    to the stacked-block pytree (reference model_io.py:130-310)."""
    dtype = dtype or config.dtype
    sd = _maybe_dequantize(sd)
    H = config.hidden_size
    mlp = config.mlp_ratio

    def double_half(prefix: str, tag: str) -> Params:
        qk = (
            (
                f"{prefix}.{tag}_attn.norm.query_norm.scale",
                f"{prefix}.{tag}_attn.norm.key_norm.scale",
            )
            if config.use_qk_norm
            else None
        )
        p = _qkv_split(sd, f"{prefix}.{tag}_attn.qkv", dtype, config.use_qk_norm, qk)
        p["o"] = _lin(sd, f"{prefix}.{tag}_attn.proj", dtype)
        p["fc1"] = _lin(sd, f"{prefix}.{tag}_mlp.0", dtype)
        p["fc2"] = _lin(sd, f"{prefix}.{tag}_mlp.2", dtype)
        p["ada"] = _lin(sd, f"{prefix}.{tag}_mod.lin", dtype)
        return p

    blocks = []
    for i in range(config.depth_multimodal):
        blocks.append(
            {
                "img": double_half(f"double_blocks.{i}", "img"),
                "txt": double_half(f"double_blocks.{i}", "txt"),
            }
        )
    params: Params = {"mm_blocks": _stack(blocks)}

    def single(prefix: str) -> Params:
        # linear1 rows: (q | k | v | fc1); linear2 cols: (o | fc2); shared
        # linear2 bias goes to o (sum semantics, reference mmdit.py:741-743).
        w1 = np.asarray(sd[prefix + ".linear1.weight"])
        b1 = np.asarray(sd[prefix + ".linear1.bias"])
        wq, wk, wv, wf1 = np.split(w1, [H, 2 * H, 3 * H], axis=0)
        bq, bk, bv, bf1 = np.split(b1, [H, 2 * H, 3 * H])
        w2 = np.asarray(sd[prefix + ".linear2.weight"])
        b2 = np.asarray(sd[prefix + ".linear2.bias"])
        wo, wf2 = np.split(w2, [H], axis=1)
        p = {
            "q": _lin_from(wq, bq, dtype),
            "k": _lin_from(wk, None, dtype),
            "v": _lin_from(wv, bv, dtype),
            "fc1": _lin_from(wf1, bf1, dtype),
            "o": _lin_from(wo, b2, dtype),
            "fc2": _lin_from(wf2, None, dtype),
            "ada": _lin(sd, prefix + ".modulation.lin", dtype),
        }
        if config.use_qk_norm:
            p["qk_norm"] = {
                "q_scale": _as(dtype, sd[prefix + ".norm.query_norm.scale"]),
                "k_scale": _as(dtype, sd[prefix + ".norm.key_norm.scale"]),
            }
        return p

    params["uni_blocks"] = _stack(
        [single(f"single_blocks.{i}") for i in range(config.depth_unified)]
    )

    params["x_embedder"] = _lin(sd, "img_in", dtype)
    params["context_embedder"] = _lin(sd, "txt_in", dtype)
    params["t_embedder"] = {
        "fc1": _lin(sd, "time_in.in_layer", dtype),
        "fc2": _lin(sd, "time_in.out_layer", dtype),
    }
    params["y_embedder"] = {
        "fc1": _lin(sd, "vector_in.in_layer", dtype),
        "fc2": _lin(sd, "vector_in.out_layer", dtype),
    }
    if config.guidance_embed:
        params["guidance_embedder"] = {
            "fc1": _lin(sd, "guidance_in.in_layer", dtype),
            "fc2": _lin(sd, "guidance_in.out_layer", dtype),
        }
    params["final_layer"] = {
        "ada": _lin(sd, "final_layer.adaLN_modulation.1", dtype),
        "linear": _lin(sd, "final_layer.linear", dtype),
    }
    # Checkpoint rope convention (interleaved pairs) -> the TPU rotate-half
    # layout (ops/rope.py). Folded into q/k columns at map time so the hot
    # path never reshuffles. NOTE: save_params caches written before this
    # change carry the old layout; regenerate them.
    return _permute_qk_for_rope(params, config)


def mmdit_params_from_mlx_ckpt(
    sd: Dict[str, np.ndarray], config: MMDiTConfig, dtype=None
) -> Params:
    """Map an MLX-module-namespace checkpoint to the stacked-block pytree.

    The two ``*-4bit-quantized`` registry models ship PRE-ADJUSTED: their key
    namespace is the reference's MLX module tree (q/k/v already split,
    ``multimodal_transformer_blocks.N.image_transformer_block...``), not the
    raw sgm/BFL namespace — the reference loads them with ``nn.quantize`` +
    direct weight assignment, no key adjustment (reference
    model_io.py:726-734, 764-776). Quantized Linears (uint32 weight +
    scales/biases) are repacked bit-for-bit via mlx_q4_to_exec; float tensors
    pass through. Works for SD3.5-style (learned pos embed, final K/V-only
    text block) and FLUX-style (unified blocks, RoPE) module trees alike.
    """
    dtype = dtype or config.dtype
    if any(k.startswith("model.diffusion_model.") for k in sd):
        sd = _strip_prefix(sd, "model.diffusion_model.")

    def qk_norm(prefix: str) -> Params:
        return {
            "q_scale": _as(dtype, sd[prefix + ".qk_norm.q_norm.weight"]),
            "k_scale": _as(dtype, sd[prefix + ".qk_norm.k_norm.weight"]),
        }

    def block(prefix: str, skip_post: bool = False, shared_post_bias: bool = False) -> Params:
        p: Params = {
            "q": _mlx_lin(sd, prefix + ".attn.q_proj", dtype),
            "k": _mlx_lin(sd, prefix + ".attn.k_proj", dtype, bias=False),
            "v": _mlx_lin(sd, prefix + ".attn.v_proj", dtype),
            "ada": _mlx_lin(sd, prefix + ".adaLN_modulation.layers.1", dtype),
        }
        if not skip_post:
            p["o"] = _mlx_lin(sd, prefix + ".attn.o_proj", dtype)
            p["fc1"] = _mlx_lin(sd, prefix + ".mlp.fc1", dtype)
            # FLUX unified blocks duplicate the shared linear2 bias onto both
            # o_proj and fc2 at adjustment time (reference model_io.py:247-263)
            # and zero fc2's copy at runtime (reference mmdit.py:741-743);
            # keeping only o's copy preserves the sum semantics.
            p["fc2"] = _mlx_lin(sd, prefix + ".mlp.fc2", dtype, bias=not shared_post_bias)
        if config.use_qk_norm:
            p["qk_norm"] = qk_norm(prefix)
        return p

    n_mm = config.depth_multimodal
    is_flux = config.depth_unified > 0
    n_stacked = n_mm - (0 if is_flux else 1)
    blocks = []
    for i in range(n_stacked):
        pre = f"multimodal_transformer_blocks.{i}"
        blocks.append(
            {
                "img": block(pre + ".image_transformer_block"),
                "txt": block(pre + ".text_transformer_block"),
            }
        )
    params: Params = {"mm_blocks": _stack(blocks)}
    if not is_flux:
        pre = f"multimodal_transformer_blocks.{n_mm - 1}"
        params["mm_final"] = {
            "img": block(pre + ".image_transformer_block"),
            "txt": block(pre + ".text_transformer_block", skip_post=True),
        }
    else:
        params["uni_blocks"] = _stack(
            [
                block(
                    f"unified_transformer_blocks.{i}.transformer_block",
                    shared_post_bias=True,
                )
                for i in range(config.depth_unified)
            ]
        )

    # x_embedder: MLX Conv2d, OHWI layout (O, p, p, I) — adjusted from OIHW at
    # ckpt-creation time; folded to the same (c, ph, pw)-ordered matmul as the
    # raw-namespace loaders.
    xw = np.asarray(sd["x_embedder.proj.weight"])
    params["x_embedder"] = {
        "kernel": _fold_patch_conv(xw.transpose(0, 3, 1, 2), dtype),
        "bias": _as(dtype, sd["x_embedder.proj.bias"]),
    }
    if "x_pos_embedder.pos_embed.weight" in sd:
        params["pos_embed"] = _as(dtype, sd["x_pos_embedder.pos_embed.weight"])
    params["context_embedder"] = _mlx_lin(sd, "context_embedder", dtype)
    params["t_embedder"] = {
        "fc1": _mlx_lin(sd, "t_embedder.mlp.layers.0", dtype),
        "fc2": _mlx_lin(sd, "t_embedder.mlp.layers.2", dtype),
    }
    params["y_embedder"] = {
        "fc1": _mlx_lin(sd, "y_embedder.mlp.layers.0", dtype),
        "fc2": _mlx_lin(sd, "y_embedder.mlp.layers.2", dtype),
    }
    if config.guidance_embed and "guidance_in.mlp.layers.0.weight" in sd:
        params["guidance_embedder"] = {
            "fc1": _mlx_lin(sd, "guidance_in.mlp.layers.0", dtype),
            "fc2": _mlx_lin(sd, "guidance_in.mlp.layers.2", dtype),
        }
    params["final_layer"] = {
        "ada": _mlx_lin(sd, "final_layer.adaLN_modulation.layers.1", dtype),
        "linear": _mlx_lin(sd, "final_layer.linear", dtype),
    }
    from .config import PositionalEncoding

    if config.pos_embed_type == PositionalEncoding.PreSDPARope:
        # FLUX-style trees only; SD3.5 (learned pos embed, no rope) keeps
        # its columns. Exact on packed-int4 leaves (nibbles pack along the
        # input axis).
        params = _permute_qk_for_rope(params, config)
    return params


# ---------------------------------------------------------------------------
# VAE mappers (raw sgm namespace: decoder.up.N / encoder.down.N)
# ---------------------------------------------------------------------------


def _vae_resnet(sd, prefix, dtype) -> Params:
    p = {
        "norm1": _norm(sd, prefix + ".norm1", dtype),
        "conv1": _conv(sd, prefix + ".conv1", dtype),
        "norm2": _norm(sd, prefix + ".norm2", dtype),
        "conv2": _conv(sd, prefix + ".conv2", dtype),
    }
    if prefix + ".nin_shortcut.weight" in sd:
        # 1x1 conv -> linear (reference model_io.py:476-479).
        w = np.asarray(sd[prefix + ".nin_shortcut.weight"])[:, :, 0, 0]
        p["conv_shortcut"] = _lin_from(w, sd[prefix + ".nin_shortcut.bias"], dtype)
    return p


def _vae_attn(sd, prefix, dtype) -> Params:
    def proj(name):
        w = np.asarray(sd[f"{prefix}.{name}.weight"])[:, :, 0, 0]
        return _lin_from(w, sd[f"{prefix}.{name}.bias"], dtype)

    return {
        "group_norm": _norm(sd, prefix + ".norm", dtype),
        "query_proj": proj("q"),
        "key_proj": proj("k"),
        "value_proj": proj("v"),
        "out_proj": proj("proj_out"),
    }


def vae_decoder_params_from_ckpt(
    sd: Dict[str, np.ndarray], dtype=jnp.float32, prefix: str = "decoder.",
    layers_per_block: int = 3, num_blocks: int = 4,
) -> Params:
    """Raw sgm VAE decoder (reference model_io.py:412-487)."""
    sd = _strip_prefix(sd, prefix)
    p: Params = {"conv_in": _conv(sd, "conv_in", dtype)}
    p["mid_blocks"] = [
        _vae_resnet(sd, "mid.block_1", dtype),
        _vae_attn(sd, "mid.attn_1", dtype),
        _vae_resnet(sd, "mid.block_2", dtype),
    ]
    up_blocks = []
    for i in range(num_blocks):  # stored 0=lowest-res; applied reversed
        bp: Params = {
            "resnets": [
                _vae_resnet(sd, f"up.{i}.block.{j}", dtype)
                for j in range(layers_per_block)
            ]
        }
        if f"up.{i}.upsample.conv.weight" in sd:
            bp["upsample"] = _conv(sd, f"up.{i}.upsample.conv", dtype)
        up_blocks.append(bp)
    p["up_blocks"] = up_blocks
    p["conv_norm_out"] = _norm(sd, "norm_out", dtype)
    p["conv_out"] = _conv(sd, "conv_out", dtype)
    return p


def vae_encoder_params_from_ckpt(
    sd: Dict[str, np.ndarray], dtype=jnp.float32, prefix: str = "encoder.",
    layers_per_block: int = 2, num_blocks: int = 4,
) -> Params:
    """Raw sgm VAE encoder (reference model_io.py:490-564)."""
    sd = _strip_prefix(sd, prefix)
    p: Params = {"conv_in": _conv(sd, "conv_in", dtype)}
    down_blocks = []
    for i in range(num_blocks):
        bp: Params = {
            "resnets": [
                _vae_resnet(sd, f"down.{i}.block.{j}", dtype)
                for j in range(layers_per_block)
            ]
        }
        if f"down.{i}.downsample.conv.weight" in sd:
            bp["downsample"] = _conv(sd, f"down.{i}.downsample.conv", dtype)
        down_blocks.append(bp)
    p["down_blocks"] = down_blocks
    p["mid_blocks"] = [
        _vae_resnet(sd, "mid.block_1", dtype),
        _vae_attn(sd, "mid.attn_1", dtype),
        _vae_resnet(sd, "mid.block_2", dtype),
    ]
    p["conv_norm_out"] = _norm(sd, "norm_out", dtype)
    p["conv_out"] = _conv(sd, "conv_out", dtype)
    return p


# ---------------------------------------------------------------------------
# Generic autoencoder mapper (HF diffusers AutoencoderKL namespace)
# ---------------------------------------------------------------------------


def _lin_or_1x1(sd, key, dtype) -> Params:
    """A projection stored either as a torch Linear (out, in) or a 1x1 Conv2d
    (out, in, 1, 1) -> {"kernel": (in, out)}. Diffusers attention projections
    changed from conv to linear across versions; the reference squeezes the
    conv form (reference model_io.py:664-671)."""
    w = np.asarray(sd[key + ".weight"])
    if w.ndim == 4:
        w = w[:, :, 0, 0]
    return _lin_from(w, sd.get(key + ".bias"), dtype)


def _vae_resnet_diffusers(sd, prefix, dtype) -> Params:
    p = {
        "norm1": _norm(sd, prefix + ".norm1", dtype),
        "conv1": _conv(sd, prefix + ".conv1", dtype),
        "norm2": _norm(sd, prefix + ".norm2", dtype),
        "conv2": _conv(sd, prefix + ".conv2", dtype),
    }
    if prefix + ".conv_shortcut.weight" in sd:
        p["conv_shortcut"] = _lin_or_1x1(sd, prefix + ".conv_shortcut", dtype)
    return p


def _vae_attn_diffusers(sd, prefix, dtype) -> Params:
    # to_q/to_k/to_v/to_out.0 (modern diffusers) with the legacy
    # query/key/value/proj_attn spelling as fallback.
    modern = prefix + ".to_q.weight" in sd
    names = (
        ("to_q", "to_k", "to_v", "to_out.0") if modern
        else ("query", "key", "value", "proj_attn")
    )
    return {
        "group_norm": _norm(sd, prefix + ".group_norm", dtype),
        "query_proj": _lin_or_1x1(sd, f"{prefix}.{names[0]}", dtype),
        "key_proj": _lin_or_1x1(sd, f"{prefix}.{names[1]}", dtype),
        "value_proj": _lin_or_1x1(sd, f"{prefix}.{names[2]}", dtype),
        "out_proj": _lin_or_1x1(sd, f"{prefix}.{names[3]}", dtype),
    }


def autoencoder_params_from_diffusers_ckpt(
    sd: Dict[str, np.ndarray], config: "AutoencoderConfig", dtype=jnp.float32
) -> Params:
    """HF diffusers AutoencoderKL checkpoint -> generic autoencoder pytree
    (reference model_io.py:639-677 map_vae_weights + 826-855 load_autoencoder).

    Layout notes: diffusers decoder up_blocks apply in storage order
    (index 0 = lowest resolution, straight after the mid block); the pytree
    convention here (models/vae.apply_vae_decoder) stores up_blocks
    outermost-resolution-first and applies them reversed, so the list is
    flipped at map time. quant/post_quant 1x1 convs become linears
    (reference model_io.py:664-667)."""
    n_blocks = len(config.block_out_channels)

    def enc_block(i: int) -> Params:
        pre = f"encoder.down_blocks.{i}"
        bp: Params = {
            "resnets": [
                _vae_resnet_diffusers(sd, f"{pre}.resnets.{j}", dtype)
                for j in range(config.layers_per_block)
            ]
        }
        if f"{pre}.downsamplers.0.conv.weight" in sd:
            bp["downsample"] = _conv(sd, f"{pre}.downsamplers.0.conv", dtype)
        return bp

    def dec_block(i: int) -> Params:
        pre = f"decoder.up_blocks.{i}"
        bp: Params = {
            "resnets": [
                _vae_resnet_diffusers(sd, f"{pre}.resnets.{j}", dtype)
                for j in range(config.layers_per_block + 1)
            ]
        }
        if f"{pre}.upsamplers.0.conv.weight" in sd:
            bp["upsample"] = _conv(sd, f"{pre}.upsamplers.0.conv", dtype)
        return bp

    def mid(side: str) -> list:
        return [
            _vae_resnet_diffusers(sd, f"{side}.mid_block.resnets.0", dtype),
            _vae_attn_diffusers(sd, f"{side}.mid_block.attentions.0", dtype),
            _vae_resnet_diffusers(sd, f"{side}.mid_block.resnets.1", dtype),
        ]

    encoder: Params = {
        "conv_in": _conv(sd, "encoder.conv_in", dtype),
        "down_blocks": [enc_block(i) for i in range(n_blocks)],
        "mid_blocks": mid("encoder"),
        "conv_norm_out": _norm(sd, "encoder.conv_norm_out", dtype),
        "conv_out": _conv(sd, "encoder.conv_out", dtype),
    }
    decoder: Params = {
        "conv_in": _conv(sd, "decoder.conv_in", dtype),
        # Flip: apply_vae_decoder iterates reversed(up_blocks).
        "up_blocks": [dec_block(i) for i in reversed(range(n_blocks))],
        "mid_blocks": mid("decoder"),
        "conv_norm_out": _norm(sd, "decoder.conv_norm_out", dtype),
        "conv_out": _conv(sd, "decoder.conv_out", dtype),
    }
    return {
        "encoder": encoder,
        "decoder": decoder,
        "quant_proj": _lin_or_1x1(sd, "quant_conv", dtype),
        "post_quant_proj": _lin_or_1x1(sd, "post_quant_conv", dtype),
    }


def load_autoencoder(
    key: str = AUX_REPO, dtype=jnp.float32
) -> Tuple[Params, "AutoencoderConfig"]:
    """Config-driven generic SD autoencoder loader (reference
    model_io.py:826-855 ``load_autoencoder``).

    Reads the HF-diffusers ``vae/config.json`` + weights under ``key`` and
    builds the generic models/vae autoencoder. The reference function is dead
    code against its own registry (its ``_MODELS`` carries no "vae"/
    "vae_config" entries, so it KeyErrors for every key) but it IS exported
    public API; here the registry rows exist (AUX_FILES) and the loader
    works. The reference forces ``latent_channels = 16`` before building the
    config (model_io.py:836) — preserved.
    """
    from .config import AutoencoderConfig

    with open(_resolve(key, AUX_FILES["vae_config"], None)) as f:
        cfg = json.load(f)
    cfg["latent_channels"] = 16
    config = AutoencoderConfig(
        in_channels=cfg["in_channels"],
        out_channels=cfg["out_channels"],
        latent_channels_out=2 * cfg["latent_channels"],
        latent_channels_in=cfg["latent_channels"],
        block_out_channels=tuple(cfg["block_out_channels"]),
        layers_per_block=cfg["layers_per_block"],
        norm_num_groups=cfg["norm_num_groups"],
        scaling_factor=cfg.get("scaling_factor", 0.18215),
    )
    sd = load_safetensors(_resolve(key, AUX_FILES["vae"], None))
    return jax.device_put(
        autoencoder_params_from_diffusers_ckpt(sd, config, dtype)
    ), config


# ---------------------------------------------------------------------------
# CLIP mapper (HF transformers CLIPTextModel namespace)
# ---------------------------------------------------------------------------


def clip_params_from_hf_ckpt(
    sd: Dict[str, np.ndarray], config: CLIPTextModelConfig, dtype=jnp.float32
) -> Params:
    """HF ``text_model.*`` layout -> pytree (reference model_io.py:567-603)."""
    sd = {
        (k[len("text_model.") :] if k.startswith("text_model.") else k): v
        for k, v in sd.items()
    }
    p: Params = {
        "token_embedding": _as(dtype, sd["embeddings.token_embedding.weight"]),
        "position_embedding": _as(dtype, sd["embeddings.position_embedding.weight"]),
        "final_layer_norm": _norm(sd, "final_layer_norm", dtype),
    }

    def layer(i: int) -> Params:
        pre = f"encoder.layers.{i}"
        return {
            "ln1": _norm(sd, pre + ".layer_norm1", dtype),
            "ln2": _norm(sd, pre + ".layer_norm2", dtype),
            "query_proj": _lin(sd, pre + ".self_attn.q_proj", dtype),
            "key_proj": _lin(sd, pre + ".self_attn.k_proj", dtype),
            "value_proj": _lin(sd, pre + ".self_attn.v_proj", dtype),
            "out_proj": _lin(sd, pre + ".self_attn.out_proj", dtype),
            "linear1": _lin(sd, pre + ".mlp.fc1", dtype),
            "linear2": _lin(sd, pre + ".mlp.fc2", dtype),
        }

    # Stacked for the lax.scan layer loop (models/clip.py).
    p["layers"] = _stack([layer(i) for i in range(config.num_layers)])
    if "text_projection.weight" in sd and config.projection_dim is not None:
        p["text_projection"] = _lin(sd, "text_projection", dtype, bias=False)
    return p


def clip_config_from_hf_json(path: Union[str, Path]) -> CLIPTextModelConfig:
    """Build a CLIP config from an HF config.json (reference model_io.py:793-820)."""
    with open(path) as f:
        cfg = json.load(f)
    return CLIPTextModelConfig(
        num_layers=cfg["num_hidden_layers"],
        model_dims=cfg["hidden_size"],
        num_heads=cfg["num_attention_heads"],
        max_length=cfg["max_position_embeddings"],
        vocab_size=cfg["vocab_size"],
        projection_dim=cfg.get("projection_dim"),
        hidden_act=cfg.get("hidden_act", "quick_gelu"),
    )


# ---------------------------------------------------------------------------
# T5 mapper (HF t5 encoder namespace)
# ---------------------------------------------------------------------------


def t5_params_from_ckpt(
    sd: Dict[str, np.ndarray], config: T5Config = T5_XXL, dtype=jnp.bfloat16
) -> Params:
    """HF ``encoder.block.N`` layout -> stacked-layer pytree
    (reference model_io.py:567-612 t5_encoder_state_dict_adjustments)."""

    def layer(i: int) -> Params:
        pre = f"encoder.block.{i}"
        return {
            "ln1": {"weight": _as(dtype, sd[pre + ".layer.0.layer_norm.weight"])},
            "ln2": {"weight": _as(dtype, sd[pre + ".layer.1.layer_norm.weight"])},
            "query_proj": _lin(sd, pre + ".layer.0.SelfAttention.q", dtype),
            "key_proj": _lin(sd, pre + ".layer.0.SelfAttention.k", dtype),
            "value_proj": _lin(sd, pre + ".layer.0.SelfAttention.v", dtype),
            "out_proj": _lin(sd, pre + ".layer.0.SelfAttention.o", dtype),
            "wi_0": _lin(sd, pre + ".layer.1.DenseReluDense.wi_0", dtype),
            "wi_1": _lin(sd, pre + ".layer.1.DenseReluDense.wi_1", dtype),
            "wo": _lin(sd, pre + ".layer.1.DenseReluDense.wo", dtype),
        }

    wte_key = (
        "encoder.embed_tokens.weight"
        if "encoder.embed_tokens.weight" in sd
        else "shared.weight"
    )
    return {
        "wte": _as(dtype, sd[wte_key]),
        "relative_attention_bias": _as(
            dtype, sd["encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight"]
        ),
        "layers": _stack([layer(i) for i in range(config.num_layers)]),
        "final_ln": {"weight": _as(dtype, sd["encoder.final_layer_norm.weight"])},
    }


# ---------------------------------------------------------------------------
# High-level loaders (HF hub or local checkpoint roots)
# ---------------------------------------------------------------------------


def _resolve(model_version: str, filename: str, local_ckpt: Optional[str]) -> str:
    """Local override first (reference LOCAl_SD3_CKPT, model_io.py:127,723),
    then a local checkpoint root dir via DIFFUSIONKIT_TPU_CKPT_DIR, then hub."""
    if local_ckpt:
        return local_ckpt
    root = os.environ.get("DIFFUSIONKIT_TPU_CKPT_DIR")
    if root:
        cand = Path(root) / model_version / filename
        if cand.exists():
            return str(cand)
    return hub_download(model_version, filename)


def _resolve_aux(filename: str) -> str:
    root = os.environ.get("DIFFUSIONKIT_TPU_CKPT_DIR")
    if root:
        cand = Path(root) / AUX_REPO / filename
        if cand.exists():
            return str(cand)
    return hub_download(AUX_REPO, filename)


def detect_mmdit_namespace(sd: Dict[str, np.ndarray]) -> str:
    """Which key namespace a checkpoint uses: 'mlx' (pre-adjusted MLX module
    tree — how the ``*-4bit-quantized`` models ship), 'flux_raw' (BFL
    double_blocks/single_blocks), or 'sd3_raw' (sgm joint_blocks)."""
    for k in sd:
        if "multimodal_transformer_blocks" in k or "unified_transformer_blocks" in k:
            return "mlx"
        if k.startswith(("double_blocks", "single_blocks")):
            return "flux_raw"
    return "sd3_raw"


def load_mmdit(
    model_version: str,
    dtype=None,
    local_ckpt: Optional[str] = None,
    to_device: bool = True,
    shardings=None,
) -> Tuple[Params, MMDiTConfig]:
    """Load MMDiT weights for any registry model (reference model_io.py:708-787).

    The two ``*-4bit-quantized`` registry models ship in the MLX module
    namespace with MLX ``nn.quantize`` storage; their nibbles are repacked
    bit-for-bit into the int4 execution format of ops/quantized.py — no
    float round trip (mlx_q4_to_exec). ``shardings``: optional NamedSharding
    pytree (parallel.mmdit_shardings) applied at device_put.
    """
    config = MMDIT_CONFIG[model_version]
    path = _resolve(model_version, MMDIT_CKPT[model_version], local_ckpt)
    sd = load_safetensors(path)
    ns = detect_mmdit_namespace(sd)
    if ns == "mlx":
        # Pre-adjusted MLX module namespace — the format the 4-bit registry
        # checkpoints ship in; quantized weights repack losslessly.
        params = mmdit_params_from_mlx_ckpt(sd, config, dtype)
    elif ns == "flux_raw":
        params = mmdit_params_from_flux_ckpt(sd, config, dtype)
    else:
        params = mmdit_params_from_sd3_ckpt(sd, config, dtype)
    del sd
    if to_device:
        params = jax.device_put(params, shardings)
    from .utils import tree_num_params

    logger.info(
        "Loaded MMDiT %s (%.2fB params) from %s",
        model_version, tree_num_params(params) / 1e9, path,
    )
    return params, config


def load_vae_decoder(
    model_version: str, dtype=jnp.float32, local_ckpt: Optional[str] = None
) -> Params:
    path = _resolve(model_version, VAE_CKPT[model_version], local_ckpt)
    sd = load_safetensors(path)
    return jax.device_put(
        vae_decoder_params_from_ckpt(
            sd, dtype, prefix=VAE_PREFIX[model_version] + "decoder."
        )
    )


def load_vae_encoder(
    model_version: str, dtype=jnp.float32, local_ckpt: Optional[str] = None
) -> Params:
    path = _resolve(model_version, VAE_CKPT[model_version], local_ckpt)
    sd = load_safetensors(path)
    return jax.device_put(
        vae_encoder_params_from_ckpt(
            sd, dtype, prefix=VAE_PREFIX[model_version] + "encoder."
        )
    )


def load_text_encoder(which: str, dtype=jnp.float32) -> Tuple[Params, CLIPTextModelConfig]:
    """which: 'clip_l' or 'clip_g' (reference model_io.py:790-855)."""
    config = clip_config_from_hf_json(_resolve_aux(AUX_FILES[which + "_config"]))
    sd = load_safetensors(_resolve_aux(AUX_FILES[which]))
    return jax.device_put(clip_params_from_hf_ckpt(sd, config, dtype)), config


def load_t5_encoder(dtype=jnp.bfloat16, to_device: bool = True) -> Params:
    """``to_device=False`` returns the host tree — required when the caller
    quantizes first (a 9.4 GB bf16 T5 next to a resident 12B MMDiT would
    overflow a 16 GB chip before the int8 conversion runs)."""
    sd = load_safetensors(_resolve_aux(AUX_FILES["t5"]))
    params = t5_params_from_ckpt(sd, T5_XXL, dtype)
    return jax.device_put(params) if to_device else params


def load_tokenizer(which: str, pad_with_eos: bool = False):
    """which: 'l' or 'g' (reference model_io.py:941-959)."""
    from .tokenizer import CLIPTokenizer

    return CLIPTokenizer.from_files(
        _resolve_aux(AUX_FILES[f"tokenizer_{which}_vocab"]),
        _resolve_aux(AUX_FILES[f"tokenizer_{which}_merges"]),
        pad_with_eos=pad_with_eos,
    )


def load_t5_tokenizer(max_length: int = 256):
    from .tokenizer import T5TokenizerWrapper

    root = os.environ.get("DIFFUSIONKIT_TPU_CKPT_DIR")
    path = "google/t5-v1_1-xxl"
    if root and (Path(root) / "google/t5-v1_1-xxl").exists():
        path = str(Path(root) / "google/t5-v1_1-xxl")
    return T5TokenizerWrapper(path, max_length=max_length)


# ---------------------------------------------------------------------------
# Native-layout checkpoint cache (save/load of mapped pytrees)
# ---------------------------------------------------------------------------


def _flatten_params(tree: Params, prefix: str = "") -> Dict[str, np.ndarray]:
    """Nested dict/list pytree -> flat {'a/b/0/c': array}; None leaves skipped."""
    out: Dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        items = tree.items()
    elif isinstance(tree, (list, tuple)):
        items = ((str(i), v) for i, v in enumerate(tree))
    else:
        raise TypeError(type(tree))
    for k, v in items:
        key = f"{prefix}{k}"
        if v is None:
            continue
        if isinstance(v, (dict, list, tuple)):
            out.update(_flatten_params(v, key + "/"))
        else:
            out[key] = np.asarray(jax.device_get(v))
    return out


def _unflatten_params(flat: Dict[str, np.ndarray]) -> Params:
    root: Dict[str, Any] = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v

    def listify(node):
        if not isinstance(node, dict):
            return node
        node = {k: listify(v) for k, v in node.items()}
        if node and all(k.isdigit() for k in node):
            return [node[str(i)] for i in range(len(node))]
        return node

    return listify(root)


# Execution-layout revision of trees written by save_params. Bump whenever a
# load-time weight transformation changes (a stale cache would silently
# produce wrong images). 2 = rotate-half rope permutation folded into the
# q/k projection columns (_permute_qk_for_rope).
LAYOUT_VERSION = 2


def quant_cache_path(tag: str, src_path: Union[str, Path]) -> Optional[Path]:
    """Cache file for a quantized execution tree derived from ``src_path``.

    Quantize-at-load of a 12B model costs minutes (ALS grid search +
    repacking); the result is deterministic given (source file, mode,
    algorithm revision), so serving cold-starts reload it from disk instead.
    The key embeds the source's size+mtime (mirror regeneration invalidates)
    and the callers embed mode/group/algorithm revision in ``tag``.
    DIFFUSIONKIT_TPU_QUANT_CACHE=0 disables; DIFFUSIONKIT_TPU_CACHE_DIR
    relocates (default ~/.cache/diffusionkit_tpu/params).
    """
    import re

    if os.environ.get("DIFFUSIONKIT_TPU_QUANT_CACHE", "1") == "0":
        return None
    try:
        st = os.stat(src_path)
    except OSError:
        return None
    d = Path(
        os.environ.get(
            "DIFFUSIONKIT_TPU_CACHE_DIR",
            Path.home() / ".cache" / "diffusionkit_tpu",
        )
    ) / "params"
    d.mkdir(parents=True, exist_ok=True)
    key = f"{tag}_{st.st_size}_{int(st.st_mtime)}"
    return d / (re.sub(r"[^A-Za-z0-9._-]", "-", key) + ".safetensors")


def save_params_atomic(params: Params, path: Path) -> None:
    """save_params via temp file + rename: a crash/disk-full mid-write must
    never leave a truncated cache that poisons every later startup."""
    tmp = path.with_suffix(".tmp")
    try:
        save_params(params, tmp)
        os.replace(tmp, path)
    finally:
        if tmp.exists():
            tmp.unlink(missing_ok=True)


def load_params_cache(path: Path, to_device: bool = False):
    """Guarded cache read: a corrupt or stale-layout file is deleted and
    None returned so the caller regenerates instead of crashing forever."""
    try:
        return load_params(path, to_device=to_device)
    except Exception as e:
        logger.warning("quant cache %s unreadable (%s); regenerating", path, e)
        try:
            path.unlink(missing_ok=True)
        except OSError:
            pass
        return None


def save_params(params: Params, path: Union[str, Path]) -> None:
    """Save a mapped parameter pytree in THIS framework's layout.

    A capability the reference lacks (SURVEY.md §5 "no saving"): warm-start
    cache that skips the raw-checkpoint key mapping/splitting on reload —
    including quantized (q4/scales/zeros) trees. Written as standard
    safetensors with '/'-joined pytree paths as keys, stamped with
    LAYOUT_VERSION so stale caches fail loudly instead of decoding wrong.
    """
    from safetensors.numpy import save_file

    flat = _flatten_params(params)
    flat["__layout_version__"] = np.asarray([LAYOUT_VERSION], np.int32)
    # ml_dtypes (bf16) arrays pass through safetensors natively.
    save_file(flat, str(path))
    logger.info("Saved %d tensors to %s", len(flat), path)


def load_params(path: Union[str, Path], to_device: bool = True, shardings=None) -> Params:
    """Load a pytree saved by save_params (zero-copy mmap read)."""
    flat = load_safetensors(path)
    ver = flat.pop("__layout_version__", None)
    ver = int(np.asarray(ver)[0]) if ver is not None else 1
    if ver != LAYOUT_VERSION:
        raise ValueError(
            f"{path} was saved with execution-layout v{ver}; this build "
            f"expects v{LAYOUT_VERSION} (the rope q/k column permutation "
            "changed). Regenerate it with save_params from the raw "
            "checkpoint."
        )
    params = _unflatten_params(flat)
    if to_device:
        params = jax.device_put(params, shardings)
    return params
