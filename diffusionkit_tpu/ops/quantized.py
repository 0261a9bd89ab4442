"""Weight-only quantized linear layers (int4 / int8, group-affine).

TPU-native equivalent of MLX's ``nn.quantize`` load path used for the two
``*-4bit-quantized`` registry models (reference model_io.py:728-734,772-776)
and the ``quantize_mmdit`` pipeline flag (reference mlx/__init__.py:605-625).

Layout: the contraction (input) axis is quantised in groups of
``group_size``; int4 values pack 8-per-uint32 along the input axis so weights
stay packed in HBM (a 12B FLUX MMDiT is 6 GB int4 vs 24 GB bf16 — the
difference between fitting on one v5e chip or not). Dequantisation
``w = scale * q + bias`` happens inside jit per matmul; XLA fuses the unpack
+ affine into the dot's operand producer so no fp copy persists in HBM.

Param schema (drop-in for ops.common.linear via the "q4"/"q8" keys):
  int4: {"q4": uint32 (in/8, out), "scales": (in/g, out), "zeros": (in/g, out),
         "bias": (out,)|None}
  int8: {"q8": uint8 (in, out), "scales": (in/g, out), "zeros": (in/g, out),
         "bias": (out,)|None}
The group size is inferred from shapes (in / n_groups) so the param dict has
only array leaves — required for lax.scan over stacked quantized blocks.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]

# Revision of the quantize-at-load algorithm, embedded in disk-cache keys
# (model_io.quant_cache_path) so cached execution trees regenerate when the
# math changes. 2 = ALS-refined f16-stored grid (round 4); 3 = GPTQ
# Hessian-compensated 4-bit default (ops/gptq.py, round 5); 4 = MIN_DIM
# structural eligibility (narrow I/O adapter mats stay float, round 5).
QUANT_VERSION = 4

# Kernels with any dimension below this stay in the float dtype. The narrow
# I/O adapters (x_embedder: patch²·C=64 inputs; final_layer: 64 outputs) have
# pathological group statistics — 2 int4 groups per column at g=32 — and sit
# on the unprotected ends of the network, so they dominate pipeline error
# while holding ~0.03% of the bytes: floating both lifted the SD3 tiny-model
# single-step SNR from 21.4 dB to 65.5 dB at identical int4 cost everywhere
# else. MLX ``nn.quantize`` (reference model_io.py:728-734) applies a
# divisibility predicate only; this rule is the quality-driven deviation.
MIN_DIM = 256


# ---------------------------------------------------------------------------
# Host-side packing / quantisation (numpy; used by loaders)
# ---------------------------------------------------------------------------


def pack_int4_host(q: np.ndarray) -> np.ndarray:
    """(in, out) uint8 nibbles -> (in/8, out) uint32, value j of each word at
    bits [4j, 4j+4) (the MLX within-word order, reference nn.quantize)."""
    in_dim, out_dim = q.shape
    assert in_dim % 8 == 0, in_dim
    q = q.astype(np.uint32).reshape(in_dim // 8, 8, out_dim)
    packed = np.zeros((in_dim // 8, out_dim), dtype=np.uint32)
    for j in range(8):
        packed |= q[:, j, :] << np.uint32(4 * j)
    return packed


def _als_refine_host(
    g: np.ndarray, iters: int = 8, f16_grid: bool = True
) -> tuple:
    """Alternating-least-squares refinement of the int4 affine grid (numpy
    reference for native dk_quantize_int4_als; same algorithm, float-level —
    not bit-level — agreement because accumulation orders differ).

    g: (groups, group_size, out) f32. From the min/max grid, repeat: quantize
    onto the current grid, track the best (scale, zero) by group MSE, refit
    (scale, zero) to the codes by per-column linear regression. Data-free;
    on Gaussian weights recovers ~0.7 dB of weight SNR over min/max alone
    (measured: g=64 20.95 -> 21.58 dB, g=32 22.13 -> 22.82 dB; a clip-ratio
    candidate search on top was measured worthless once ALS runs and is
    deliberately absent). With ``f16_grid`` the winning grid is rounded to
    IEEE half (the storage dtype) before the final requantize — measured
    quality cost of the rounding itself: 0.0003 dB.
    """
    n = np.float32(g.shape[1])
    wmin = g.min(axis=1)
    wmax = g.max(axis=1)
    sw = g.sum(axis=1)
    s = np.maximum((wmax - wmin) / 15.0, 1e-8)
    z = wmin
    best_s, best_z = s.copy(), z.copy()
    best_e = np.full(s.shape, np.inf, np.float32)
    for it in range(iters + 1):
        q = np.clip(np.round((g - z[:, None, :]) / s[:, None, :]), 0, 15)
        e = ((s[:, None, :] * q + z[:, None, :] - g) ** 2).sum(axis=1)
        better = e < best_e
        best_s = np.where(better, s, best_s)
        best_z = np.where(better, z, best_z)
        best_e = np.where(better, e, best_e)
        if it == iters:
            break
        sq = q.sum(axis=1)
        sqq = (q * q).sum(axis=1)
        swq = (g * q).sum(axis=1)
        denom = n * sqq - sq * sq
        s_new = (n * swq - sq * sw) / np.where(denom > 1e-10, denom, 1.0)
        accept = (denom > 1e-10) & (s_new > 1e-8)
        s = np.where(accept, s_new, s).astype(np.float32)
        z = np.where(accept, (sw - s_new * sq) / n, z).astype(np.float32)
    if f16_grid:
        best_s = np.maximum(
            best_s.astype(np.float16).astype(np.float32), 6.1e-8
        )
        best_z = best_z.astype(np.float16).astype(np.float32)
    q = np.clip(
        np.round((g - best_z[:, None, :]) / best_s[:, None, :]), 0, 15
    ).astype(np.uint8)
    if f16_grid:
        best_s = best_s.astype(np.float16)
        best_z = best_z.astype(np.float16)
    return q, best_s, best_z


def quantize_kernel_host(
    w: np.ndarray, bits: int = 4, group_size: int = 64,
    refine: Optional[bool] = None, with_wscale: bool = False,
) -> Params:
    """Affine group quantisation of an (in, out) float kernel (host).

    Matches MLX's affine scheme: per (group, out-channel)
    ``w = scale * q + zero`` with q in [0, 2^bits - 1].

    int4 defaults to the REFINED grid (``refine=None`` -> True unless
    DIFFUSIONKIT_TPU_QUANT_REFINE=0): min/max init + 8 alternating-
    least-squares rounds per group with the winning (scale, zero) stored as
    float16 — see _als_refine_host. This is the activation-free half of the
    VERDICT round-3 quality push (Next #1): at group 32 it beats the round-3
    min/max g=64/f32 grid by ~1.9 dB weight SNR at identical bits/weight.
    ``refine=False`` reproduces the plain min/max grid (f32 scales) exactly
    — the MLX ``nn.quantize`` parity behaviour.

    Both int4 paths route through the multi-threaded native quantizer
    (native/dkio.cpp — minutes -> seconds on a 12B model) with the numpy
    implementations as reference and fallback. int8 stays min/max (its grid
    error is already -42 dB; refinement is not worth the load-time there).
    """
    import os

    in_dim, out_dim = w.shape
    assert in_dim % group_size == 0, (in_dim, group_size)
    if refine is None:
        refine = bits == 4 and os.environ.get(
            "DIFFUSIONKIT_TPU_QUANT_REFINE", "1"
        ) != "0"
    from .. import native

    if bits == 4 and refine:
        out = native.quantize_int4_als(
            np.ascontiguousarray(w, np.float32), group_size,
            want_wscale=with_wscale,
        )
        if out is None:
            g = w.reshape(in_dim // group_size, group_size, out_dim).astype(
                np.float32
            )
            q, scale, zero = _als_refine_host(g)
            out = {
                "q4": pack_int4_host(q.reshape(in_dim, out_dim)),
                "scales": scale, "zeros": zero,
            }
            if with_wscale:
                deq = (
                    q.astype(np.float32) * scale.astype(np.float32)[:, None, :]
                    + zero.astype(np.float32)[:, None, :]
                ).reshape(in_dim, out_dim)
                out["wscale"] = (
                    np.maximum(np.abs(deq).max(0), 1e-8) / 127.0
                ).astype(np.float32)
        return out
    if bits == 4:
        q = native.quantize_int4(np.ascontiguousarray(w, np.float32), group_size)
        if q is not None:
            return q
    g = w.reshape(in_dim // group_size, group_size, out_dim).astype(np.float32)
    wmin = g.min(axis=1)  # (groups, out)
    wmax = g.max(axis=1)
    qmax = float(2**bits - 1)
    scale = np.maximum((wmax - wmin) / qmax, 1e-8).astype(np.float32)
    zero = wmin.astype(np.float32)
    q = np.clip(
        np.round((g - zero[:, None, :]) / scale[:, None, :]), 0, qmax
    ).astype(np.uint8)
    q = q.reshape(in_dim, out_dim)
    # Host numpy outputs: callers (loaders / quantize_tree) device_put once
    # at the end so multi-GB float source trees never coexist with their
    # quantized copies in HBM.
    out: Params = {"scales": scale, "zeros": zero}
    if bits == 4:
        out["q4"] = pack_int4_host(q)
    elif bits == 8:
        out["q8"] = q  # uint8: affine range [0, 255]
    else:
        raise ValueError(f"bits must be 4 or 8, got {bits}")
    return out


def mlx_quantize_host(
    w: np.ndarray, bits: int = 4, group_size: int = 64
) -> Dict[str, np.ndarray]:
    """Quantize an (out, in) float matrix into MLX ``nn.quantize`` storage:
    ``weight`` (out, in/8) uint32 (8 nibbles/word along the input axis, value
    j at bits [4j, 4j+4)), ``scales``/``biases`` (out, in/g) with
    w = scale * q + bias. Used to fabricate checkpoints in the genuine MLX
    4-bit file format (tests + tools/make_ckpt_mirror.py)."""
    assert bits == 4, "only 4-bit MLX packing is fabricated"
    out_dim, in_dim = w.shape
    assert in_dim % group_size == 0 and in_dim % 8 == 0
    g = w.reshape(out_dim, in_dim // group_size, group_size).astype(np.float32)
    wmin = g.min(axis=2)
    wmax = g.max(axis=2)
    scale = np.maximum((wmax - wmin) / 15.0, 1e-8).astype(np.float32)
    q = np.clip(
        np.round((g - wmin[:, :, None]) / scale[:, :, None]), 0, 15
    ).astype(np.uint32).reshape(out_dim, in_dim)
    packed = np.zeros((out_dim, in_dim // 8), dtype=np.uint32)
    for j in range(8):
        packed |= q[:, j::8] << np.uint32(4 * j)
    return {"weight": packed, "scales": scale, "biases": wmin.astype(np.float32)}


# ---------------------------------------------------------------------------
# In-jit dequantisation + matmul
# ---------------------------------------------------------------------------


def _dequant(p: Params, dtype) -> jnp.ndarray:
    if "q4" in p:
        packed = p["q4"]  # (in/8, out) uint32
        shifts = (jnp.arange(8, dtype=jnp.uint32) * 4)[None, :, None]
        vals = (packed[:, None, :] >> shifts) & jnp.uint32(0xF)
        in8, _, out = vals.shape
        q = vals.reshape(in8 * 8, out)
    else:
        q = p["q8"].astype(jnp.int32)  # (in, out)
    q = q.astype(jnp.float32)
    g = q.shape[0] // p["scales"].shape[0]
    scales = jnp.repeat(p["scales"], g, axis=0).astype(jnp.float32)
    zeros = jnp.repeat(p["zeros"], g, axis=0).astype(jnp.float32)
    return (q * scales + zeros).astype(dtype)


def _quant_kernel_eligible(p: Params, x: jnp.ndarray) -> bool:
    import os

    if os.environ.get("DIFFUSIONKIT_TPU_INT4_KERNEL", "1") == "0":
        return False
    try:
        import jax

        if jax.default_backend() != "tpu":
            return False
    except Exception:  # pragma: no cover
        return False
    from .int4_matmul import _largest_divisor_block, pick_k_block

    k = x.shape[-1]
    n = (p["q4"] if "q4" in p else p["q8"]).shape[-1]
    group = k // p["scales"].shape[-2]
    return pick_k_block(k, group) > 0 and _largest_divisor_block(n, 128, 1024) >= 128


def quantized_linear(p: Params, x: jnp.ndarray, act: str = None) -> jnp.ndarray:
    """y = act(x @ dequant(W) (+ bias)), fp32 accumulation on the MXU.

    On TPU, int4 params with kernel-friendly shapes route through the Pallas
    fused dequant-matmul (ops/int4_matmul.py) so packed weights stream
    straight from HBM; otherwise dequantise in-jit and use a plain dot.
    ``act="gelu"`` (exact erf) fuses into the kernel epilogue where possible.
    ``x`` may be a pre-quantized ActQuant (w8a8.quantize_shared); only the
    w4a8 path consumes the int8 form, the others use the float original.
    """
    from .w8a8 import ActQuant

    preq = x if isinstance(x, ActQuant) else None
    if preq is not None:
        x = preq.to_float()
    if _quant_kernel_eligible(p, x):
        if "q4" in p:
            if "wscale" in p:
                # w4a8 mode (ops/w4a8_matmul.py): int8 MXU at 2x the bf16
                # rate; engaged by pipeline quantize_mmdit="w4a8", which adds
                # the per-channel wscale leaves.
                from .w4a8_matmul import w4a8_linear

                return w4a8_linear(p, preq if preq is not None else x, act=act)
            from .int4_matmul import int4_linear

            return int4_linear(p, x, act=act)
        from .int4_matmul import int8_linear

        return int8_linear(p, x, act=act)
    w = _dequant(p, x.dtype)
    y = jnp.dot(x, w, preferred_element_type=jnp.float32)
    if p.get("bias") is not None:
        y = y + p["bias"].astype(jnp.float32)
    if act == "gelu":
        y = jax.nn.gelu(y, approximate=False)
    return y.astype(x.dtype)


def is_quantized(p: Params) -> bool:
    return isinstance(p, dict) and ("q4" in p or "q8" in p)


# ---------------------------------------------------------------------------
# Pytree-level quantisation (reference FluxPipeline(quantize_mmdit=True))
# ---------------------------------------------------------------------------


def quantize_linear_params(
    p: Params, bits: int = 4, group_size: int = 64, min_size: int = 1 << 16,
    with_wscale: bool = False, min_dim: int = MIN_DIM,
) -> Params:
    """Quantise one {"kernel","bias"} linear param dict (host round trip)."""
    kernel = np.asarray(jax.device_get(p["kernel"]), dtype=np.float32)
    if (
        kernel.ndim != 2
        or kernel.size < min_size
        or min(kernel.shape) < min_dim
        or kernel.shape[0] % group_size
    ):
        return p
    out = quantize_kernel_host(kernel, bits, group_size,
                               with_wscale=with_wscale and bits == 4)
    out["bias"] = p.get("bias")
    return out


# Mixed-precision override map (the "-mixed" pipeline modes): int4 only on
# the bulk q/k/v/o/fc kernels; the quality-sensitive tensors keep more bits.
# AdaLN ("ada") outputs multiply/shift EVERY token feature, so its weight
# error is amplified model-wide — int8 halves nothing perf-wise (it is a
# per-step (B, H) GEMV) and removes that amplification. The final layer and
# the input/conditioning embedders are a negligible FLOP/byte fraction and
# stay in the float dtype. Beyond-parity: MLX ``nn.quantize`` (reference
# model_io.py:728-734) quantises every Linear uniformly.
MIXED_OVERRIDES: Dict[str, Any] = {
    "ada": 8,
    "final_layer": None,
    "x_embedder": None,
    "context_embedder": None,
    "y_embedder": None,
    "t_embedder": None,
    "guidance_embedder": None,
}


def quantize_tree(
    params: Params,
    bits: int = 4,
    group_size: int = 64,
    min_size: int = 1 << 16,
    overrides: Optional[Dict[str, Any]] = None,
    with_wscale: bool = False,
    min_dim: int = MIN_DIM,
) -> Params:
    """Recursively quantise every eligible linear kernel in a parameter tree.

    Stacked (scanned) block kernels (L, in, out) are quantised per layer and
    re-stacked so the scan body sees the same structure.

    ``overrides`` maps a pytree key name to a bit-width for that subtree
    (``None`` leaves the subtree in its float dtype) — see MIXED_OVERRIDES.
    Key names apply wherever they occur, so rules hold uniformly across
    stacked/scanned blocks and both the dual- and unified-stream families.
    """
    if isinstance(params, dict):
        if "kernel" in params and not is_quantized(params):
            k = params["kernel"]
            if k.ndim == 2:
                return quantize_linear_params(params, bits, group_size, min_size,
                                              with_wscale=with_wscale,
                                              min_dim=min_dim)
            if (
                k.ndim == 3
                and k.shape[1] % group_size == 0
                and k[0].size >= min_size
                and min(k.shape[1:]) >= min_dim
            ):
                per = [
                    quantize_kernel_host(
                        np.asarray(jax.device_get(k[i]), np.float32), bits,
                        group_size, with_wscale=with_wscale and bits == 4,
                    )
                    for i in range(k.shape[0])
                ]
                stacked: Params = {
                    key: np.stack([p[key] for p in per]) for key in per[0]
                }
                stacked["bias"] = params.get("bias")
                return stacked
            return params
        out = {}
        for k, v in params.items():
            b = bits
            if overrides is not None and k in overrides:
                if overrides[k] is None:
                    out[k] = v
                    continue
                b = overrides[k]
            out[k] = quantize_tree(v, b, group_size, min_size, overrides,
                                   with_wscale, min_dim)
        return out
    if isinstance(params, list):
        return [quantize_tree(v, bits, group_size, min_size, overrides,
                              with_wscale, min_dim) for v in params]
    return params


def random_quantized_linear(
    key: "jax.Array", d_in: int, d_out: int, bits: int = 4,
    group_size: int = 64, bias: bool = True, scale: float = 0.02,
    dtype=jnp.bfloat16,
) -> Params:
    """Random weights generated DIRECTLY in quantized form (for benchmarks
    and tests of models too large to materialize unquantized — e.g. a 12B
    FLUX MMDiT is 24 GB bf16 but 6 GB int4)."""
    kq, kb = jax.random.split(key)
    groups = d_in // group_size
    p: Params = {
        # Symmetric-ish affine around zero: q uniform, scale ~ N(0, s)/qmax.
        "scales": jnp.full((groups, d_out), 2 * scale / (2**bits - 1), jnp.float32),
        "zeros": jnp.full((groups, d_out), -scale, jnp.float32),
        "bias": jnp.zeros((d_out,), dtype) if bias else None,
    }
    if bits == 4:
        p["q4"] = jax.random.randint(
            kq, (d_in // 8, d_out), 0, jnp.iinfo(jnp.int32).max, dtype=jnp.int32
        ).astype(jnp.uint32)
    else:
        p["q8"] = jax.random.randint(kq, (d_in, d_out), 0, 256, dtype=jnp.int32).astype(jnp.uint8)
    return p
