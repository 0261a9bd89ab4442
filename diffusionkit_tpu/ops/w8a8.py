"""w8a8 quantized linear: int8 weights x dynamic int8 activations on the MXU.

Beyond-reference capability (the reference's only quantization is 4-bit
weight-only via MLX ``nn.quantize``, reference model_io.py:728-734): TPU v5e+
executes int8 x int8 -> int32 matmuls at TWICE the bf16 MXU rate
(v5e: 394 vs 197 TOP/s), so for compute-bound denoise steps w8a8 raises the
per-chip speed-of-light by ~2x rather than only shrinking weight bytes.

Scheme (standard per-channel / per-token dynamic):
  weights     w[k, n] ~= W8[k, n] * wscale[n]          (symmetric, per out-ch)
  activations x[m, k] ~= X8[m, k] * xscale[m]          (symmetric, per row,
                                                        computed in-jit)
  y = (X8 @ W8) * xscale[m] * wscale[n] + bias         (int32 accumulation)

The int32 accumulator is exact: K <= 16384 gives |sum| <= K*127^2 < 2^31.
Activation quantisation is a fused XLA elementwise pass (abs-max + scale +
round); the dot itself is a plain ``jnp.dot`` on int8 operands, which XLA
lowers to the native int8 MXU path — no Pallas needed because there is no
custom dataflow, only a dtype choice.

Param schema (dispatched by ops.common.linear via the "w8" key):
  {"w8": int8 (in, out), "wscale": f32 (out,), "bias": (out,)|None}
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


class ActQuant(NamedTuple):
    """A pre-quantized activation, shared across sibling quantized linears.

    The MMDiT q/k/v projections (and FLUX's parallel-MLP fc1) all consume the
    SAME modulated-layernorm output; quantizing it once and fanning the
    (int8, scale) pair out removes 3 of the 4 per-input dynamic-quantization
    passes — the dominant elementwise cost of the w4a8/w8a8 step (round-2
    profile: ~145 ms of a ~452 ms FLUX step). ``orig`` keeps the float tensor
    for non-act-quantized consumers and CPU fallback paths (XLA dead-code
    eliminates whichever representation a consumer does not touch); fused
    producer kernels (ops/fused_quant.py) that never materialise a float
    output set ``orig=None`` and record ``out_dtype`` instead.

    Lives only INSIDE jit traces (created and consumed within one model
    function) — it never crosses a jit boundary or enters a parameter tree,
    so the ``out_dtype`` entry being a non-array is safe.
    """

    x8: jnp.ndarray      # int8, same shape as orig
    xscale: jnp.ndarray  # f32, orig.shape[:-1] + (1,)
    orig: Optional[jnp.ndarray]
    out_dtype: Any = None  # dtype consumers cast results to when orig is None

    @property
    def dtype(self):
        return self.orig.dtype if self.orig is not None else self.out_dtype

    @property
    def shape(self):
        return self.x8.shape

    def to_float(self) -> jnp.ndarray:
        """Float view for non-quantized consumers: the original tensor when
        it exists, else the dequantized int8 values (the value every
        quantized consumer sees anyway)."""
        if self.orig is not None:
            return self.orig
        return (self.x8.astype(jnp.float32) * self.xscale).astype(self.out_dtype)


def quantize_shared(x) -> "ActQuant":
    """Quantize an activation once for reuse by several quantized linears.

    Idempotent: passing an ActQuant through returns it unchanged, so nested
    helpers (_qkv inside a block body) can call this unconditionally.
    """
    if isinstance(x, ActQuant):
        return x
    x8, xscale = quantize_activations(x)
    return ActQuant(x8, xscale, x)


def needs_act_quant(p) -> bool:
    """True when a linear param dict quantizes its activations dynamically
    (w8a8, or int4 carrying the w4a8 per-channel wscale)."""
    return isinstance(p, dict) and (
        "w8" in p or ("q4" in p and "wscale" in p)
    )


# ---------------------------------------------------------------------------
# Host-side conversion (loaders / quantize_tree)
# ---------------------------------------------------------------------------


def w8a8_from_kernel_host(w: np.ndarray) -> Params:
    """Per-channel symmetric int8 quantisation of an (in, out) float kernel."""
    w = np.asarray(w, np.float32)
    amax = np.maximum(np.abs(w).max(axis=0), 1e-8)  # (out,)
    wscale = (amax / 127.0).astype(np.float32)
    w8 = np.clip(np.round(w / wscale[None, :]), -127, 127).astype(np.int8)
    return {"w8": w8, "wscale": wscale}


def w8a8_from_quantized_host(p: Params) -> Params:
    """Re-express a group-affine weight-only param dict (q4/q8, see
    ops/quantized.py) as w8a8 execution format.

    Two-level quantisation: the fine int4/int8 group grid is re-sampled onto a
    per-channel int8 grid. The int8 grid's resolution (255 levels over the
    channel range) is finer than the int4 grid's (16 levels over each group
    range) for every group whose range is >~ 1/16 of the channel range, so
    the added error is small relative to the int4 error already present.
    """
    if "q4" in p:
        packed = np.asarray(jax.device_get(p["q4"]))  # (in/8, out) uint32
        in8, out_dim = packed.shape
        q = np.empty((in8, 8, out_dim), np.float32)
        for j in range(8):
            q[:, j, :] = ((packed >> np.uint32(4 * j)) & np.uint32(0xF)).astype(np.float32)
        q = q.reshape(in8 * 8, out_dim)
    else:
        q = np.asarray(jax.device_get(p["q8"]), np.float32)
    scales = np.asarray(jax.device_get(p["scales"]), np.float32)
    zeros = np.asarray(jax.device_get(p["zeros"]), np.float32)
    g = q.shape[0] // scales.shape[0]
    w = q * np.repeat(scales, g, axis=0) + np.repeat(zeros, g, axis=0)
    out = w8a8_from_kernel_host(w)
    out["bias"] = p.get("bias")
    return out


# ---------------------------------------------------------------------------
# In-jit application
# ---------------------------------------------------------------------------


def quantize_activations(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-row (per-token) symmetric int8 quantisation, fp32 statistics.

    Returns (X8 int8, xscale f32 with a trailing singleton axis). On TPU the
    absmax+round pair runs as one fused Pallas pass (ops/fused_quant.py —
    one HBM read instead of two); the XLA form below is the reference math
    and the CPU/fallback path.
    """
    from .fused_quant import fused_eligible
    from .fused_quant import quantize as fused_quantize

    if fused_eligible(x.shape[-1]):
        aq = fused_quantize(x)
        return aq.x8, aq.xscale
    x32 = x.astype(jnp.float32)
    amax = jnp.maximum(jnp.max(jnp.abs(x32), axis=-1, keepdims=True), 1e-8)
    xscale = amax / 127.0
    x8 = jnp.clip(jnp.round(x32 / xscale), -127, 127).astype(jnp.int8)
    return x8, xscale


def w8a8_linear(p: Params, x, act: str = None) -> jnp.ndarray:
    """y = act(x @ w (+ bias)) with both operands quantised to int8.

    int32 accumulation on the MXU's int8 path; the combined
    ``xscale * wscale`` rescale, bias-add and optional GELU run in fp32 and
    fuse into the dot's consumer. ``x`` may be a pre-quantized ActQuant
    (shared across sibling projections; see quantize_shared).
    """
    if isinstance(x, ActQuant):
        x8, xscale, out_dtype = x.x8, x.xscale, x.dtype
    else:
        x8, xscale = quantize_activations(x)
        out_dtype = x.dtype
    acc = jax.lax.dot_general(
        x8, p["w8"], (((x8.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * xscale * p["wscale"].astype(jnp.float32)
    if p.get("bias") is not None:
        y = y + p["bias"].astype(jnp.float32)
    if act == "gelu":
        y = jax.nn.gelu(y, approximate=False)
    return y.astype(out_dtype)


def is_w8a8(p: Params) -> bool:
    return isinstance(p, dict) and "w8" in p


def random_w8a8_linear(
    key: "jax.Array", d_in: int, d_out: int, bias: bool = True,
    scale: float = 0.02, dtype=jnp.bfloat16,
) -> Params:
    """Random weights generated DIRECTLY in w8a8 execution format (for
    benchmarks of models too large to materialize in float first)."""
    p: Params = {
        "w8": jax.random.randint(key, (d_in, d_out), -127, 128, dtype=jnp.int32).astype(jnp.int8),
        "wscale": jnp.full((d_out,), scale / 127.0, jnp.float32),
        "bias": jnp.zeros((d_out,), dtype) if bias else None,
    }
    return p


# ---------------------------------------------------------------------------
# Pytree-level conversion
# ---------------------------------------------------------------------------


def w8a8_tree(params: Params, min_size: int = 1 << 16,
              min_dim: int = 0) -> Params:
    """Convert every eligible linear kernel (or already-quantized dict) in a
    parameter tree to w8a8 execution format. Host numpy end to end (the
    caller device_puts once); stacked (L, in, out) kernels convert per layer
    and restack, preserving the scan/sharding structure.

    ``min_dim`` (see ops/quantized.MIN_DIM) defaults to 0 here: int8 noise on
    the narrow adapters is ~20 dB milder than int4's, and the shipping w8a8
    gate (35 dB) does not need the exclusion.
    """
    from .quantized import is_quantized

    if isinstance(params, dict):
        if "kernel" in params and params["kernel"] is not None:
            k = np.asarray(jax.device_get(params["kernel"]))
            if k.ndim == 2 and k.size >= min_size and min(k.shape) >= min_dim:
                out = w8a8_from_kernel_host(k)
                out["bias"] = params.get("bias")
                return out
            if k.ndim == 3 and k[0].size >= min_size and min(k.shape[1:]) >= min_dim:
                per = [w8a8_from_kernel_host(k[i]) for i in range(k.shape[0])]
                stacked: Params = {
                    key: np.stack([q[key] for q in per]) for key in per[0]
                }
                stacked["bias"] = params.get("bias")
                return stacked
            return params
        if is_quantized(params):
            key = "q4" if "q4" in params else "q8"
            arr = params[key]
            if arr.ndim == 2:
                return w8a8_from_quantized_host(params)
            per = [
                w8a8_from_quantized_host(
                    {k: v[i] for k, v in params.items() if v is not None}
                )
                for i in range(arr.shape[0])
            ]
            stacked = {k: np.stack([q[k] for q in per]) for k in ("w8", "wscale")}
            stacked["bias"] = params.get("bias")
            return stacked
        return {k: w8a8_tree(v, min_size, min_dim) for k, v in params.items()}
    if isinstance(params, list):
        return [w8a8_tree(v, min_size, min_dim) for v in params]
    return params
