"""Pallas TPU kernels fusing elementwise producers into int8 quantization.

Round-2 profiling showed the quantized FLUX step spends ~145 ms (32% of
device time) in XLA elementwise/quantize passes between the Pallas GEMMs:
each dynamic activation quantization is a standalone absmax+round pass, the
MLP GELU is a full read-modify-write of the 4H-wide hidden, and every
modulated LayerNorm materialises its float output only for the next pass to
re-read it. Each XLA pass pays HBM both ways; fusing producer → int8 in one
kernel reads the input once and writes 1 byte/element instead of ~7.

Two kernels (both row-parallel, full feature dim per block):

  gelu_quantize(y)                -> ActQuant   (exact-erf GELU -> int8)
  mod_ln_quantize(x, shift, sc)   -> ActQuant   (AdaLN LayerNorm -> int8)

They emit the (int8, per-row scale) pair the w8a8/w4a8 linears consume
directly (ops/w8a8.ActQuant with ``orig=None`` — no float output ever
reaches HBM). Quantization math matches ops/w8a8.quantize_activations
bit-for-bit given identical float inputs; the float math differs from the
XLA path only in erf (Abramowitz & Stegun 7.1.26 polynomial, |err| < 3e-7 —
Mosaic has no erf primitive) and reduction order, both far below the int8
grid resolution.

Role mirrored from the reference: ``mx.fast.layer_norm``'s fused
scale/shift form (reference mmdit.py:849,958-972) — extended to also emit
the quantized operand the reference (float-only) does not need.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .w8a8 import ActQuant

# Per-block VMEM budget for the f32 working set (input + intermediate +
# outputs, double-buffered by Mosaic). Conservative vs the v5e 16 MB/core
# cap; scaled per chip generation (ops/chip.py).
_VMEM_BUDGET_V5E = 6 << 20


def _vmem_budget() -> int:
    from .chip import scale_budget

    return scale_budget(_VMEM_BUDGET_V5E)


def _erf(x: jnp.ndarray) -> jnp.ndarray:
    """Abramowitz & Stegun 7.1.26 rational approximation, |err| <= 1.5e-7.

    Mosaic (Pallas TPU) has no erf primitive; this polynomial is VPU-only
    (one exp, a handful of FMAs). f32 in/out.
    """
    a1, a2, a3, a4, a5 = (
        0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429,
    )
    p = 0.3275911
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_erf(x: jnp.ndarray) -> jnp.ndarray:
    """Exact-erf GELU: x * 0.5 * (1 + erf(x / sqrt(2)))."""
    return x * 0.5 * (1.0 + _erf(x * 0.7071067811865476))


def _gelu_tanh(x: jnp.ndarray) -> jnp.ndarray:
    """tanh-form GELU (the tanh-based erf approximation, |err| < ~3e-4
    absolute). In THIS kernel the output is immediately quantized to int8 —
    grid step = rowmax/127, orders of magnitude above the approximation
    error — so the form is chosen by VPU cost: the A&S erf polynomial
    carries a reciprocal (t = 1/(1+p|x|)) that dominates the pass."""
    return 0.5 * x * (
        1.0 + jnp.tanh(0.7978845608028654 * (x + 0.044715 * x * x * x))
    )


def _gelu_form():
    return os.environ.get("DIFFUSIONKIT_TPU_GELU_FORM", "erf")


def _quantize_rows(g: jnp.ndarray):
    """Per-row symmetric int8 grid, identical to w8a8.quantize_activations."""
    amax = jnp.maximum(jnp.max(jnp.abs(g), axis=-1, keepdims=True), 1e-8)
    scale = amax / 127.0
    x8 = jnp.clip(jnp.round(g / scale), -127, 127).astype(jnp.int8)
    return x8, scale


def _gelu_quant_kernel(y_ref, x8_ref, s_ref, *, form="erf"):
    gelu = _gelu_tanh if form == "tanh" else _gelu_erf
    g = gelu(y_ref[...].astype(jnp.float32))
    x8, scale = _quantize_rows(g)
    x8_ref[...] = x8
    s_ref[...] = jnp.broadcast_to(scale, s_ref.shape)


def _quant_kernel(y_ref, x8_ref, s_ref):
    x8, scale = _quantize_rows(y_ref[...].astype(jnp.float32))
    x8_ref[...] = x8
    s_ref[...] = jnp.broadcast_to(scale, s_ref.shape)


def _ln_modulate(x_ref, sh_ref, sc_ref, eps):
    """Shared AdaLN-LN body for the quantizing and float kernels: fp32
    stats over the (bm, H) block, then (1+scale)*norm + shift."""
    x = x_ref[0].astype(jnp.float32)  # (bm, H)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    h = xc * jax.lax.rsqrt(var + eps)
    return h * (1.0 + sc_ref[0].astype(jnp.float32)) + sh_ref[0].astype(jnp.float32)


def _mod_ln_quant_kernel(x_ref, sh_ref, sc_ref, x8_ref, s_ref, *, eps):
    x8, scale = _quantize_rows(_ln_modulate(x_ref, sh_ref, sc_ref, eps))
    x8_ref[0] = x8
    s_ref[0] = jnp.broadcast_to(scale, s_ref.shape[1:])


# Largest (rows x feat) block that fits scoped VMEM with double buffering,
# swept on v5e: 64x12288 for the FLUX MLP width (128x12288 fits standalone
# but overflows scoped vmem by 0.4 MB inside the full step program);
# 256x3072 for hidden width, where power-of-two row counts measured ~30%
# faster than the old 32-multiple picks (224 rows lost to 128/256/512,
# which tie).
_ROWS_ELEM_BUDGET_V5E = 786_432


def _pick_rows(n_feat: int, n_rows: int) -> int:
    """Row-block size: power of two >= 32, VMEM-bounded per the swept
    element budget and capped near the actual row count (a 154-token text
    branch should not pad to a 256-row block).
    DIFFUSIONKIT_TPU_FUSED_ROWS overrides for sweeps."""
    env = os.environ.get("DIFFUSIONKIT_TPU_FUSED_ROWS")
    if env:
        return max(32, int(env) // 32 * 32)
    from .chip import scale_budget

    cap = max(32, scale_budget(_ROWS_ELEM_BUDGET_V5E) // n_feat)
    cap = min(cap, 512, max(32, -(-n_rows // 32) * 32))
    bm = 32
    while bm * 2 <= cap:
        bm *= 2
    return bm


def _rowwise_call(kernel, y2: jnp.ndarray, interpret: bool):
    """Run a (rows, feat) -> int8 + scale kernel over row blocks."""
    interpret = interpret or _mode() == "interpret"
    m, n = y2.shape
    bm = _pick_rows(n, m)
    pad = (-m) % bm
    if pad:
        y2 = jnp.pad(y2, ((0, pad), (0, 0)))
    mp = y2.shape[0]
    x8, s = pl.pallas_call(
        kernel,
        grid=(mp // bm,),
        in_specs=[pl.BlockSpec((bm, n), lambda i: (i, 0))],
        out_specs=(
            pl.BlockSpec((bm, n), lambda i: (i, 0)),
            pl.BlockSpec((bm, 128), lambda i: (i, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((mp, n), jnp.int8),
            jax.ShapeDtypeStruct((mp, 128), jnp.float32),
        ),
        interpret=interpret,
    )(y2)
    return x8[:m], s[:m, :1]


def _mode() -> str:
    """"1" (TPU only, default), "0" (off), "interpret" (on anywhere via the
    Pallas interpreter — CPU tests of the fused path)."""
    return os.environ.get("DIFFUSIONKIT_TPU_FUSED_QUANT", "1")


# Trace-time gate: under a mesh-partitioned jit these pallas_calls would sit
# on model-axis-sharded operands, and GSPMD cannot partition an opaque
# custom call (it replicates/gathers, breaking the asserted Megatron
# collective pattern). apply_mmdit enters this scope when a mesh is active;
# the XLA reference math (w8a8.quantize_activations fallback) partitions
# fine. Plain Python state is correct here: it only influences which ops are
# EMITTED during a (single-threaded) trace.
_DISABLED_SCOPES = 0


class disable_scope:
    """Context manager: force the XLA quantization path inside."""

    def __enter__(self):
        global _DISABLED_SCOPES
        _DISABLED_SCOPES += 1

    def __exit__(self, *exc):
        global _DISABLED_SCOPES
        _DISABLED_SCOPES -= 1
        return False


def _enabled() -> bool:
    if _DISABLED_SCOPES:
        return False
    mode = _mode()
    if mode == "0":
        return False
    if mode == "interpret":
        return True
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def fused_eligible(n_feat: int) -> bool:
    return n_feat % 128 == 0 and _enabled()


def gelu_quantize(y: jnp.ndarray, interpret: bool = False) -> ActQuant:
    """Exact-erf GELU fused with dynamic per-token int8 quantization.

    y: (..., N) float -> ActQuant for the following quantized linear (fc2).
    One HBM read of ``y`` and a 1-byte/element write replace the XLA chain
    gelu-write + absmax-read + round-read-write (~9 bytes/element).
    """
    lead, n = y.shape[:-1], y.shape[-1]
    x8, s = _rowwise_call(
        functools.partial(_gelu_quant_kernel, form=_gelu_form()),
        y.reshape(-1, n), interpret,
    )
    return ActQuant(
        x8.reshape(*lead, n), s.reshape(*lead, 1), None, out_dtype=y.dtype
    )


def quantize(y: jnp.ndarray, interpret: bool = False) -> ActQuant:
    """Standalone fused absmax+round pass (one read instead of two)."""
    lead, n = y.shape[:-1], y.shape[-1]
    x8, s = _rowwise_call(_quant_kernel, y.reshape(-1, n), interpret)
    return ActQuant(
        x8.reshape(*lead, n), s.reshape(*lead, 1), None, out_dtype=y.dtype
    )


def _mod_ln_kernel(x_ref, sh_ref, sc_ref, o_ref, *, eps):
    o_ref[0] = _ln_modulate(x_ref, sh_ref, sc_ref, eps).astype(o_ref.dtype)


def _mod_ln_call(kernel, x, shift, scale, out_specs, out_shape_fn, interpret):
    """Row-blocked (b, s, h) pallas_call scaffolding shared by mod_ln and
    mod_ln_quantize (same grid, padding and block specs; only the outputs
    differ)."""
    b, s, h = x.shape
    bm = _pick_rows(h, s)
    pad = (-s) % bm
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    sp = x.shape[1]
    out = pl.pallas_call(
        kernel,
        grid=(b, sp // bm),
        in_specs=[
            pl.BlockSpec((1, bm, h), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, 1, h), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, h), lambda i, j: (i, 0, 0)),
        ],
        out_specs=out_specs(bm, h),
        out_shape=out_shape_fn(b, sp, h),
        interpret=interpret,
    )(x, shift, scale)
    return out, s


def mod_ln(
    x: jnp.ndarray,
    shift: jnp.ndarray,
    scale: jnp.ndarray,
    eps: float = 1e-6,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused AdaLN LayerNorm for the FLOAT path: ``norm(x)*(1+scale)+shift``
    in ONE pass (the bf16 sibling of mod_ln_quantize; plays the role of the
    reference's ``mx.fast.layer_norm`` fused scale/shift form,
    mmdit.py:849,958-972).

    XLA splits each modulated-LN site into a stats reduction plus one apply
    pass per consumer group (SD3 512² profile: convert_reduce stats
    1.5 ms/step + applies 3.1 ms/step across the four sites — ~3x the HBM
    roofline of reading x once and writing the normed tensor once). One
    Pallas pass per site removes the re-reads. Same grid/row-picking as the
    quantizing variant.
    """
    interpret = interpret or _mode() == "interpret"
    out, s = _mod_ln_call(
        functools.partial(_mod_ln_kernel, eps=eps), x, shift, scale,
        out_specs=lambda bm, h: pl.BlockSpec((1, bm, h), lambda i, j: (i, j, 0)),
        out_shape_fn=lambda b, sp, h: jax.ShapeDtypeStruct((b, sp, h), x.dtype),
        interpret=interpret,
    )
    return out[:, :s]


def mod_ln_quantize(
    x: jnp.ndarray,
    shift: jnp.ndarray,
    scale: jnp.ndarray,
    eps: float = 1e-6,
    interpret: bool = False,
) -> ActQuant:
    """AdaLN LayerNorm (``norm(x) * (1+scale) + shift``) fused with int8
    quantization of its output.

    x: (B, S, H); shift/scale: (B, 1, H) — the per-sample modulation rows are
    picked via the batch grid axis. The float normed tensor never reaches
    HBM; consumers are the quantized q/k/v (+ FLUX fc1) projections.
    """
    interpret = interpret or _mode() == "interpret"
    (x8, sc), s = _mod_ln_call(
        functools.partial(_mod_ln_quant_kernel, eps=eps), x, shift, scale,
        out_specs=lambda bm, h: (
            pl.BlockSpec((1, bm, h), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, bm, 128), lambda i, j: (i, j, 0)),
        ),
        out_shape_fn=lambda b, sp, h: (
            jax.ShapeDtypeStruct((b, sp, h), jnp.int8),
            jax.ShapeDtypeStruct((b, sp, 128), jnp.float32),
        ),
        interpret=interpret,
    )
    return ActQuant(
        x8[:, :s], sc[:, :s, :1], None, out_dtype=x.dtype
    )
