"""Pallas TPU kernel: matmul with fused int4 dequantisation.

The XLA path for weight-only int4 (ops/quantized.py) materialises the
dequantised bf16 weight in HBM for every matmul — 4x the weight bytes in
traffic. This kernel keeps weights packed in HBM, streams packed tiles into
VMEM, unpacks + applies the group affine on the VPU, and feeds the MXU —
the "dequant-in-kernel" pattern (pallas_guide.md, Quantization Kernels),
playing the role MLX's fused quantized-matmul Metal kernel plays for the
reference's 4-bit models (reference model_io.py:728-734).

Layout contract (matches ops/quantized.py):
  q4     (K/8, N) uint32 — 8 nibbles per word along K, value j at bits [4j,4j+4)
  scales (K/g, N) f32, zeros (K/g, N) f32, group size g divides the K tile
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(
    x_ref,       # (bm, bk) input dtype
    q_ref,       # (bk/8, bn) uint32
    s_ref,       # (bk/g, bn) f32
    z_ref,       # (bk/g, bn) f32
    o_ref,       # (bm, bn) out dtype
    acc_ref,     # (bm, bn) f32 scratch
    *,
    group_size: int,
    out_dtype,
):
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    packed = q_ref[...]
    bk8, bn = packed.shape
    # Unpack 8 nibbles/word -> (bk/8, 8, bn) -> (bk, bn).
    shifts = (jax.lax.broadcasted_iota(jnp.uint32, (1, 8, 1), 1) * 4)
    vals = (packed[:, None, :] >> shifts) & jnp.uint32(0xF)
    # Mosaic has no uint32->float cast; values are 0..15 so int32 is safe.
    q = vals.reshape(bk8 * 8, bn).astype(jnp.int32).astype(jnp.float32)
    # Per-group affine: each scale row covers group_size consecutive K rows
    # (broadcast + reshape, the Mosaic-friendly interleaved repeat).
    gper = s_ref.shape[0]
    scales = jnp.broadcast_to(
        s_ref[...][:, None, :], (gper, group_size, bn)
    ).reshape(gper * group_size, bn)
    zeros = jnp.broadcast_to(
        z_ref[...][:, None, :], (gper, group_size, bn)
    ).reshape(gper * group_size, bn)
    w = (q * scales + zeros).astype(x_ref.dtype)

    acc_ref[...] += jax.lax.dot(
        x_ref[...], w, preferred_element_type=jnp.float32
    )

    @pl.when(ki == nk - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(out_dtype)


@functools.partial(
    jax.jit, static_argnames=("bm", "bk", "bn", "interpret")
)
def int4_matmul(
    x: jnp.ndarray,
    q4: jnp.ndarray,
    scales: jnp.ndarray,
    zeros: jnp.ndarray,
    bm: int = 256,
    bk: int = 512,
    bn: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """y[M, N] = x[M, K] @ dequant(q4, scales, zeros); fp32 accumulation.

    M is padded to bm; K and N must divide bk/bn (model dims are multiples of
    512 for every registry model: hidden 1536/2432/3072, mlp 4x).
    """
    m, k = x.shape
    k8, n = q4.shape
    assert k8 * 8 == k, (k8, k)
    groups = scales.shape[0]
    assert k % groups == 0
    group_size = k // groups
    assert bk % group_size == 0 and k % bk == 0 and n % bn == 0, (k, n, bk, bn)

    pad_m = (-m) % bm
    if pad_m:
        x = jnp.pad(x, ((0, pad_m), (0, 0)))
    mp = x.shape[0]

    grid = (mp // bm, n // bn, k // bk)
    gper = bk // group_size
    out = pl.pallas_call(
        functools.partial(_kernel, group_size=group_size, out_dtype=x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((bk // 8, bn), lambda i, j, kk: (kk, j)),
            pl.BlockSpec((gper, bn), lambda i, j, kk: (kk, j)),
            pl.BlockSpec((gper, bn), lambda i, j, kk: (kk, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j)),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        out_shape=jax.ShapeDtypeStruct((mp, n), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * n * k,
            bytes_accessed=mp * k * 2 + k8 * n * 4 + mp * n * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, q4, scales.astype(jnp.float32), zeros.astype(jnp.float32))
    return out[:m]


def _largest_divisor_block(dim: int, floor: int, cap: int = 1024) -> int:
    b = cap
    while b >= floor:
        if dim % b == 0:
            return b
        b //= 2
    return 0


def pick_k_block(k: int, group: int, cap: int = 1024, max_full_k: int = 8192) -> int:
    """K block honouring Mosaic's sublane rule: the scales block (bk/g, bn)
    needs bk/g % 8 == 0, or bk == K (full-array spec). 0 = ineligible."""
    b = cap
    while b >= group * 8:
        if k % b == 0 and (b // group) % 8 == 0:
            return b
        b //= 2
    # Non-power-of-two K (e.g. SD3.5's 2432): single whole-K block.
    if k <= max_full_k and (k // 8) % 8 == 0:
        return k
    return 0


def int4_linear(
    p, x: jnp.ndarray, bm: int = 0, bk: int = 0, bn: int = 0,
    act: str = None, interpret: bool = False,
) -> jnp.ndarray:
    """Apply an int4-quantized linear param dict via the Pallas kernel.

    x: (..., K) -> (..., N). bk/bn default to the largest power-of-two block
    (<=512) dividing each dim, so non-power-of-two hiddens (SD3.5's 2432)
    still qualify; bm 0 = auto (large blocks amortise the per-M-block
    dequant, ops/w4a8_matmul.pick_m_block). Eligibility is checked by the
    caller (ops/quantized.quantized_linear).
    """
    lead = x.shape[:-1]
    k = x.shape[-1]
    n = p["q4"].shape[-1]
    group = k // p["scales"].shape[-2]
    auto_bn = not bn
    # Sweep on v5e (4352x3072x12288): bk/bn 1024 beats 512 by ~20%.
    bk = bk or pick_k_block(k, group)
    bn = bn or _largest_divisor_block(n, 128, 1024)
    # VMEM guard: the unpacked int32 + dequantised fp32 weight temporaries
    # are ~8 bytes per (bk, bn) element; keep them under ~6 MB.
    while bk * bn * 8 > 6 << 20 and bn > 128 and n % (bn // 2) == 0:
        bn //= 2
    npad = n
    q4, scales, zeros = p["q4"], p["scales"], p["zeros"]
    if auto_bn:
        # Tiled-k + small-bn shapes re-fetch x per n sweep (see
        # w4a8_matmul._maybe_pad_n) — worse here: x is the 2-byte model
        # dtype. Zero-padded columns (scales = zeros = 0) dequant to 0.
        from .w4a8_matmul import _maybe_pad_n

        npad, bn = _maybe_pad_n(n, k, bk, bn)
        if npad != n:
            pad = npad - n
            q4 = jnp.pad(q4, ((0, 0), (0, pad)))
            scales = jnp.pad(scales, ((0, 0), (0, pad)))
            zeros = jnp.pad(zeros, ((0, 0), (0, pad)))
    if not bm:
        from .w4a8_matmul import pick_m_block

        m = 1
        for dim in x.shape[:-1]:
            m *= dim
        bm = pick_m_block(m, bk, bn)
    y = int4_matmul(
        x.reshape(-1, k), q4, scales, zeros,
        bm=bm, bk=bk, bn=bn, interpret=interpret,
    )
    if npad != n:
        y = y[:, :n]
    y = y.reshape(*lead, y.shape[-1])
    if p.get("bias") is not None:
        y = (y.astype(jnp.float32) + p["bias"].astype(jnp.float32)).astype(x.dtype)
    if act == "gelu":  # XLA-side in the model dtype; fuses into the consumer
        y = jax.nn.gelu(y, approximate=False)
    return y


# ---------------------------------------------------------------------------
# int8 variant: same tiling, no nibble unpack (q8 (K, N) uint8).
# NOTE: an 8B int8 model (9.3 GB packed) compiles to a ~17 GB HBM plan on a
# 16 GB v5e (XLA adds layout copies for the stacked uint8 weights), so int8
# serving targets v5p/multi-chip; int4 is the single-v5e configuration.
# ---------------------------------------------------------------------------


def _kernel8(x_ref, q_ref, s_ref, z_ref, o_ref, acc_ref, *, group_size, out_dtype):
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[...].astype(jnp.int32).astype(jnp.float32)  # (bk, bn)
    gper, bn = s_ref.shape
    scales = jnp.broadcast_to(
        s_ref[...][:, None, :], (gper, group_size, bn)
    ).reshape(gper * group_size, bn)
    zeros = jnp.broadcast_to(
        z_ref[...][:, None, :], (gper, group_size, bn)
    ).reshape(gper * group_size, bn)
    w = (q * scales + zeros).astype(x_ref.dtype)
    acc_ref[...] += jax.lax.dot(x_ref[...], w, preferred_element_type=jnp.float32)

    @pl.when(ki == nk - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("bm", "bk", "bn", "interpret"))
def int8_matmul(
    x: jnp.ndarray,
    q8: jnp.ndarray,
    scales: jnp.ndarray,
    zeros: jnp.ndarray,
    bm: int = 256,
    bk: int = 512,
    bn: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """y = x @ dequant(q8); fused group-affine dequant, fp32 accumulation."""
    m, k = x.shape
    _, n = q8.shape
    groups = scales.shape[0]
    group_size = k // groups
    assert bk % group_size == 0 and k % bk == 0 and n % bn == 0, (k, n, bk, bn)
    pad_m = (-m) % bm
    if pad_m:
        x = jnp.pad(x, ((0, pad_m), (0, 0)))
    mp = x.shape[0]
    gper = bk // group_size
    out = pl.pallas_call(
        functools.partial(_kernel8, group_size=group_size, out_dtype=x.dtype),
        grid=(mp // bm, n // bn, k // bk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j)),
            pl.BlockSpec((gper, bn), lambda i, j, kk: (kk, j)),
            pl.BlockSpec((gper, bn), lambda i, j, kk: (kk, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j)),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        out_shape=jax.ShapeDtypeStruct((mp, n), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * n * k,
            bytes_accessed=mp * k * 2 + k * n + mp * n * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, q8, scales.astype(jnp.float32), zeros.astype(jnp.float32))
    return out[:m]


def int8_linear(
    p, x: jnp.ndarray, bm: int = 0, act: str = None, interpret: bool = False
) -> jnp.ndarray:
    """Apply an int8-quantized linear param dict via the Pallas kernel."""
    lead = x.shape[:-1]
    k = x.shape[-1]
    n = p["q8"].shape[-1]
    group = k // p["scales"].shape[-2]
    bk = pick_k_block(k, group)
    bn = _largest_divisor_block(n, 128, 1024)
    while bk * bn * 8 > 6 << 20 and bn > 128 and n % (bn // 2) == 0:
        bn //= 2
    if not bm:
        from .w4a8_matmul import pick_m_block

        m = 1
        for dim in x.shape[:-1]:
            m *= dim
        bm = pick_m_block(m, bk, bn)
    y = int8_matmul(
        x.reshape(-1, k), p["q8"], p["scales"], p["zeros"],
        bm=bm, bk=bk, bn=bn, interpret=interpret,
    )
    y = y.reshape(*lead, n)
    if p.get("bias") is not None:
        y = (y.astype(jnp.float32) + p["bias"].astype(jnp.float32)).astype(x.dtype)
    if act == "gelu":  # XLA-side in the model dtype; fuses into the consumer
        y = jax.nn.gelu(y, approximate=False)
    return y
