"""Pallas TPU kernel: int4-packed weights x int8 activations on the int8 MXU.

The int4 fused-dequant kernel (ops/int4_matmul.py) keeps weights packed in
HBM but runs the MXU at the bf16 rate. TPU v5e+ executes int8 x int8 -> int32
matmuls at TWICE that rate, so for the compute-bound FLUX denoise step this
kernel raises the speed-of-light by ~2x while keeping the 4-bit HBM footprint
(12B on one 16 GB v5e) — the QServe-style two-level scheme:

  load:   per-channel ``wscale[n] = max_k |dequant(w)[k, n]| / 127``
  caller: folds ``1/wscale`` into the group affine once per call
          (``s8 = scales/wscale``, ``z8 = zeros/wscale`` — an O(K/g * N) XLA
          pass) and pre-quantizes activations per token
          (ops/w8a8.quantize_activations, a fused XLA pass)
  kernel: unpack int4 tile -> single fused-multiply-add onto the int8 grid
          (``round(q * s8 + z8)`` — no divide, no intermediate fp weight)
          -> int8 dot, int32 accumulation; the epilogue
          ``acc * xscale * wscale + bias -> out dtype`` runs IN-KERNEL so the
          int32 accumulator never round-trips HBM (XLA cannot fuse into a
          custom call; at FLUX fc1 shape the int32 write+read alone is
          ~430 MB/layer).

Accuracy: the requantized int8 grid (255 levels over the channel range) is
finer than the int4 grid (16 levels per group) whenever a group spans >~6% of
the channel range, so the added weight error is small next to the int4 error
already present; activations add the usual dynamic-int8 term. Validated
against the bf16 dequant path in tests/test_w8a8.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _requant_w8(q_ref, s_ref, z_ref, group_size: int) -> jnp.ndarray:
    """Unpack an int4 tile and requantize onto the per-channel int8 grid.

    One FMA per weight (the caller pre-divided scales/zeros by wscale, so
    the divide and the intermediate fp dequant the first version did are
    gone — the kernel is VPU-bound, so this is the hot path). Round-half-
    even like the host quantizers; exact grid membership is what the parity
    test pins.
    """
    packed = q_ref[...]
    bk8, bn = packed.shape
    shifts = (jax.lax.broadcasted_iota(jnp.uint32, (1, 8, 1), 1) * 4)
    vals = (packed[:, None, :] >> shifts) & jnp.uint32(0xF)
    q = vals.reshape(bk8 * 8, bn).astype(jnp.int32).astype(jnp.float32)
    gper = s_ref.shape[0]
    scales = jnp.broadcast_to(
        s_ref[...][:, None, :], (gper, group_size, bn)
    ).reshape(gper * group_size, bn)
    zeros = jnp.broadcast_to(
        z_ref[...][:, None, :], (gper, group_size, bn)
    ).reshape(gper * group_size, bn)
    return jnp.clip(jnp.round(q * scales + zeros), -127, 127).astype(jnp.int8)


def _kernel(
    x_ref,       # (bm, bk) int8 — pre-quantized activations
    q_ref,       # (bk/8, bn) uint32 packed int4
    s_ref,       # (bk/g, bn) f32 group scales on the int8 grid (scales/wscale)
    z_ref,       # (bk/g, bn) f32 group zeros on the int8 grid (zeros/wscale)
    ws_ref,      # (1, bn) f32 per-channel scale (int8 grid)
    xs_ref,      # (bm, 128) f32 per-token activation scale (lane-broadcast)
    b_ref,       # (1, bn) f32 bias (zeros when the layer has none)
    o_ref,       # (bm, bn) out dtype
    acc_ref,     # (bm, bn) int32 scratch
    *,
    group_size: int,
):
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w8 = _requant_w8(q_ref, s_ref, z_ref, group_size)

    acc_ref[...] += jax.lax.dot(
        x_ref[...], w8, preferred_element_type=jnp.int32
    )

    @pl.when(ki == nk - 1)
    def _():
        # In-kernel epilogue: dequantized result straight to the output dtype
        # (the int32 accumulator never touches HBM). GELU deliberately NOT
        # fused here: its erf temporaries push the (bm, bn) tile past the
        # 16 MB scoped-VMEM limit at bm=1024, and shrinking bm costs more
        # in repeated dequant passes than the fused activation saves — the
        # quantizing variant below (_kernel_gelu_quant) instead bounds the
        # temporaries with a static row-chunked epilogue.
        o_ref[...] = (
            acc_ref[...].astype(jnp.float32) * xs_ref[:, 0:1] * ws_ref[...]
            + b_ref[...]
        ).astype(o_ref.dtype)


def _kernel_gelu_quant(
    x_ref,       # (bm, bk) int8
    q_ref,       # (bk/8, bn) uint32 packed int4
    s_ref,       # (bk/g, bn) f32
    z_ref,       # (bk/g, bn) f32
    ws_ref,      # (1, bn) f32
    xs_ref,      # (bm, 128) f32 per-token activation scale
    b_ref,       # (1, bn) f32
    o8_ref,      # (bm, bn) int8 — quantized GELU output
    so_ref,      # (bm, 128) f32 — per (row, n-tile) output scale
    acc_ref,     # (bm, bn) int32 scratch
    *,
    group_size: int,
):
    """w4a8 matmul whose epilogue applies GELU and re-quantizes to int8 for
    the NEXT quantized linear (the FFN fc1 -> fc2 handoff): the bf16 hidden
    never reaches HBM and the standalone GELU->int8 pass
    (ops/fused_quant.gelu_quantize) disappears. The output scale is per
    (row, n-tile of this kernel) — FINER than the per-row scale the
    standalone pass produces — and the consumer accumulates per-k-tile
    partial dots rescaled by it (_kernel_grouped_xs).
    """
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w8 = _requant_w8(q_ref, s_ref, z_ref, group_size)
    acc_ref[...] += jax.lax.dot(
        x_ref[...], w8, preferred_element_type=jnp.int32
    )

    @pl.when(ki == nk - 1)
    def _():
        from .fused_quant import _gelu_erf, _gelu_form, _gelu_tanh

        gelu = _gelu_tanh if _gelu_form() == "tanh" else _gelu_erf
        bm = acc_ref.shape[0]
        # Static row chunks bound the epilogue's f32 temporaries (the erf
        # chain holds ~5 live (rows, bn) tiles; unchunked at bm=1024 it
        # exceeded scoped VMEM — the failed experiment _kernel's note cites).
        chunk = bm
        while chunk > 256 and chunk % 2 == 0:
            chunk //= 2
        for r0 in range(0, bm, chunk):
            r = slice(r0, r0 + chunk)
            y = (
                acc_ref[r].astype(jnp.float32) * xs_ref[r, 0:1] * ws_ref[...]
                + b_ref[...]
            )
            g = gelu(y)
            amax = jnp.maximum(
                jnp.max(jnp.abs(g), axis=-1, keepdims=True), 1e-8
            )
            r127 = 127.0 / amax
            o8_ref[r] = jnp.clip(jnp.round(g * r127), -127, 127).astype(
                jnp.int8
            )
            so_ref[r] = jnp.broadcast_to(
                amax / 127.0, (g.shape[0], so_ref.shape[-1])
            )


def _kernel_norm_rope(
    x_ref,       # (bm, bk) int8
    q_ref,       # (bk/8, bn) uint32 packed int4
    s_ref,       # (bk/g, bn) f32
    z_ref,       # (bk/g, bn) f32
    ws_ref,      # (1, bn) f32
    xs_ref,      # (bm, 128) f32
    b_ref,       # (1, bn) f32
    nw_ref,      # (1, bn) f32 — QK-RMSNorm weight tiled per head
    cs_ref,      # (bm, 256) f32 — [cos|cos] in lanes 0:128, [-sin|sin] in 128:256
    o_ref,       # (bm, bn) out dtype
    acc_ref,     # (bm, bn) int32 scratch
    *,
    group_size: int,
    eps: float,
    interp: bool,
):
    """w4a8 matmul whose epilogue applies per-head QK-RMSNorm + rotate-half
    RoPE before the write — the q/k projection -> norm -> rope handoff of the
    FLUX blocks as ONE kernel. The standalone XLA form of that chain is
    ~25 ms/step of VPU passes at FLUX 1024² (r4 profile: subtract_convert /
    rope-convert / concat fusions); here it rides the epilogue where the MXU
    and the dequant FMA dominate. Requires head_dim == 128 (one lane tile per
    head): the norm statistics reduce over each 128-lane segment and the
    rotation is a 64-lane roll — out = yn*[cos|cos] + roll(yn,64)*[-sin|sin],
    identical to ops/rope.rms_norm_rope's split-half form.
    """
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w8 = _requant_w8(q_ref, s_ref, z_ref, group_size)
    acc_ref[...] += jax.lax.dot(
        x_ref[...], w8, preferred_element_type=jnp.int32
    )

    @pl.when(ki == nk - 1)
    def _():
        y = (
            acc_ref[...].astype(jnp.float32) * xs_ref[:, 0:1] * ws_ref[...]
            + b_ref[...]
        )
        cos2 = cs_ref[:, 0:128]
        sin2 = cs_ref[:, 128:256]
        for j in range(y.shape[-1] // 128):
            sl = slice(j * 128, (j + 1) * 128)
            seg = y[:, sl]
            ms = jnp.mean(seg * seg, axis=-1, keepdims=True)
            yn = seg * jax.lax.rsqrt(ms + eps) * nw_ref[:, sl]
            if interp:  # pltpu.roll has no interpret lowering
                rolled = jnp.concatenate([yn[:, 64:], yn[:, :64]], axis=-1)
            else:
                rolled = pltpu.roll(yn, 64, 1)
            o_ref[:, sl] = (yn * cos2 + rolled * sin2).astype(o_ref.dtype)


def _kernel_grouped_xs(
    x_ref,       # (bm, bk) int8 — activations quantized per (row, k-tile)
    q_ref,       # (bk/8, bn) uint32 packed int4
    s_ref,       # (bk/g, bn) f32
    z_ref,       # (bk/g, bn) f32
    ws_ref,      # (1, bn) f32
    xs_ref,      # (bm, 128) f32 — THIS k-tile's activation scale
    b_ref,       # (1, bn) f32
    o_ref,       # (bm, bn) out dtype
    acc_ref,     # (bm, bn) f32 scratch
    *,
    group_size: int,
):
    """w4a8 matmul consuming activations whose int8 scale varies per
    (row, k-tile) — the layout _kernel_gelu_quant emits. Each k-tile's int32
    partial dot is exact (bk <= 1024: |sum| <= 1024*127^2 < 2^24, so the f32
    convert is lossless) and is rescaled into an f32 accumulator.
    """
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w8 = _requant_w8(q_ref, s_ref, z_ref, group_size)
    d = jax.lax.dot(x_ref[...], w8, preferred_element_type=jnp.int32)
    acc_ref[...] += d.astype(jnp.float32) * xs_ref[:, 0:1]

    @pl.when(ki == nk - 1)
    def _():
        o_ref[...] = (acc_ref[...] * ws_ref[...] + b_ref[...]).astype(
            o_ref.dtype
        )


@functools.partial(
    jax.jit,
    static_argnames=("bm", "bk", "bn", "out_dtype", "interpret", "mode", "eps"),
)
def w4a8_matmul(
    x8: jnp.ndarray,
    q4: jnp.ndarray,
    s8: jnp.ndarray,
    z8: jnp.ndarray,
    wscale: jnp.ndarray,
    xscale: jnp.ndarray,
    bias: jnp.ndarray,
    bm: int = 256,
    bk: int = 512,
    bn: int = 512,
    out_dtype=jnp.float32,
    interpret: bool = False,
    mode: str = "plain",
    norm_w: jnp.ndarray = None,
    rope_cs: jnp.ndarray = None,
    eps: float = 1e-6,
):
    """y[M, N] = (x8 @ round(q * s8 + z8)) * xscale * wscale + bias.

    ``s8``/``z8`` are the group affine pre-divided by ``wscale`` (so the
    in-kernel requant is a single FMA) and ``xscale`` is the (M, 1) per-token
    activation scale; the full dequant epilogue runs in-kernel and the int32
    accumulator never reaches HBM.

    ``mode`` selects the epilogue/dataflow (the FFN fc1->fc2 fusion):
      "plain"       per-row xscale, float output (default).
      "gelu_quant"  per-row xscale; the epilogue applies GELU and quantizes
                    to int8 per (row, n-tile). Returns ``(y8, yscale)`` with
                    yscale (M, (N/bn)*128) — lane-broadcast per n-tile, the
                    exact layout "grouped_xs" consumes. Rows are NOT sliced
                    back (padded rows carry valid scales); the caller slices
                    after the consumer matmul.
      "grouped_xs"  xscale is (M, (K/bk)*128) per (row, k-tile) — each
                    k-tile's exact int32 partial dot is rescaled into an f32
                    accumulator.
      "norm_rope"   per-row xscale; the epilogue applies per-head (128-lane)
                    QK-RMSNorm with weight ``norm_w`` (N,) and rotate-half
                    RoPE from ``rope_cs`` (M, 256) = [cos|cos|-sin|sin]
                    (_kernel_norm_rope). head_dim must be 128.
    """
    m, k = x8.shape
    k8, n = q4.shape
    assert k8 * 8 == k, (k8, k)
    groups = s8.shape[0]
    assert k % groups == 0
    group_size = k // groups
    assert bk % group_size == 0 and k % bk == 0 and n % bn == 0, (k, n, bk, bn)

    if mode == "grouped_xs":
        kt = k // bk
        xs = xscale.astype(jnp.float32)
        assert xs.shape == (m, kt * 128), (xs.shape, m, kt)
    else:
        xs = jnp.broadcast_to(xscale.astype(jnp.float32).reshape(m, 1), (m, 128))
    pad_m = (-m) % bm
    if pad_m:
        x8 = jnp.pad(x8, ((0, pad_m), (0, 0)))
        xs = jnp.pad(xs, ((0, pad_m), (0, 0)))
    mp = x8.shape[0]
    gper = bk // group_size
    kernel = {
        "plain": _kernel,
        "gelu_quant": _kernel_gelu_quant,
        "grouped_xs": _kernel_grouped_xs,
        "norm_rope": _kernel_norm_rope,
    }[mode]
    if mode == "norm_rope":
        assert norm_w is not None and rope_cs is not None
        assert bn % 128 == 0 and rope_cs.shape == (m, 256), (rope_cs.shape, m)
        kernel = functools.partial(kernel, eps=eps, interp=interpret)
        cs = jnp.pad(rope_cs.astype(jnp.float32), ((0, pad_m), (0, 0)))
        extra_in = [
            norm_w.reshape(1, -1).astype(jnp.float32),
            cs,
        ]
        extra_specs = [
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j)),
            pl.BlockSpec((bm, 256), lambda i, j, kk: (i, 0)),
        ]
    else:
        extra_in, extra_specs = [], []
    if mode == "gelu_quant":
        out_specs = (
            pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j)),
            pl.BlockSpec((bm, 128), lambda i, j, kk: (i, j)),
        )
        out_shape = (
            jax.ShapeDtypeStruct((mp, n), jnp.int8),
            jax.ShapeDtypeStruct((mp, (n // bn) * 128), jnp.float32),
        )
        acc_dtype = jnp.int32
    else:
        out_specs = pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j))
        out_shape = jax.ShapeDtypeStruct((mp, n), out_dtype)
        acc_dtype = jnp.float32 if mode == "grouped_xs" else jnp.int32
    xs_spec = (
        pl.BlockSpec((bm, 128), lambda i, j, kk: (i, kk))
        if mode == "grouped_xs"
        else pl.BlockSpec((bm, 128), lambda i, j, kk: (i, 0))
    )
    out = pl.pallas_call(
        functools.partial(kernel, group_size=group_size),
        grid=(mp // bm, n // bn, k // bk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((bk // 8, bn), lambda i, j, kk: (kk, j)),
            pl.BlockSpec((gper, bn), lambda i, j, kk: (kk, j)),
            pl.BlockSpec((gper, bn), lambda i, j, kk: (kk, j)),
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j)),
            xs_spec,
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j)),
        ] + extra_specs,
        out_specs=out_specs,
        scratch_shapes=[pltpu.VMEM((bm, bn), acc_dtype)],
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * n * k,
            bytes_accessed=mp * k + k8 * n * 4 + mp * n * 2,
            transcendentals=mp * n if mode == "gelu_quant" else 0,
        ),
        interpret=interpret,
    )(x8, q4, s8.astype(jnp.float32), z8.astype(jnp.float32),
      wscale.reshape(1, -1).astype(jnp.float32), xs,
      bias.reshape(1, -1).astype(jnp.float32), *extra_in)
    if mode == "gelu_quant":
        return out  # (y8 (mp, n), yscale (mp, nt*128)) — padded rows kept
    return out[:m]


def pick_m_block(m: int, bk: int, bn: int, extra_row_bytes: int = 0) -> int:
    """M block for the quantized kernels.

    The weight tile is unpacked+dequantized once per M block, so large bm
    amortises the VPU work (on-chip: w4a8 at FLUX fc1 shape runs 2.90 ms at
    bm=256 vs 2.08 ms at bm=1088; bm >= 2176 exceeds VMEM). Cost model:
    padded-M rows of MXU work + one dequant pass per M block (~150
    row-equivalents), under a VMEM cap on x tiles + the int32/f32 accumulator.
    """
    # Bytes/row for x (double-buffered) + int32 acc + the xscale lane block;
    # headroom set so the measured bm=1088 sweet spot stays eligible at
    # bk=1024/bn=512 (bm=2176 exceeded VMEM on v5e). Scaled per chip.
    from .chip import scale_budget

    budget = scale_budget(5_200_000)
    # 1088 = measured v5e cap (2176 exceeded VMEM); scales with the budget.
    bm_cap = scale_budget(1088)
    best, best_cost = 256, float("inf")
    for c in range(128, bm_cap + 1, 64):
        if c * (2 * bk + 4 * bn + 512 + extra_row_bytes) > budget:
            break
        ru = -(-m // c) * c
        cost = ru + (ru // c) * 150
        if cost < best_cost:
            best, best_cost = c, cost
    return best


def dequant_w8(q4: jnp.ndarray, s8: jnp.ndarray, z8: jnp.ndarray) -> jnp.ndarray:
    """XLA reference for dequant_w8_pallas (CPU path and parity tests):
    the same unpack + requant-FMA chain as ``_requant_w8``, as fused XLA
    elementwise ops."""
    k8, n = q4.shape
    shifts = (jnp.arange(8, dtype=jnp.uint32) * 4)[None, :, None]
    vals = (q4[:, None, :] >> shifts) & jnp.uint32(0xF)
    q = vals.reshape(k8 * 8, n).astype(jnp.int32).astype(jnp.float32)
    groups = s8.shape[0]
    g = (k8 * 8) // groups
    scales = jnp.broadcast_to(
        s8.astype(jnp.float32)[:, None, :], (groups, g, n)
    ).reshape(k8 * 8, n)
    zeros = jnp.broadcast_to(
        z8.astype(jnp.float32)[:, None, :], (groups, g, n)
    ).reshape(k8 * 8, n)
    return jnp.clip(jnp.round(q * scales + zeros), -127, 127).astype(jnp.int8)


def _dequant_kernel(q_ref, s_ref, z_ref, o_ref, *, group_size: int):
    o_ref[...] = _requant_w8(q_ref, s_ref, z_ref, group_size)


@functools.partial(jax.jit, static_argnames=("bk", "bn", "interpret"))
def dequant_w8_pallas(
    q4: jnp.ndarray,
    s8: jnp.ndarray,
    z8: jnp.ndarray,
    bk: int = 1024,
    bn: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Materialize the per-channel int8 weight grid from packed int4 as ONE
    Pallas pass over the weights: reads K*N/2 packed bytes, writes K*N int8
    (~0.07 ms of HBM at FLUX fc1 shape) with the unpack+requant FMA on the
    VPU. Bit-identical grid to the fused kernel's in-tile ``_requant_w8``.

    Feeding the result to an int8 matmul runs the dequant exactly once per
    (weight, step) instead of once per m-block inside the fused kernel —
    at M=4352/bm=1088 that was 4 full VPU passes, ~40% of the fused kernel's
    time (see w4a8_apply for the measured A/B).
    """
    k8, n = q4.shape
    k = k8 * 8
    groups = s8.shape[0]
    group_size = k // groups
    assert bk % group_size == 0 and k % bk == 0 and n % bn == 0, (k, n, bk, bn)
    gper = bk // group_size
    return pl.pallas_call(
        functools.partial(_dequant_kernel, group_size=group_size),
        grid=(k // bk, n // bn),
        in_specs=[
            pl.BlockSpec((bk // 8, bn), lambda kk, j: (kk, j)),
            pl.BlockSpec((gper, bn), lambda kk, j: (kk, j)),
            pl.BlockSpec((gper, bn), lambda kk, j: (kk, j)),
        ],
        out_specs=pl.BlockSpec((bk, bn), lambda kk, j: (kk, j)),
        out_shape=jax.ShapeDtypeStruct((k, n), jnp.int8),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * k * n,
            bytes_accessed=k8 * n * 4 + 2 * gper * (k // bk) * n * 4 + k * n,
            transcendentals=0,
        ),
        interpret=interpret,
    )(q4, s8.astype(jnp.float32), z8.astype(jnp.float32))


def _kernel_w8(
    x_ref,       # (bm, bk) int8
    w_ref,       # (bk, bn) int8 — materialized weight grid
    ws_ref,      # (1, bn) f32
    xs_ref,      # (bm, 128) f32
    b_ref,       # (1, bn) f32
    o_ref,       # (bm, bn) out dtype
    acc_ref,     # (bm, bn) int32 scratch
):
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jax.lax.dot(
        x_ref[...], w_ref[...], preferred_element_type=jnp.int32
    )

    @pl.when(ki == nk - 1)
    def _():
        o_ref[...] = (
            acc_ref[...].astype(jnp.float32) * xs_ref[:, 0:1] * ws_ref[...]
            + b_ref[...]
        ).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("bm", "bk", "bn", "out_dtype", "interpret")
)
def w8_matmul(
    x8: jnp.ndarray,
    w8: jnp.ndarray,
    wscale: jnp.ndarray,
    xscale: jnp.ndarray,
    bias: jnp.ndarray,
    bm: int = 1024,
    bk: int = 1024,
    bn: int = 512,
    out_dtype=jnp.float32,
    interpret: bool = False,
):
    """y = (x8 @ w8) * xscale * wscale + bias with a materialized int8
    weight grid (dequant_w8_pallas): int8 MXU dot, int32 VMEM accumulator,
    in-kernel dequant epilogue (the int32 never reaches HBM — the XLA
    dot_general equivalent writes the (M, N) int32 to HBM and re-reads it
    for the rescale, ~0.5 ms at FLUX fc1)."""
    m, k = x8.shape
    _, n = w8.shape
    assert k % bk == 0 and n % bn == 0, (k, n, bk, bn)
    xs = jnp.broadcast_to(xscale.astype(jnp.float32).reshape(m, 1), (m, 128))
    pad_m = (-m) % bm
    if pad_m:
        x8 = jnp.pad(x8, ((0, pad_m), (0, 0)))
        xs = jnp.pad(xs, ((0, pad_m), (0, 0)))
    mp = x8.shape[0]
    out = pl.pallas_call(
        _kernel_w8,
        grid=(mp // bm, n // bn, k // bk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j)),
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j)),
            pl.BlockSpec((bm, 128), lambda i, j, kk: (i, 0)),
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j)),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        out_shape=jax.ShapeDtypeStruct((mp, n), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * n * k,
            bytes_accessed=mp * k * (n // bn) + (mp // bm) * k * n + mp * n * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x8, w8, wscale.reshape(1, -1).astype(jnp.float32), xs,
      bias.reshape(1, -1).astype(jnp.float32))
    return out[:m]


def wscale_from_q4_host(p) -> "jnp.ndarray":
    """Per-channel int8-grid scale for an int4 param dict,
    computed from the exact dequantized extrema (host numpy)."""
    import numpy as np

    packed = np.asarray(jax.device_get(p["q4"]))
    in8, out_dim = packed.shape
    q = np.empty((in8, 8, out_dim), np.float32)
    for j in range(8):
        q[:, j, :] = ((packed >> np.uint32(4 * j)) & np.uint32(0xF)).astype(np.float32)
    q = q.reshape(in8 * 8, out_dim)
    scales = np.asarray(jax.device_get(p["scales"]), np.float32)
    zeros = np.asarray(jax.device_get(p["zeros"]), np.float32)
    g = q.shape[0] // scales.shape[0]
    w = q * np.repeat(scales, g, axis=0) + np.repeat(zeros, g, axis=0)
    return np.maximum(np.abs(w).max(axis=0), 1e-8).astype(np.float32) / 127.0


def add_wscale_bound_tree(params):
    """Device-side wscale from the group-affine bounds, no nibble unpack:
    per channel, max_g max(|z|, |z + 15 s|) bounds |dequant(w)| and the two
    extremes are attained in practice (each group's min/max hit q=0 and
    q=15 by construction of the min/max affine). Used for random-weight
    benchmarks where a 12B host round trip is not worth it; loaders use the
    exact ``add_wscale_tree``."""
    if isinstance(params, dict):
        if "q4" in params and "wscale" not in params:
            s = jnp.asarray(params["scales"], jnp.float32)
            z = jnp.asarray(params["zeros"], jnp.float32)
            amax = jnp.maximum(jnp.abs(z), jnp.abs(z + 15.0 * s)).max(axis=-2)
            out = dict(params)
            out["wscale"] = jnp.maximum(amax, 1e-8) / 127.0
            return out
        return {k: add_wscale_bound_tree(v) for k, v in params.items()}
    if isinstance(params, list):
        return [add_wscale_bound_tree(v) for v in params]
    return params


def add_wscale_tree(params):
    """Add per-channel "wscale" leaves to every int4 param dict in a tree,
    making them w4a8-kernel eligible. Host numpy; stacked (L, ...) q4 leaves
    get stacked (L, N) scales so scan/sharding structure is preserved."""
    import numpy as np

    if isinstance(params, dict):
        if "q4" in params and "wscale" not in params:
            q4 = params["q4"]
            out = dict(params)
            if q4.ndim == 2:
                out["wscale"] = wscale_from_q4_host(params)
            else:
                out["wscale"] = np.stack([
                    wscale_from_q4_host(
                        {k: v[i] for k, v in params.items()
                         if k in ("q4", "scales", "zeros")}
                    )
                    for i in range(q4.shape[0])
                ])
            return out
        return {k: add_wscale_tree(v) for k, v in params.items()}
    if isinstance(params, list):
        return [add_wscale_tree(v) for v in params]
    return params


def _pick_kn_blocks(k: int, n: int, group: int):
    """bk/bn for a w4a8 call at shape (k, n): Mosaic-legal k block, largest
    divisor n block, shrunk under the per-chip VMEM guard (the unpack int32 +
    f32 dequant + int8 requant temporaries are ~9 bytes per (bk, bn) elem)."""
    from .chip import scale_budget
    from .int4_matmul import _largest_divisor_block, pick_k_block

    bk = pick_k_block(k, group)
    bn = _largest_divisor_block(n, 128, 1024)
    while bk * bn * 9 > scale_budget(6 << 20) and bn > 128 and n % (bn // 2) == 0:
        bn //= 2
    return bk, bn


def _maybe_pad_n(n: int, k: int, bk: int, bn: int):
    """(npad, bn) for a w4a8 call whose k loop is tiled (kt = k/bk > 1).

    The x BlockSpec index (i, kk) changes on every grid step along k, so each
    of the n//bn j-sweeps re-fetches ALL of x's k tiles from HBM — x traffic
    scales with n/bn. Non-power-of-two n caps the divisor pick at bn=128
    (SD3.5's 2432 = 128*19): at 1024² CFG the FFN fc2 consumer re-reads its
    (8.5k, 9728) int8 hidden 19x per block, ~60 GB/step over 38 blocks.
    Zero-padding the weight columns to the next 512 multiple buys bn >= 512
    for ~5% extra columns (pad cols dequant to exactly 0: s8 = z8 = 0, bias
    0 — real columns are bit-identical) and the caller slices them off.

    No-op when k is a single tile (the x tile stays VMEM-resident across the
    j sweep — Mosaic re-fetches only when the block index changes; qkv/o/fc1
    run full-K at SD3.5's k=2432), when bn is already >= 512, or when the
    pad would waste > 12.5% extra columns. DIFFUSIONKIT_TPU_PAD_N=0 disables
    for A/B.
    """
    import os

    from .chip import scale_budget
    from .int4_matmul import _largest_divisor_block

    if os.environ.get("DIFFUSIONKIT_TPU_PAD_N", "1") == "0":
        return n, bn
    if k == bk or bn >= 512:
        return n, bn
    npad = -(-n // 512) * 512
    if npad == n or (npad - n) * 8 > n:
        return n, bn
    bn2 = _largest_divisor_block(npad, 128, 1024)
    while (
        bk * bn2 * 9 > scale_budget(6 << 20)
        and bn2 > 128
        and npad % (bn2 // 2) == 0
    ):
        bn2 //= 2
    if bn2 <= bn:
        return n, bn
    return npad, bn2


def _pad_cols(npad: int, q4, s8, z8, ws, bias):
    """Zero-pad the w4a8 operand set to npad output columns (_maybe_pad_n):
    padded columns dequant to exactly 0 (s8 = z8 = 0) and carry bias 0."""
    pad = npad - q4.shape[-1]
    return (
        jnp.pad(q4, ((0, 0), (0, pad))),
        jnp.pad(s8, ((0, 0), (0, pad))),
        jnp.pad(z8, ((0, 0), (0, pad))),
        jnp.pad(ws, (0, pad), constant_values=1.0),
        jnp.pad(bias, (0, pad)),
    )


def w4a8_linear(
    p, x: jnp.ndarray, bm: int = 0, act: str = None, interpret: bool = False
) -> jnp.ndarray:
    """Apply an int4-quantized linear param dict carrying a per-channel
    "wscale" leaf via the w4a8 kernel. x: (..., K) -> (..., N). bm 0 = auto;
    ``act="gelu"`` applies an exact-erf GELU XLA-side after the kernel (fused
    into the consumer — in-kernel erf was removed for VMEM, see _kernel).
    ``x`` may be a pre-quantized ActQuant shared across sibling projections
    (w8a8.quantize_shared) — the per-token dynamic-quantization pass is then
    skipped entirely."""
    from .w8a8 import ActQuant, quantize_activations

    preq = x if isinstance(x, ActQuant) else None
    if preq is not None:
        lead, k, out_dtype = preq.shape[:-1], preq.shape[-1], preq.dtype
    else:
        lead, k, out_dtype = x.shape[:-1], x.shape[-1], x.dtype
    n = p["q4"].shape[-1]
    group = k // p["scales"].shape[-2]
    bk, bn = _pick_kn_blocks(k, n, group)
    npad, bn = _maybe_pad_n(n, k, bk, bn)
    m = 1
    for dim in lead:
        m *= dim
    bm = bm or pick_m_block(m, bk, bn)
    ws = p["wscale"].astype(jnp.float32)
    rws = 1.0 / ws
    s8 = p["scales"].astype(jnp.float32) * rws
    z8 = p["zeros"].astype(jnp.float32) * rws
    bias = p["bias"] if p.get("bias") is not None else jnp.zeros((n,), jnp.float32)
    q4 = p["q4"]
    if npad != n:
        q4, s8, z8, ws, bias = _pad_cols(npad, q4, s8, z8, ws, bias)
    if preq is not None:
        x8 = preq.x8.reshape(-1, k)
        xscale = preq.xscale.reshape(-1, 1)
    else:
        from .fused_quant import fused_eligible, quantize as fused_quantize

        if fused_eligible(k) and not interpret:
            # One fused absmax+round pallas pass (the XLA chain is
            # pad+maximum, round and pack fusions re-reading x — the o-proj
            # input is the only per-block caller that reaches here).
            aq = fused_quantize(x.reshape(-1, k))
            x8, xscale = aq.x8, aq.xscale
        else:
            x8, xscale = quantize_activations(x.reshape(-1, k))
    y = w4a8_matmul(
        x8, q4, s8, z8, ws, xscale, bias,
        bm=bm, bk=bk, bn=bn, out_dtype=out_dtype, interpret=interpret,
    )
    if npad != n:
        y = y[..., :n]
    if act == "gelu":
        # XLA-side, in the model dtype (an explicit f32 upcast here measured
        # +20 ms/step at FLUX scale — it widens the fused elementwise pass).
        # In-kernel erf was tried and lost (VMEM; see _kernel epilogue note).
        y = jax.nn.gelu(y, approximate=False)
    return y.reshape(*lead, n)


def w4a8_qk_eligible(p, head_dim: int, interpret: bool = False) -> bool:
    """True when a q/k projection can run with the fused QK-RMSNorm + RoPE
    epilogue (w4a8_qk_linear): w4a8 params, head_dim exactly one lane tile
    (128 — the epilogue reduces per 128-lane segment and rolls by 64), and a
    Mosaic-legal block pick. DIFFUSIONKIT_TPU_FUSED_QK=0 disables (default
    ON since the r5 on-chip A/B at FLUX 1024² w4a8: 401→368 ms/step, and the
    compiled pltpu.roll branch matched the unfused chain to 0.5% rel)."""
    import os

    if os.environ.get("DIFFUSIONKIT_TPU_FUSED_QK", "1") == "0":
        return False
    if head_dim != 128:
        return False
    if not (isinstance(p, dict) and p.get("q4") is not None
            and p.get("wscale") is not None and p["q4"].ndim == 2):
        return False
    if not interpret:
        try:
            if jax.default_backend() != "tpu":
                return False
        except Exception:  # pragma: no cover
            return False
    k = p["q4"].shape[0] * 8
    n = p["q4"].shape[-1]
    group = k // p["scales"].shape[-2]
    bk, bn = _pick_kn_blocks(k, n, group)
    return bool(bk) and bn % 128 == 0 and n % bn == 0


def w4a8_qk_linear(
    p,
    x,
    norm_w: jnp.ndarray,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    eps: float = 1e-6,
    interpret: bool = False,
) -> jnp.ndarray:
    """q/k projection with QK-RMSNorm + rotate-half RoPE fused into the w4a8
    epilogue (mode="norm_rope"): the standalone norm->rope chain after the
    projection was ~25 ms/step of XLA VPU passes at FLUX 1024² (r4 profile).

    x: (..., K) float or shared ActQuant; norm_w: (head_dim,) RMSNorm weight;
    cos/sin: (S, head_dim/2) fp32 tables for the S rows of x (dual-block
    image branches pass the image-offset slice). Returns (..., N) in the
    model dtype, numerically rms_norm_rope(linear(p, x)) computed on the f32
    epilogue value (no intermediate model-dtype rounding).
    """
    from .w8a8 import ActQuant, quantize_activations

    preq = x if isinstance(x, ActQuant) else None
    if preq is not None:
        lead, k, out_dtype = preq.shape[:-1], preq.shape[-1], preq.dtype
    else:
        lead, k, out_dtype = x.shape[:-1], x.shape[-1], x.dtype
    n = p["q4"].shape[-1]
    group = k // p["scales"].shape[-2]
    bk, bn = _pick_kn_blocks(k, n, group)
    m = 1
    for dim in lead:
        m *= dim
    # cs rows ride VMEM per m-block (f32, double-buffered): 256*4*2 B/row.
    bm = pick_m_block(m, bk, bn, extra_row_bytes=2048)
    s8, z8, ws, bias = _scaled_affine(p)
    nw = jnp.tile(norm_w.astype(jnp.float32), n // norm_w.shape[-1])
    cs_row = jnp.concatenate(
        [cos, cos, -sin, sin], axis=-1
    ).astype(jnp.float32)  # (S, 256)
    s_rows = cs_row.shape[0]
    if m != s_rows:  # batched rows: (b, S) -> tile the table
        assert m % s_rows == 0, (m, s_rows)
        cs_row = jnp.tile(cs_row, (m // s_rows, 1))
    if preq is not None:
        x8 = preq.x8.reshape(-1, k)
        xscale = preq.xscale.reshape(-1, 1)
    else:
        from .fused_quant import fused_eligible, quantize as fused_quantize

        if fused_eligible(k) and not interpret:
            aq = fused_quantize(x.reshape(-1, k))
            x8, xscale = aq.x8, aq.xscale
        else:
            x8, xscale = quantize_activations(x.reshape(-1, k))
    y = w4a8_matmul(
        x8, p["q4"], s8, z8, ws, xscale, bias,
        bm=bm, bk=bk, bn=bn, out_dtype=out_dtype, interpret=interpret,
        mode="norm_rope", norm_w=nw, rope_cs=cs_row, eps=eps,
    )
    return y.reshape(*lead, n)


def _scaled_affine(p):
    """(s8, z8, ws, bias) with the group affine pre-divided by wscale."""
    ws = p["wscale"].astype(jnp.float32)
    rws = 1.0 / ws
    n = p["q4"].shape[-1]
    bias = p["bias"] if p.get("bias") is not None else jnp.zeros((n,), jnp.float32)
    return (
        p["scales"].astype(jnp.float32) * rws,
        p["zeros"].astype(jnp.float32) * rws,
        ws,
        bias,
    )


def w4a8_ffn_eligible(fc1, fc2) -> bool:
    """True when the fc1 -> GELU -> fc2 chain can run as two fused w4a8
    kernels with no float hidden in HBM (w4a8_ffn_gelu): both layers carry
    the w4a8 wscale, shapes agree, and fc1's n-tile is a Mosaic-legal k-tile
    for fc2 (fc2's group size must tile it in sublane multiples of 8).
    DIFFUSIONKIT_TPU_FUSED_FFN=0 disables for A/B."""
    import os

    if os.environ.get("DIFFUSIONKIT_TPU_FUSED_FFN", "1") == "0":
        return False
    try:
        if jax.default_backend() != "tpu":
            # CPU tests exercise this path with interpret=True explicitly;
            # the production dispatch requires the Mosaic lowering.
            return False
    except Exception:  # pragma: no cover
        return False
    for p in (fc1, fc2):
        if not (isinstance(p, dict) and p.get("q4") is not None
                and p.get("wscale") is not None):
            return False
    n1 = fc1["q4"].shape[-1]
    k2 = fc2["q4"].shape[-1 - 1] * 8 if fc2["q4"].ndim == 2 else None
    if k2 != n1:
        return False
    k1 = fc1["q4"].shape[0] * 8
    g1 = k1 // fc1["scales"].shape[-2]
    g2 = k2 // fc2["scales"].shape[-2]
    bk1, bn1 = _pick_kn_blocks(k1, n1, g1)
    if not bk1 or not bn1:
        return False
    # fc2 consumes with bk2 == bn1: its scales block (bk2/g2, bn2) needs
    # g2 | bk2 and (bk2/g2) % 8 == 0 (Mosaic sublane rule).
    return bn1 % g2 == 0 and (bn1 // g2) % 8 == 0


def w4a8_ffn_gelu(fc1, fc2, x, interpret: bool = False) -> jnp.ndarray:
    """fc2(GELU(fc1(x))) with the hidden activation held in int8 end to end.

    fc1 runs with the GELU->int8 epilogue (per (row, n-tile) scales); fc2
    consumes the (int8, grouped scales) pair with per-k-tile rescaling. vs
    the previous chain (fc1 -> HBM bf16 -> gelu_quantize pallas pass -> fc2)
    this deletes the standalone GELU pass and replaces the bf16 hidden's
    write+read (4 bytes/elem) with int8 (2 bytes/elem) plus the small scale
    planes — at the FLUX 1024² fc1 shape (4352x3072x12288) a ~160 MB/block
    HBM saving, and the GELU VPU work overlaps the matmul's MXU time.

    Quality: the per-(row, n-tile) output scale is strictly finer than
    gelu_quantize's per-row scale; the k-tile partial dots the consumer
    rescales are exact in int32 and lossless in f32 (bk <= 1024).
    """
    from .w8a8 import ActQuant, quantize_activations

    preq = x if isinstance(x, ActQuant) else None
    if preq is not None:
        lead, k1, out_dtype = preq.shape[:-1], preq.shape[-1], preq.dtype
    else:
        lead, k1, out_dtype = x.shape[:-1], x.shape[-1], x.dtype
    n1 = fc1["q4"].shape[-1]
    n2 = fc2["q4"].shape[-1]
    g1 = k1 // fc1["scales"].shape[-2]
    g2 = n1 // fc2["scales"].shape[-2]
    bk1, bn1 = _pick_kn_blocks(k1, n1, g1)
    import os

    env_bn1 = os.environ.get("DIFFUSIONKIT_TPU_FFN_BN1")  # e2e sweep knob
    if env_bn1:
        # Validate against the same constraints w4a8_ffn_eligible applied to
        # the auto pick (bk2 = bn1): fc2's group size must tile it in
        # sublane multiples of 8, and the (bk2, bn) VMEM guard must still be
        # satisfiable — an unchecked override would trip w4a8_matmul's
        # bk % group_size assert mid-pipeline (ADVICE r4).
        cand = int(env_bn1)
        if (
            n1 % cand == 0
            and cand % g2 == 0
            and (cand // g2) % 8 == 0
        ):
            bn1 = cand
    m = 1
    for dim in lead:
        m *= dim
    bm1 = pick_m_block(m, bk1, bn1)
    s81, z81, ws1, b1 = _scaled_affine(fc1)
    if preq is not None:
        x8 = preq.x8.reshape(-1, k1)
        xscale = preq.xscale.reshape(-1, 1)
    else:
        x8, xscale = quantize_activations(x.reshape(-1, k1))
    h8, hs = w4a8_matmul(
        x8, fc1["q4"], s81, z81, ws1, xscale, b1,
        bm=bm1, bk=bk1, bn=bn1, interpret=interpret, mode="gelu_quant",
    )
    # fc2: k-tiles must coincide with fc1's n-tiles (the scale granularity).
    bk2 = bn1
    from .int4_matmul import _largest_divisor_block
    from .chip import scale_budget

    # Joint (bn2, bm2) pick: a wide bn2 that passes the VMEM guard can still
    # lose by shrinking bm under pick_m_block's budget — at FLUX fc2
    # (m=4352, bk2=512) bn2=1024 forces bm=896 (5 dequant passes + 3% row
    # pad, measured 1.62 ms/call) while bn2=512 admits the bm=1088 sweet
    # spot (4 passes, exact tiling). Evaluate pick_m_block's cost across
    # bn2 candidates instead of guarding VMEM alone.
    mp2 = h8.shape[0]
    best = None
    bn_c = _largest_divisor_block(n2, 128, 1024)
    while bn_c >= 128 and n2 % bn_c == 0:
        if bk2 * bn_c * 9 <= scale_budget(6 << 20):
            bm_c = pick_m_block(mp2, bk2, bn_c)
            ru = -(-mp2 // bm_c) * bm_c
            cost = ru + (ru // bm_c) * 150
            if best is None or cost < best[0]:
                best = (cost, bn_c, bm_c)
        bn_c //= 2
    if best is None:
        # No candidate passed the VMEM guard (a low DIFFUSIONKIT_TPU_VMEM_SCALE
        # override or an unswept chip entry): degrade to the smallest legal
        # bn rather than crash (ADVICE r4).
        bn_c = _largest_divisor_block(n2, 128, 128)
        best = (0, bn_c, pick_m_block(mp2, bk2, bn_c))
    # h8 keeps fc1's row padding (valid scales in the pad rows); pass the
    # padded m through and slice once at the end.
    _, bn2, bm2 = best
    # fc2's k loop is always tiled (kt2 = n1/bk2 — 38 at SD3.5 shapes), so a
    # small bn2 multiplies h8 re-reads; pad n2 when that buys a bigger tile.
    npad2, bn2p = _maybe_pad_n(n2, n1, bk2, bn2)
    s82, z82, ws2, b2 = _scaled_affine(fc2)
    q42 = fc2["q4"]
    if npad2 != n2:
        q42, s82, z82, ws2, b2 = _pad_cols(npad2, q42, s82, z82, ws2, b2)
        bn2, bm2 = bn2p, pick_m_block(mp2, bk2, bn2p)
    y = w4a8_matmul(
        h8, q42, s82, z82, ws2, hs, b2,
        bm=bm2, bk=bk2, bn=bn2, out_dtype=out_dtype, interpret=interpret,
        mode="grouped_xs",
    )
    return y[:m, :n2].reshape(*lead, n2)
