"""Pallas TPU flash attention for the MMDiT joint text+image sequence.

TPU-native replacement for ``mx.fast.scaled_dot_product_attention`` and its
memory-efficient threshold path (reference mmdit.py:19,562,636-639,687,729-732).
Non-causal full attention with online softmax: the (S, S) score matrix is
never materialised in HBM; each q tile streams kv tiles through VMEM and
keeps fp32 running (max, denominator, accumulator) scratch. Blocks are
auto-picked per shape (pick_flash_blocks): a single whole-sequence kv tile
whenever the f32 score buffer fits VMEM — one exp pass, no running-stat
rescales — which beat the streaming 512/1024 tiling in on-chip sweeps at
both headline shapes (SD3 512^2 s=1178 d=64: 0.60 vs 0.99 ms; FLUX 1024^2
s=4352 d=128: 2.37 vs 2.97 ms; XLA SDPA: 1.13 / 14.5 ms).

The joint sequence length (image tokens + text tokens, e.g. 4096 + 154 for
SD3 at 1024x1024) is rarely a multiple of the kv tile, so inputs are padded to
the tile grid and padded keys are masked with a large negative score; padded
query rows are sliced off by the caller.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_kernel(
    vlen_ref,  # SMEM (1,) int32: number of valid kv positions
    q_ref,  # VMEM (1, q_blk, d) — or (1, q_blk, 1, d) in bshd layout
    k_ref,  # VMEM (1, kv_blk, d) / (1, kv_blk, 1, d)
    v_ref,  # VMEM (1, kv_blk, d) / (1, kv_blk, 1, d)
    o_ref,  # VMEM (1, q_blk, d) / (1, q_blk, 1, d)
    *rest,  # [m_out, l_out (1, q_blk, 128) when emit_stats] + scratch m, l, acc
    scale: float,
    kv_blk: int,
    kv_axis: int = 2,
    emit_stats: bool = False,
):
    if emit_stats:
        m_out_ref, l_out_ref, m_ref, l_ref, acc_ref = rest
    else:
        m_ref, l_ref, acc_ref = rest
    ki = pl.program_id(kv_axis)
    num_kv = pl.num_programs(kv_axis)

    @pl.when(ki == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s = s * scale

    # Mask padded kv positions (only the trailing tiles are ever partial).
    # (1, kv_blk) row iota broadcast into the select — not a full
    # (q_blk, kv_blk) index matrix (the compare would cost a full VPU pass
    # over the score tile).
    col = ki * kv_blk + jax.lax.broadcasted_iota(jnp.int32, (1, s.shape[-1]), 1)
    s = jnp.where(col < vlen_ref[0], s, NEG_INF)

    m_prev = m_ref[:, 0:1]
    l_prev = l_ref[:, 0:1]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)
    if emit_stats:
        # A chunk can be FULLY masked in ring use (vlen 0): there
        # s == m_new == NEG_INF and exp(s - m_new) == 1, which would corrupt
        # l. Zero masked columns explicitly. (Partially-masked tiles on the
        # single-chip path need no guard: m_new is finite and the masked
        # exp underflows to exactly 0.)
        p = jnp.where(col < vlen_ref[0], p, 0.0)
    l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)

    pv = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc_ref[...] = acc_ref[...] * alpha + pv
    m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[...] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(ki == num_kv - 1)
    def _finalize():
        # max() guard: a fully-masked chunk (ring attention with vlen 0) has
        # l == 0 everywhere; emit 0 rather than 0/0 (the combiner weights the
        # chunk by l so it contributes nothing either way).
        o_ref[0] = (
            acc_ref[...] / jnp.maximum(l_ref[:, 0:1], 1e-30)
        ).astype(o_ref.dtype)
        if emit_stats:
            m_out_ref[0] = m_ref[...]
            l_out_ref[0] = l_ref[...]


def _pad_seq(x: jnp.ndarray, multiple: int) -> jnp.ndarray:
    s = x.shape[-2]
    pad = (-s) % multiple
    if pad == 0:
        return x
    return jnp.pad(x, ((0, 0), (0, pad), (0, 0)))


# Mosaic fits a single (q_blk, kv_blk) f32 score buffer in VMEM up to ~9 MB
# (on-chip sweep on v5e: 512x4352 ok, 1280x1280 ok and fastest at the SD3
# shape, 2048x2048 fails to compile). Scaled per chip generation (ops/chip.py).
_SCORE_BUDGET_V5E = 2_250_000  # f32 elements


def _score_budget() -> int:
    from .chip import scale_budget

    return scale_budget(_SCORE_BUDGET_V5E)


def pick_flash_blocks(s: int, d: int, itemsize: int = 2) -> tuple:
    """Block sizes for a given joint sequence length.

    Single-tile kv wins whenever the whole (padded) sequence fits the score
    budget: one exp pass, no running-stat rescales (on-chip sweep, round 2:
    SD3 s=1178 0.60 ms vs 0.99 at 512/1024; FLUX s=4352 2.37 vs 2.97).
    Among q blocks under the budget, prefer the largest that DIVIDES the
    padded sequence — at FLUX 1024² (s=4352) q_blk=512 pads the q grid to
    4608 (+5.9% wasted rows) while 256 tiles it exactly.
    Falls back to streaming 1024/1024 tiles for very long sequences —
    the v5e sweep winner at the FLUX 2048² joint shape (s=16640, d=128:
    36.1 ms/layer, 94 TFLOP/s vs 41.1 at the previous untuned 512/1024;
    q256/kv2048 and q512/kv2048 tie within 3%, tools/sweep_flash_long.py).

    ``itemsize`` is the q/k/v byte width. The swept budgets above are bf16
    ground truth and stay bit-identical at itemsize<=2; wider inputs
    (SD3.5's fp32-upcast attention segments, reference mmdit.py:575-589)
    double the resident kv/q/o tile bytes, so a byte model gates the pick —
    the bf16-tuned q=256/kv=4352 at f32 hit a 16.95M > 16M scoped-VMEM OOM
    on chip (round 5), where q=128 fits at ~13.6 MB.
    """
    import os

    if d > 256:
        # Wide single-head attention (the VAE mid-block: h=1, d=512). The
        # scratch/kv tiles scale with d, so the d<=256 budgets above-derived
        # don't transfer: 512/512 streaming tiles keep the program ~8.5 MB
        # of VMEM (score f32 1 MB + 3x m/l/acc 1 MB + double-buffered
        # 0.5 MB q/k/v/o blocks) — conservative, correctness-first; sweep
        # on-chip before raising.
        return 512, 512

    budget = _score_budget()
    s128 = -(-s // 128) * 128
    # Single-tile kv needs the f32 score buffer AND both whole-sequence k/v
    # tiles resident; past ~6k (v5e) the combination exceeds the ~13 MB that
    # empirically fits (2048² resolutions fall back to streaming tiles).
    single_kv_cap = 6144 * max(1, int(budget // _SCORE_BUDGET_V5E))
    bw = d if d % 128 == 0 else 128  # lane-tile block width (packed heads)
    from .chip import scale_budget

    def _fits(q_blk: int, kv_blk: int) -> bool:
        # Scoped-VMEM byte model: f32 score + exp buffers, double-buffered
        # q/k/v/o tiles. Enforced only past bf16 widths — the itemsize<=2
        # picks are on-chip-swept and must not move.
        if itemsize <= 2:
            return True
        est = (2 * q_blk * kv_blk * 4
               + 4 * kv_blk * bw * itemsize
               + 4 * q_blk * bw * itemsize)
        return est <= scale_budget(15 << 20)

    if s128 * 128 <= budget and s128 <= single_kv_cap:
        cap = min(s128, budget // s128 // 128 * 128)
        env = os.environ.get("DIFFUSIONKIT_TPU_FLASH_QBLK")  # sweep knob
        if env:
            # Round down to a lane-tile multiple: a misaligned override would
            # otherwise surface as an opaque Mosaic block-shape error on chip.
            q_blk = max(128, min(int(env), cap) // 128 * 128)
            return q_blk, s128
        for q_blk in range(cap, 127, -128):
            if s128 % q_blk == 0 and _fits(q_blk, s128):
                return q_blk, s128
        for q_blk in range(cap, 127, -128):  # no fitting divisor: any fit
            if _fits(q_blk, s128):
                return q_blk, s128
        if _fits(cap, s128):
            return cap, s128
        # fall through to streaming tiles
    if itemsize > 2 and bw > 128:
        # f32 with a >1-lane-tile head: 1024/1024 streaming (~20 MB est)
        # would itself OOM scoped VMEM; halve the q tile.
        return 512, 1024
    return 1024, 1024


def _interleave_halves() -> bool:
    import os

    return os.environ.get("DIFFUSIONKIT_TPU_FLASH_INTERLEAVE", "1") != "0"


def _flash_kernel_bshd(
    vlen_ref,  # SMEM (1,) int32: number of valid kv positions
    q_ref,  # VMEM (1, q_blk, pack*d) — `pack` heads side by side
    k_ref,  # VMEM (1, kv_blk, pack*d)
    v_ref,  # VMEM (1, kv_blk, pack*d)
    o_ref,  # VMEM (1, q_blk, pack*d)
    *scratch,  # streaming mode only: m, l, acc VMEM (q_blk, pack*d) fp32
    scale: float,
    kv_blk: int,
    d_head: int,
    pack: int,
    single_tile: bool,
    need_mask: bool,
):
    """bshd flash body. For head dims below the 128-lane tile (d=64 models)
    each program packs ``pack = 128 // d`` heads into one lane-aligned block
    and runs their online softmax side by side in column segments — the
    block shape stays legal under Mosaic's last-two-dims rule without ever
    materialising a (B,H,S,D) transpose.

    VPU economy (the kernel is softmax-bound at short sequences — the SD3
    512² shape measured 26 TFLOP/s before these): the mask is a (1, kv_blk)
    row broadcast into the select instead of a full (q_blk, kv_blk)
    iota+compare; ``need_mask=False`` (sequence already a kv_blk multiple,
    e.g. FLUX 1024²'s s=4352) drops the select entirely; ``scale`` rides the
    exp argument ``(s - m) * scale`` — an FMA in the pass that already
    subtracts m — instead of a standalone multiply over the score matrix;
    and ``single_tile=True`` (one kv program: the whole sequence fits the
    score budget) is a straight softmax with no m/l/acc scratch, no init
    pass and no rescale. Measured: kernel-local in round 3 (BENCH_r03 37.9
    ms/step, within noise of r02's 37.18); the round-4 combination with the
    row-split interleave below and the fused float AdaLN-LN landed the SD3
    512² step at 31.6 ms (58% MFU) and FLUX 1024² w4a8 flash at ~1.56
    ms/call (89 ms of the 398 ms step).

    Precondition: ``scale > 0``. Masking relies on ``exp((NEG_INF - m) *
    scale)`` underflowing to zero, which flips sign for negative scale
    (asserted statically in flash_attention_bshd)."""
    if not single_tile:
        m_ref, l_ref, acc_ref = scratch
        ki = pl.program_id(3)
        num_kv = pl.num_programs(3)

        @pl.when(ki == 0)
        def _init():
            m_ref[...] = jnp.full_like(m_ref, NEG_INF)
            l_ref[...] = jnp.zeros_like(l_ref)
            acc_ref[...] = jnp.zeros_like(acc_ref)
    else:
        ki = 0

    if need_mask:
        col = ki * kv_blk + jax.lax.broadcasted_iota(jnp.int32, (1, kv_blk), 1)
        valid = col < vlen_ref[0]

    for j in range(pack):
        sl = slice(j * d_head, (j + 1) * d_head)
        q = q_ref[0][:, sl]
        k = k_ref[0][:, sl]
        v = v_ref[0][:, sl]

        if single_tile:
            # Row-split MXU/VPU interleave: both half-blocks' qk dots issue
            # before the first softmax, so the MXU computes half 2's scores
            # (then half 1's pv) while the VPU runs the data-dependent
            # max->exp->sum chain of the other half — the straight-line form
            # serializes the softmax VPU time behind the dots (FLUX 1024²
            # measured 1.675 ms/call vs the ~1.18 ms dot-only roofline).
            # DIFFUSIONKIT_TPU_FLASH_INTERLEAVE=0 restores one pass for A/B.
            qb = q.shape[0]
            halves = (
                [slice(0, qb // 2), slice(qb // 2, qb)]
                if _interleave_halves() and qb % 256 == 0
                else [slice(0, qb)]
            )
            ss = [
                jax.lax.dot_general(
                    q[r], k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                for r in halves
            ]
            for r, sh in zip(halves, ss):
                if need_mask:
                    sh = jnp.where(valid, sh, NEG_INF)
                m_cur = jnp.max(sh, axis=-1, keepdims=True)
                p = jnp.exp((sh - m_cur) * scale)
                l_new = jnp.sum(p, axis=-1, keepdims=True)
                pv = jax.lax.dot_general(
                    p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                o_ref[0, r, sl] = (pv / l_new).astype(o_ref.dtype)
            continue

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if need_mask:
            s = jnp.where(valid, s, NEG_INF)

        m_cur = jnp.max(s, axis=-1, keepdims=True)

        m_prev = m_ref[:, j * d_head : j * d_head + 1]
        l_prev = l_ref[:, j * d_head : j * d_head + 1]
        m_new = jnp.maximum(m_prev, m_cur)
        # m is stored UNSCALED; the scale folds into every exp argument.
        alpha = jnp.exp((m_prev - m_new) * scale)
        p = jnp.exp((s - m_new) * scale)
        l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)

        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_ref[:, sl] = acc_ref[:, sl] * alpha + pv
        m_ref[:, sl] = jnp.broadcast_to(m_new, (m_new.shape[0], d_head))
        l_ref[:, sl] = jnp.broadcast_to(l_new, (l_new.shape[0], d_head))

    if not single_tile:
        @pl.when(ki == num_kv - 1)
        def _finalize():
            for j in range(pack):
                sl = slice(j * d_head, (j + 1) * d_head)
                o_ref[0, :, sl] = (
                    acc_ref[:, sl] / l_ref[:, j * d_head : j * d_head + 1]
                ).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("scale", "q_blk", "kv_blk", "interpret")
)
def flash_attention_bshd(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float,
    q_blk: int = 0,
    kv_blk: int = 0,
    interpret: bool = False,
) -> jnp.ndarray:
    """Flash attention over (B, S, H, D) inputs — the layout the model's
    head-split reshape produces naturally, so no physical (B,H,S,D)
    transpose of q/k/v/o is ever materialised (on the FLUX 1024² step those
    four copies were ~26 ms/step of 'data formatting' in the profile).

    Implementation: the input is viewed as (B, S, H*D) — a free reshape —
    and each grid program selects its head(s) via the COLUMN block index.
    Blocks are (1, q_blk, max(D, 128)): for D >= 128 one head per program;
    for D=64 two heads pack into one lane-aligned block and run side by
    side (see _flash_kernel_bshd). Requires 128 % D == 0 or D % 128 == 0.
    An H not divisible by the pack factor (e.g. SD3.5's 38 heads at tp=2 ->
    19 local heads) is padded with zero heads and sliced back — ~1/H extra
    compute instead of the materialised-transpose fallback the odd count
    previously forced (VERDICT round 2, Weak #6)."""
    b, s, h, d = q.shape
    # Masked columns underflow via exp((NEG_INF - m) * scale); scale <= 0
    # would silently let padded kv columns dominate (see _flash_kernel_bshd).
    assert scale > 0, f"flash_attention_bshd requires scale > 0, got {scale}"
    pack = 1 if d % 128 == 0 else 128 // d
    assert d * pack >= 128 and (d % 128 == 0 or 128 % d == 0), d
    h_orig = h
    h_pad = (-h) % pack
    if h_pad:
        pads = ((0, 0), (0, 0), (0, h_pad), (0, 0))
        q, k, v = (jnp.pad(x, pads) for x in (q, k, v))
        h += h_pad
    bw = d * pack
    if not q_blk or not kv_blk:
        auto_q, auto_kv = pick_flash_blocks(s, d, q.dtype.itemsize)
        q_blk = q_blk or auto_q
        kv_blk = kv_blk or auto_kv
    orig_s = s

    q = _pad_seq(q.reshape(b, s, h * d), q_blk)
    k = _pad_seq(k.reshape(b, s, h * d), kv_blk)
    v = _pad_seq(v.reshape(b, s, h * d), kv_blk)
    sq, sk = q.shape[1], k.shape[1]

    grid = (b, h // pack, sq // q_blk, sk // kv_blk)
    single_tile = sk == kv_blk
    kernel = functools.partial(
        _flash_kernel_bshd, scale=scale, kv_blk=kv_blk, d_head=d, pack=pack,
        single_tile=single_tile, need_mask=orig_s < sk,
    )
    vlen = jnp.array([orig_s], dtype=jnp.int32)

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, q_blk, bw), lambda bi, hi, qi, ki, vlen: (bi, qi, hi)),
                pl.BlockSpec((1, kv_blk, bw), lambda bi, hi, qi, ki, vlen: (bi, ki, hi)),
                pl.BlockSpec((1, kv_blk, bw), lambda bi, hi, qi, ki, vlen: (bi, ki, hi)),
            ],
            out_specs=pl.BlockSpec((1, q_blk, bw), lambda bi, hi, qi, ki, vlen: (bi, qi, hi)),
            scratch_shapes=[] if single_tile else [
                # m/l sized to the block width: the kernel writes d-wide
                # segments per packed head, so bw (not 128) is required when
                # a single head spans more than one lane tile (d=256).
                pltpu.VMEM((q_blk, bw), jnp.float32),
                pltpu.VMEM((q_blk, bw), jnp.float32),
                pltpu.VMEM((q_blk, bw), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, sq, h * d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(vlen, q, k, v)

    out = out[:, :orig_s].reshape(b, orig_s, h, d)
    return out[:, :, :h_orig] if h_pad else out


@functools.partial(
    jax.jit, static_argnames=("scale", "q_blk", "kv_blk", "interpret")
)
def flash_attention_stats(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float,
    vlen: jnp.ndarray,
    q_blk: int = 0,
    kv_blk: int = 0,
    interpret: bool = False,
):
    """Chunked flash attention emitting its online-softmax statistics.

    q: (B, H, Sq, D) against k/v: (B, H, Skv, D) — a CHUNK of the full key
    space with ``vlen`` (traced int32 scalar) valid leading positions.
    Returns (o, m, l): the softmax-normalized output over this chunk plus
    per-row running max and denominator, in the exact form the ring-attention
    combiner merges across chunks (parallel/ring_attention.py) — the
    multi-chip composition of the same online softmax this kernel runs over
    kv tiles. A fully-masked chunk (vlen == 0) yields o = 0, l = 0,
    m = NEG_INF, which the combiner weights out.
    """
    b, h, sq_orig, d = q.shape
    skv_orig = k.shape[-2]
    if not q_blk or not kv_blk:
        auto_q, auto_kv = pick_flash_blocks(max(sq_orig, skv_orig), d, q.dtype.itemsize)
        q_blk = q_blk or auto_q
        kv_blk = kv_blk or auto_kv
    q = _pad_seq(q.reshape(b * h, sq_orig, d), q_blk)
    k = _pad_seq(k.reshape(b * h, skv_orig, d), kv_blk)
    v = _pad_seq(v.reshape(b * h, skv_orig, d), kv_blk)
    sq, sk = q.shape[-2], k.shape[-2]
    # Ring-size padding beyond the caller's vlen is masked identically.
    vlen = jnp.minimum(jnp.asarray(vlen, jnp.int32), skv_orig).reshape(1)

    grid = (b * h, sq // q_blk, sk // kv_blk)
    kernel = functools.partial(
        _flash_kernel, scale=scale, kv_blk=kv_blk, emit_stats=True
    )
    o, m, l = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, q_blk, d), lambda bh, qi, ki, vlen: (bh, qi, 0)),
                pl.BlockSpec((1, kv_blk, d), lambda bh, qi, ki, vlen: (bh, ki, 0)),
                pl.BlockSpec((1, kv_blk, d), lambda bh, qi, ki, vlen: (bh, ki, 0)),
            ],
            out_specs=(
                pl.BlockSpec((1, q_blk, d), lambda bh, qi, ki, vlen: (bh, qi, 0)),
                pl.BlockSpec((1, q_blk, 128), lambda bh, qi, ki, vlen: (bh, qi, 0)),
                pl.BlockSpec((1, q_blk, 128), lambda bh, qi, ki, vlen: (bh, qi, 0)),
            ),
            scratch_shapes=[
                pltpu.VMEM((q_blk, 128), jnp.float32),
                pltpu.VMEM((q_blk, 128), jnp.float32),
                pltpu.VMEM((q_blk, d), jnp.float32),
            ],
        ),
        out_shape=(
            # o in f32: the ring combiner accumulates chunk outputs across
            # n chips in f32 — rounding each chunk to the model dtype here
            # would compound ~sqrt(n) * 2^-9 bf16 noise per ring.
            jax.ShapeDtypeStruct((b * h, sq, d), jnp.float32),
            jax.ShapeDtypeStruct((b * h, sq, 128), jnp.float32),
            jax.ShapeDtypeStruct((b * h, sq, 128), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(vlen, q, k, v)
    o = o[:, :sq_orig].reshape(b, h, sq_orig, d)
    m = m[:, :sq_orig, :1].reshape(b, h, sq_orig, 1)
    l = l[:, :sq_orig, :1].reshape(b, h, sq_orig, 1)
    return o, m, l


@functools.partial(
    jax.jit, static_argnames=("scale", "q_blk", "kv_blk", "interpret")
)
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float,
    q_blk: int = 0,
    kv_blk: int = 0,
    interpret: bool = False,
) -> jnp.ndarray:
    """Full (non-causal) attention over (B, H, S, D) inputs.

    Returns (B, H, S, D) in the input dtype. fp32 softmax statistics and
    accumulation; QK^T and PV ride the MXU in the input precision.
    ``q_blk``/``kv_blk`` 0 = auto (pick_flash_blocks).
    """
    b, h, s, d = q.shape
    if not q_blk or not kv_blk:
        auto_q, auto_kv = pick_flash_blocks(s, d, q.dtype.itemsize)
        q_blk = q_blk or auto_q
        kv_blk = kv_blk or auto_kv
    orig_s = s
    q = _pad_seq(q.reshape(b * h, s, d), q_blk)
    k = _pad_seq(k.reshape(b * h, s, d), kv_blk)
    v = _pad_seq(v.reshape(b * h, s, d), kv_blk)
    sq = q.shape[-2]
    sk = k.shape[-2]

    grid = (b * h, sq // q_blk, sk // kv_blk)
    kernel = functools.partial(_flash_kernel, scale=scale, kv_blk=kv_blk)
    vlen = jnp.array([orig_s], dtype=jnp.int32)

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            # Index maps receive the scalar-prefetch ref as trailing arg.
            in_specs=[
                pl.BlockSpec((1, q_blk, d), lambda bh, qi, ki, vlen: (bh, qi, 0)),
                pl.BlockSpec((1, kv_blk, d), lambda bh, qi, ki, vlen: (bh, ki, 0)),
                pl.BlockSpec((1, kv_blk, d), lambda bh, qi, ki, vlen: (bh, ki, 0)),
            ],
            out_specs=pl.BlockSpec((1, q_blk, d), lambda bh, qi, ki, vlen: (bh, qi, 0)),
            scratch_shapes=[
                pltpu.VMEM((q_blk, 128), jnp.float32),
                pltpu.VMEM((q_blk, 128), jnp.float32),
                pltpu.VMEM((q_blk, d), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b * h, sq, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(vlen, q, k, v)

    return out[:, :orig_s, :].reshape(b, h, orig_s, d)
