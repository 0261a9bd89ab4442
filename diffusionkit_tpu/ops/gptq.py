"""GPTQ: Hessian-based error-compensated int4/int8 quantization for MMDiT.

Activation-aware quantization for the quantize-at-load modes (VERDICT round
4, task #3): the data-free ALS grid (ops/quantized._als_refine_host) fits
each weight group in isolation, charging every weight equally; GPTQ
(arXiv:2210.17323) instead minimises the LAYER OUTPUT error ||X(W - Ŵ)||²
under the calibration input distribution X — quantizing the contraction
dimension row by row and redistributing each row's rounding error onto the
not-yet-quantized rows through the Cholesky factor of the inverse input
Hessian H = XᵀX. Storage is UNCHANGED: the same MLX-affine
{q4, scales(f16), zeros(f16)[, wscale]} schema as quantize_kernel_host, so
every downstream consumer (ops/int4_matmul, ops/w4a8_matmul, dequant
fallback, TP sharding rules, disk cache) works untouched.

TPU-native execution: this box (like most TPU VMs used for serving) has
few host cores — a 12288² float64 inverse takes minutes on one core — so
the WHOLE quantizer runs on the accelerator. The calibration mirror, the
per-site Hessians (in-jit XᵀX), the H⁻¹ Cholesky, the group-serial GPTQ
recursion (a ``lax.scan`` over weight groups with an in-group row scan and
one tail GEMM per group) are all jitted; the host only packs nibbles and
assembles the tree. Layers stream one at a time — per-layer weight slices
are device_put on demand and every device buffer is layer-transient, so
12B-class models quantize within a few GB of HBM. A numpy reference
implementation (gptq_quantize_kernel) is kept as the parity oracle.

Calibration is self-contained (no text encoders needed at quantize time):
noisy latents on the sampler's sigma ladder with the reference's
numpy-NCHW noise convention, synthetic conditioning with the real layout
(SD3: CLIP rows padded 2048→4096 + zero T5 rows, matching use_t5=False;
FLUX: dense T5-shaped rows), and a dense (timestep × pooled) ladder for the
AdaLN site — every block's ada GEMV reads the SAME silu(c) vectors, so one
Hessian covers them all exactly. Sites whose inference-time input direction
is unknowable at quantize time (pooled CLIP outputs, prompt embeddings) get
their Hessians topped up to full rank with random rows, so GPTQ cannot park
error where a real prompt lands. The per-site inputs come from a float
"mirror" of the block forward (same ops: _ada/_qkv/modulated_layer_norm/
sdpa) executed layer by layer OUTSIDE lax.scan so the site activations are
observable; tests/test_gptq.py pins the mirror's output equal to
apply_mmdit so calibration cannot drift from the model.

Why this matters most for ada: the "-mixed" modes showed plain int4's
quality loss concentrates in the AdaLN GEMVs (their output error rescales
every token feature model-wide). GPTQ pushes ada's rounding error into the
subspace the (timestep × pooled) input manifold never excites — recovering
most of the mixed-mode quality without leaving the uniform-int4 contract.
"""

from __future__ import annotations

import functools
import gc
import logging
import os
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import MMDiTConfig, PositionalEncoding
from .common import linear, patchify, timestep_embedding, unpack_flux, unpatchify_sd3
from .norms import modulated_layer_norm
from .quantized import pack_int4_host, quantize_kernel_host

Params = Dict[str, Any]

logger = logging.getLogger(__name__)


def _layer_mem_trace(tag: str) -> None:
    """Per-layer HBM high-water trace (DIFFUSIONKIT_TPU_GPTQ_DEBUG=1).

    The streaming quantizer's contract is layer-transient device buffers;
    this makes a violation observable on-chip (each call is a device-stats
    RPC on relay-attached setups, so it stays opt-in)."""
    if os.environ.get("DIFFUSIONKIT_TPU_GPTQ_DEBUG", "0") != "1":
        return
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        logger.info(
            "gptq[%s] bytes_in_use=%.2fGB peak=%.2fGB", tag,
            stats.get("bytes_in_use", 0) / 2**30,
            stats.get("peak_bytes_in_use", 0) / 2**30,
        )
    except Exception:
        pass

# Minimum kernel size / divisibility rules MUST match ops/quantized.quantize_tree
# so the GPTQ tree is a drop-in for the ALS tree.
MIN_SIZE = 1 << 16
# Narrow-mat exclusion — see ops/quantized.MIN_DIM for the rationale and the
# measured quality numbers.
MIN_DIM = 256

# Host-side best-of-both guard only below this contraction dim: the guard's
# H-weighted error is an O(in²·out) host GEMM — cheap for the small
# embedder mats it exists for (near-isotropic white-noise inputs, where
# compensation buys nothing), prohibitive on this box's single core for the
# block mats (whose oversampled Hessians make GPTQ reliably ≥ ALS).
GUARD_MAX_IN = 512


# ---------------------------------------------------------------------------
# Core GPTQ kernel quantizer — numpy reference (parity oracle + fallback)
# ---------------------------------------------------------------------------


def _fit_group_grid(g: np.ndarray, qmax: int, iters: int = 8):
    """ALS affine-grid fit for one group slab g (gs, out) — the same
    alternating refinement as quantized._als_refine_host, specialised to a
    single group and returning f32 (scale, zero) rounded through f16 (the
    storage dtype)."""
    n = np.float32(g.shape[0])
    wmin, wmax = g.min(axis=0), g.max(axis=0)
    sw = g.sum(axis=0)
    s = np.maximum((wmax - wmin) / qmax, 1e-8)
    z = wmin
    best_s, best_z = s.copy(), z.copy()
    best_e = np.full(s.shape, np.inf, np.float32)
    for it in range(iters + 1):
        q = np.clip(np.round((g - z[None]) / s[None]), 0, qmax)
        e = ((s[None] * q + z[None] - g) ** 2).sum(axis=0)
        better = e < best_e
        best_s = np.where(better, s, best_s)
        best_z = np.where(better, z, best_z)
        best_e = np.where(better, e, best_e)
        if it == iters:
            break
        sq = q.sum(axis=0)
        sqq = (q * q).sum(axis=0)
        swq = (g * q).sum(axis=0)
        denom = n * sqq - sq * sq
        s_new = (n * swq - sq * sw) / np.where(denom > 1e-10, denom, 1.0)
        accept = (denom > 1e-10) & (s_new > 1e-8)
        s = np.where(accept, s_new, s).astype(np.float32)
        z = np.where(accept, (sw - s_new * sq) / n, z).astype(np.float32)
    best_s = np.maximum(best_s.astype(np.float16).astype(np.float32), 6.1e-8)
    best_z = best_z.astype(np.float16).astype(np.float32)
    return best_s, best_z


def gptq_quantize_kernel(
    w: np.ndarray,
    H: np.ndarray,
    bits: int = 4,
    group_size: int = 32,
    damp: float = 0.01,
    with_wscale: bool = False,
    panel: int = 128,
) -> Params:
    """GPTQ-quantize one (in, out) kernel given its input Hessian H (in, in).

    numpy reference of the jitted device core (_gptq_core) — same algorithm:
    row order = input (contraction) dimension, matching the group-affine
    storage layout (scales/zeros per (in/gs, out)). Per row i:
      err_i = (w_i - dequant(q_i)) / U_ii ;  w_{j>i} -= U_ij · err_i
    with U the upper Cholesky factor of H⁻¹ (arXiv:2210.17323 Alg. 1,
    blocked). Grids are ALS-fit per group from the error-compensated rows at
    each group boundary.
    """
    in_dim, out_dim = w.shape
    assert in_dim % group_size == 0
    qmax = 2**bits - 1
    w = np.array(w, dtype=np.float32, copy=True)

    Hd = np.array(H, dtype=np.float64, copy=True)
    diag = np.diag(Hd).copy()
    dead = diag <= 0
    if dead.any():
        Hd[dead, dead] = 1.0
        w[dead] = 0.0
    Hd[np.arange(in_dim), np.arange(in_dim)] += damp * max(
        float(diag.mean()), 1e-12
    )
    # U upper-triangular with H⁻¹ = UᵀU (torch cholesky(…, upper=True) form).
    try:
        Hinv = np.linalg.inv(Hd)
        # Symmetrise before Cholesky (inv() is not exactly symmetric).
        Hinv = (Hinv + Hinv.T) * 0.5
        U = np.linalg.cholesky(Hinv).T.astype(np.float32)
    except np.linalg.LinAlgError:
        # Degenerate H even after damping — fall back to the data-free grid.
        return quantize_kernel_host(w, bits, group_size, with_wscale=with_wscale)

    n_groups = in_dim // group_size
    Q = np.empty((in_dim, out_dim), np.uint8)
    scales = np.empty((n_groups, out_dim), np.float32)
    zeros = np.empty((n_groups, out_dim), np.float32)
    panel = max(group_size, (panel // group_size) * group_size)

    for p0 in range(0, in_dim, panel):
        p1 = min(p0 + panel, in_dim)
        err = np.empty((p1 - p0, out_dim), np.float32)
        for i in range(p0, p1):
            gi, ri = divmod(i, group_size)
            if ri == 0:
                s_g, z_g = _fit_group_grid(w[i : i + group_size], qmax)
                scales[gi], zeros[gi] = s_g, z_g
            q = np.clip(
                np.round((w[i] - zeros[gi]) / scales[gi]), 0, qmax
            )
            Q[i] = q.astype(np.uint8)
            e = (w[i] - (scales[gi] * q + zeros[gi])) / U[i, i]
            if i + 1 < p1:
                w[i + 1 : p1] -= U[i, i + 1 : p1, None] * e[None]
            err[i - p0] = e
        if p1 < in_dim:
            w[p1:] -= U[p0:p1, p1:].T @ err

    return _emit(Q, scales, zeros, bits, group_size, with_wscale)


def _emit(Q, scales, zeros, bits, group_size, with_wscale) -> Params:
    """Pack (Q, scales, zeros) into the quantize_kernel_host schema."""
    out: Params = {
        "scales": np.asarray(scales).astype(np.float16),
        "zeros": np.asarray(zeros).astype(np.float16),
    }
    Q = np.asarray(Q)
    if bits == 4:
        out["q4"] = pack_int4_host(Q)
    else:
        out["q8"] = Q
    if with_wscale:
        deq = Q.astype(np.float32) * np.repeat(
            out["scales"].astype(np.float32), group_size, axis=0
        )
        deq += np.repeat(out["zeros"].astype(np.float32), group_size, axis=0)
        out["wscale"] = (
            np.maximum(np.abs(deq).max(0), 1e-8) / 127.0
        ).astype(np.float32)
    return out


# ---------------------------------------------------------------------------
# Core GPTQ kernel quantizer — jitted device implementation
# ---------------------------------------------------------------------------


def _fit_grid_jax(g: jnp.ndarray, qmax: int, iters: int = 8):
    """In-jit ALS grid fit for one (gs, out) group slab (float-level mirror
    of _fit_group_grid; f16-rounded winning grid)."""
    n = jnp.float32(g.shape[0])
    wmin, wmax = g.min(axis=0), g.max(axis=0)
    sw = g.sum(axis=0)
    s = jnp.maximum((wmax - wmin) / qmax, 1e-8)
    z = wmin
    best_s, best_z = s, z
    best_e = jnp.full(s.shape, jnp.inf, jnp.float32)
    for it in range(iters + 1):
        q = jnp.clip(jnp.round((g - z[None]) / s[None]), 0, qmax)
        e = ((s[None] * q + z[None] - g) ** 2).sum(axis=0)
        better = e < best_e
        best_s = jnp.where(better, s, best_s)
        best_z = jnp.where(better, z, best_z)
        best_e = jnp.where(better, e, best_e)
        if it == iters:
            break
        sq = q.sum(axis=0)
        sqq = (q * q).sum(axis=0)
        swq = (g * q).sum(axis=0)
        denom = n * sqq - sq * sq
        s_new = (n * swq - sq * sw) / jnp.where(denom > 1e-10, denom, 1.0)
        accept = (denom > 1e-10) & (s_new > 1e-8)
        s = jnp.where(accept, s_new, s)
        z = jnp.where(accept, (sw - s_new * sq) / n, z)
    best_s = jnp.maximum(
        best_s.astype(jnp.float16).astype(jnp.float32), 6.1e-8
    )
    best_z = best_z.astype(jnp.float16).astype(jnp.float32)
    return best_s, best_z


@functools.lru_cache(maxsize=None)
def _gptq_core(in_dim: int, out_dim: int, gs: int, qmax: int,
               damp: float = 0.01):
    """Build the jitted device GPTQ core for one kernel shape.

    The recursion runs as a ``lax.scan`` over weight groups: ALS grid fit,
    an inner row scan with in-group compensation, then ONE (in × gs × out)
    GEMM pushing the group's error onto all remaining rows — the blocked
    form of GPTQ Alg. 1 with panel == group. All matrix work (inverse,
    Cholesky, updates) happens on the device; a degenerate Cholesky
    (non-PSD after f32 round-off) degrades U to the identity, which reduces
    the algorithm to the plain per-group ALS grid rather than failing.
    """
    n_groups = in_dim // gs
    iota_gs = jnp.arange(gs)
    iota_in = jnp.arange(in_dim)

    def fn(w: jnp.ndarray, H: jnp.ndarray):
        w = w.astype(jnp.float32)
        H = H.astype(jnp.float32)
        diag = jnp.diagonal(H)
        dead = diag <= 0
        H = H + jnp.diag(jnp.where(dead, 1.0 - diag, 0.0))
        w = jnp.where(dead[:, None], 0.0, w)
        eye = jnp.eye(in_dim, dtype=jnp.float32)
        H = H + (damp * jnp.maximum(jnp.mean(diag), 1e-12)) * eye
        # U upper with H⁻¹ = UᵀU, built WITHOUT inv(): flip(H) = PHP (P the
        # anti-identity) has Cholesky L̃L̃ᵀ; Ũ = PL̃P is upper with H = ŨŨᵀ,
        # so U = Ũ⁻¹ (upper, one triangular solve) gives H⁻¹ = Ũ⁻ᵀŨ⁻¹ = UᵀU
        # — same U as numpy's cholesky(inv(H)).T by Cholesky uniqueness.
        # jnp.linalg.inv's LU path lowers to the LuDecompositionBlock custom
        # call whose f32[in,128] panel tuple exceeds v5e's 16 MB scoped VMEM
        # at in_dim ≥ ~12288 (FLUX fc2 — the e2e-observed compile failure);
        # cholesky/triangular_solve expand to blocked HLO loops instead.
        Ut = jnp.linalg.cholesky(H[::-1, ::-1])[::-1, ::-1]
        U = jax.scipy.linalg.solve_triangular(Ut, eye, lower=False)
        ok = jnp.all(jnp.isfinite(U))
        U = jnp.where(ok, U, eye)

        def gbody(w, gi):
            g0 = gi * gs
            wg = jax.lax.dynamic_slice(w, (g0, 0), (gs, out_dim))
            s, z = _fit_grid_jax(wg, qmax)
            ublk = jax.lax.dynamic_slice(U, (g0, 0), (gs, in_dim))
            ugg = jax.lax.dynamic_slice(ublk, (0, g0), (gs, gs))
            dvals = jnp.take_along_axis(
                ugg, iota_gs[:, None], axis=1
            )[:, 0]

            def rbody(carry, i):
                wg, err = carry
                wi = jax.lax.dynamic_index_in_dim(wg, i, 0, keepdims=False)
                q = jnp.clip(jnp.round((wi - z) / s), 0, qmax)
                e = (wi - (s * q + z)) / dvals[i]
                urow = jax.lax.dynamic_index_in_dim(ugg, i, 0, keepdims=False)
                mask = (iota_gs > i).astype(jnp.float32)
                wg = wg - (urow * mask)[:, None] * e[None, :]
                err = jax.lax.dynamic_update_slice(err, e[None], (i, 0))
                return (wg, err), q

            (wg, err), qg = jax.lax.scan(
                rbody, (wg, jnp.zeros((gs, out_dim), jnp.float32)), iota_gs
            )
            # Tail update: only columns (= input rows) past this group; U's
            # triangularity already zeroes everything before it.
            um = ublk * (iota_in[None, :] >= g0 + gs).astype(jnp.float32)
            w = w - um.T @ err
            return w, (qg, s.astype(jnp.float16), z.astype(jnp.float16))

        _, (Q, S, Z) = jax.lax.scan(gbody, w, jnp.arange(n_groups))
        return Q.reshape(in_dim, out_dim).astype(jnp.uint8), S, Z

    return jax.jit(fn)


def gptq_quantize_kernel_jax(
    w, H, bits: int = 4, group_size: int = 32, with_wscale: bool = False,
) -> Params:
    """Device-executed GPTQ for one kernel. ``w``/``H`` may be host or
    device arrays (any float dtype); returns the host param dict."""
    in_dim, out_dim = w.shape
    assert in_dim % group_size == 0
    fn = _gptq_core(in_dim, out_dim, group_size, 2**bits - 1)
    Q, S, Z = fn(jnp.asarray(w), jnp.asarray(H))
    return _emit(
        np.asarray(Q), np.asarray(S), np.asarray(Z), bits, group_size,
        with_wscale,
    )


# ---------------------------------------------------------------------------
# Calibration inputs
# ---------------------------------------------------------------------------


def calib_batch(
    config: MMDiTConfig, batch: int = 48, latent_hw: Tuple[int, int] = (32, 32),
    seed: int = 0,
) -> Dict[str, np.ndarray]:
    """Self-contained calibration batch (host numpy, f32).

    Latents follow the pipeline's trajectory start: sigma-scaled NCHW numpy
    noise (the reference's noise convention, mlx/__init__.py:553-557) on a
    sigma ladder spanning the denoise schedule; the empty txt2img latent
    processes to ~0 under the latent formats so x0 = 0. Conditioning mirrors
    the real layout per family: SD3 rows = 77 CLIP rows with dims ≥ 2048
    zero-padded plus 77 all-zero T5 rows (the use_t5=False serving layout);
    FLUX rows = 256 dense T5-shaped rows.
    """
    rs = np.random.RandomState(seed)
    h, w = latent_hw
    c_lat = config.vae_latent_dim
    sigmas = np.array([1.0, 0.85, 0.66, 0.45, 0.25, 0.08], np.float32)
    sig = sigmas[np.arange(batch) % len(sigmas)]
    noise = rs.randn(batch, c_lat, h, w).astype(np.float32)
    latent = sig[:, None, None, None] * noise.transpose(0, 2, 3, 1)

    d_txt = config.token_level_text_embed_dim
    if config.depth_unified > 0:
        t_len = 256
        cond = rs.randn(batch, t_len, d_txt).astype(np.float32)
    else:
        t_len = 154
        cond = np.zeros((batch, t_len, d_txt), np.float32)
        cond[:, :77, : min(2048, d_txt)] = rs.randn(
            batch, 77, min(2048, d_txt)
        )
    pooled = rs.randn(batch, config.pooled_text_embed_dim).astype(np.float32)
    return {
        "latent": latent,
        "cond": cond,
        "pooled": pooled,
        "t": (sig * 1000.0).astype(np.float32),
    }


# ---------------------------------------------------------------------------
# Float mirror of the MMDiT forward (site-observable; parity-pinned in tests)
# ---------------------------------------------------------------------------


def _site_h(x: jnp.ndarray) -> jnp.ndarray:
    """Input Hessian XᵀX of one site's activations (f32, stays on device)."""
    x = x.astype(jnp.float32).reshape(-1, x.shape[-1])
    return x.T @ x


def _mirror_prologue(params, config: MMDiTConfig, latent, cond, pooled, t,
                     guidance=None):
    """Embedding prologue, mirroring models/mmdit._apply_mmdit_body:406-447
    with float math. Returns (x, txt, c, H_patch)."""
    from .common import mlp_silu

    p = config.patch_size
    patch = patchify(latent, p)
    x = linear(params["x_embedder"], patch)
    if config.pos_embed_type == PositionalEncoding.LearnedInputEmbedding:
        lh, lw = latent.shape[1] // p, latent.shape[2] // p
        maxhw = int(round(params["pos_embed"].shape[-2] ** 0.5))
        y0, x0 = (maxhw - lh) // 2, (maxhw - lw) // 2
        pos = params["pos_embed"].reshape(maxhw, maxhw, config.hidden_size)
        x = x + pos[y0 : y0 + lh, x0 : x0 + lw].reshape(1, lh * lw, -1).astype(
            x.dtype
        )
    txt = linear(params["context_embedder"], cond)
    t_emb = mlp_silu(
        params["t_embedder"],
        timestep_embedding(t, config.frequency_embed_dim, config.max_period),
    )
    y_emb = mlp_silu(params["y_embedder"], pooled)
    c = t_emb + y_emb
    if config.guidance_embed:
        if guidance is None:
            guidance = jnp.full((latent.shape[0],), 3.5, jnp.float32)
        c = c + mlp_silu(
            params["guidance_embedder"],
            timestep_embedding(
                guidance, config.frequency_embed_dim, config.max_period
            ),
        )
    return x, txt, c, _site_h(patch)


def _mirror_mm_layer(bp, img, txt, c, rope, config: MMDiTConfig,
                     final_skip_text: bool = False):
    """Float dual-stream block, site-observable (mirrors models/mmdit._mm_block
    :227-307 exactly — pinned by tests/test_gptq.py mirror-parity). Returns
    (img', txt', {site: input Hessian})."""
    from ..models.mmdit import _ada, _merge_heads, _qkv
    from ..ops.attention import sdpa
    from ..ops.rope import apply_rope

    eps = config.layer_norm_eps
    img_mods = _ada(bp["img"], c, 6)
    txt_mods = _ada(bp["txt"], c, 2 if final_skip_text else 6)
    img_h = modulated_layer_norm(img, img_mods[0], img_mods[1], eps)
    txt_h = modulated_layer_norm(txt, txt_mods[0], txt_mods[1], eps)
    img_len, txt_len = img.shape[1], txt.shape[1]

    if config.depth_unified > 0:
        rope_img = None
        if rope is not None:
            cos, sin = rope
            rope_img = (cos[txt_len:], sin[txt_len:])
        q_i, k_i, v_i = _qkv(bp["img"], img_h, config, rope_img)
        q_t, k_t, v_t = _qkv(bp["txt"], txt_h, config)
        q = jnp.concatenate([q_t, q_i], axis=1)
        k = jnp.concatenate([k_t, k_i], axis=1)
        v = jnp.concatenate([v_t, v_i], axis=1)
    else:
        q_i, k_i, v_i = _qkv(bp["img"], img_h, config)
        q_t, k_t, v_t = _qkv(bp["txt"], txt_h, config)
        q = jnp.concatenate([q_i, q_t], axis=1)
        k = jnp.concatenate([k_i, k_t], axis=1)
        v = jnp.concatenate([v_i, v_t], axis=1)
        if rope is not None:
            cos, sin = rope
            q = apply_rope(q, cos[:, None, :], sin[:, None, :])
            k = apply_rope(k, cos[:, None, :], sin[:, None, :])

    o = _merge_heads(
        sdpa(q, k, v, scale=1.0 / (config.head_dim**0.5), impl="xla",
             layout="bshd")
    )
    if config.depth_unified > 0:
        o_txt, o_img = o[:, :txt_len], o[:, txt_len:]
    else:
        o_img, o_txt = o[:, :img_len], o[:, img_len:]

    img2 = img + img_mods[2] * linear(bp["img"]["o"], o_img)
    h2_img = modulated_layer_norm(img2, img_mods[3], img_mods[4], eps)
    g_img = linear(bp["img"]["fc1"], h2_img, act="gelu")
    img3 = img2 + img_mods[5] * linear(bp["img"]["fc2"], g_img)

    sites = {
        "img_qkv": _site_h(img_h), "txt_qkv": _site_h(txt_h),
        "img_o": _site_h(o_img), "img_fc1": _site_h(h2_img),
        "img_fc2": _site_h(g_img),
    }
    if final_skip_text:
        return img3, txt, sites
    txt2 = txt + txt_mods[2] * linear(bp["txt"]["o"], o_txt)
    h2_txt = modulated_layer_norm(txt2, txt_mods[3], txt_mods[4], eps)
    g_txt = linear(bp["txt"]["fc1"], h2_txt, act="gelu")
    txt3 = txt2 + txt_mods[5] * linear(bp["txt"]["fc2"], g_txt)
    sites.update({
        "txt_o": _site_h(o_txt), "txt_fc1": _site_h(h2_txt),
        "txt_fc2": _site_h(g_txt),
    })
    return img3, txt3, sites


def _mirror_uni_layer(bp, u, c, rope, config: MMDiTConfig):
    """Float single-stream (parallel-MLP) block, site-observable (mirrors
    models/mmdit._unified_block:310-339)."""
    from ..models.mmdit import _ada, _merge_heads, _qkv
    from ..ops.attention import sdpa

    assert config.parallel_mlp_for_unified_blocks
    eps = config.layer_norm_eps
    mods = _ada(bp, c, 3)
    h = modulated_layer_norm(u, mods[0], mods[1], eps)
    q, k, v = _qkv(bp, h, config, rope)
    o = _merge_heads(
        sdpa(q, k, v, scale=1.0 / (config.head_dim**0.5), impl="xla",
             layout="bshd")
    )
    g = linear(bp["fc1"], h, act="gelu")
    out = u + mods[2] * (linear(bp["o"], o) + linear(bp["fc2"], g))
    # Parallel-MLP blocks: fc1 reads the same modulated-LN tensor as q/k/v
    # (models/mmdit._unified_block:334-335) — one Hessian serves both.
    sites = {"qkv": _site_h(h), "o": _site_h(o), "fc2": _site_h(g)}
    return out, sites


def _mirror_epilogue(params, config: MMDiTConfig, x, c, latent_hw):
    from ..models.mmdit import _ada

    shift, scale = _ada(params["final_layer"], c, 2)
    xh = modulated_layer_norm(x, shift, scale, config.layer_norm_eps)
    out = linear(params["final_layer"]["linear"], xh)
    p = config.patch_size
    if config.patchify_via_reshape:
        out = unpack_flux(out, latent_hw, p)
    else:
        out = unpatchify_sd3(out, latent_hw, p, config.vae_latent_dim)
    return out, _site_h(xh)


def mirror_forward(params, config: MMDiTConfig, latent, cond, pooled, t,
                   guidance=None):
    """Full mirror forward (no quantization) — the parity surface tests pin
    against models.apply_mmdit. Runs every layer through the same per-layer
    functions the quantizer uses."""
    from ..models.mmdit import tree_index
    from ..ops.rope import rope_frequencies

    latent = jnp.asarray(latent, jnp.float32)
    x, txt, c, _ = _mirror_prologue(
        params, config, latent, jnp.asarray(cond, jnp.float32),
        jnp.asarray(pooled, jnp.float32), jnp.asarray(t, jnp.float32),
        guidance,
    )
    rope = None
    if config.pos_embed_type != PositionalEncoding.LearnedInputEmbedding:
        p = config.patch_size
        rope = rope_frequencies(
            (latent.shape[1] // p, latent.shape[2] // p), txt.shape[1],
            config.rope_axes_dim, theta=10000,
        )
    n_uniform = config.depth_multimodal - (1 if config.depth_unified == 0 else 0)
    for i in range(n_uniform):
        bp = tree_index(params["mm_blocks"], i)
        x, txt, _ = _mirror_mm_layer(bp, x, txt, c, rope, config)
    if config.depth_unified == 0:
        x, _, _ = _mirror_mm_layer(
            params["mm_final"], x, txt, c, rope, config, final_skip_text=True
        )
    else:
        u = jnp.concatenate([txt, x], axis=1)
        for i in range(config.depth_unified):
            bp = tree_index(params["uni_blocks"], i)
            u, _ = _mirror_uni_layer(bp, u, c, rope, config)
        x = u[:, txt.shape[1] :]
    out, _ = _mirror_epilogue(
        params, config, x, c, (latent.shape[1], latent.shape[2])
    )
    return out


# ---------------------------------------------------------------------------
# Global-site Hessians (conditioning-vector ladder)
# ---------------------------------------------------------------------------


def _dense_c_hessians(params, config: MMDiTConfig, pooled: np.ndarray,
                      n_t: int = 64, seed: int = 17) -> Dict[str, jnp.ndarray]:
    """Hessians for the conditioning-vector sites: the t/y/guidance embedder
    MLPs and the shared AdaLN input silu(c). Every block's ada GEMV reads
    the SAME c rows, so one dense (timestep × pooled) ladder covers them
    all.

    The pooled direction at inference (a CLIP pooled output) is unknown at
    quantize time, so y_fc1's Hessian is topped up past full rank with
    random rows (a rank-deficient H here would park GPTQ's error exactly
    where a real prompt lands)."""
    H: Dict[str, jnp.ndarray] = {}
    ts = jnp.asarray(np.linspace(10.0, 1000.0, n_t).astype(np.float32))
    femb = timestep_embedding(ts, config.frequency_embed_dim, config.max_period)
    h1_t = jax.nn.silu(linear(params["t_embedder"]["fc1"], femb))
    temb = linear(params["t_embedder"]["fc2"], h1_t)
    d_pool = pooled.shape[-1]
    rs = np.random.RandomState(seed)
    extra = rs.randn(d_pool + 128, d_pool).astype(np.float32)
    pooled_j = jnp.asarray(
        np.concatenate([np.asarray(pooled, np.float32), extra]), jnp.float32
    )
    h1_y = jax.nn.silu(linear(params["y_embedder"]["fc1"], pooled_j))
    yemb = linear(params["y_embedder"]["fc2"], h1_y)
    # ada ladder: all timesteps × a pooled subsample (the full cross product
    # at d_pool+ rows would be quadratic for no added span).
    yemb_sub = yemb[:: max(1, yemb.shape[0] // 48)][:48]
    c_all = (temb[:, None, :] + yemb_sub[None, :, :]).reshape(
        -1, temb.shape[-1]
    )
    if config.guidance_embed:
        gs = jnp.asarray(np.linspace(1.0, 8.0, 8).astype(np.float32))
        gf = timestep_embedding(gs, config.frequency_embed_dim, config.max_period)
        h1_g = jax.nn.silu(linear(params["guidance_embedder"]["fc1"], gf))
        gemb = linear(params["guidance_embedder"]["fc2"], h1_g)
        c_all = (c_all[:, None, :] + gemb[None, :2, :]).reshape(
            -1, temb.shape[-1]
        )
        H["g_fc1"] = _site_h(gf)
        H["g_fc2"] = _site_h(h1_g)
    H["t_fc1"] = _site_h(femb)
    H["t_fc2"] = _site_h(h1_t)
    H["y_fc1"] = _site_h(pooled_j)
    H["y_fc2"] = _site_h(h1_y)
    H["ada"] = _site_h(jax.nn.silu(c_all))
    return H


# ---------------------------------------------------------------------------
# Streaming tree quantization
# ---------------------------------------------------------------------------


def _eligible(kernel, group_size: int) -> bool:
    return (
        kernel.ndim == 2
        and kernel.size >= MIN_SIZE
        and min(kernel.shape) >= MIN_DIM
        and kernel.shape[0] % group_size == 0
    )


def _dequant_host(p: Params, in_dim: int) -> np.ndarray:
    if "q4" in p:
        q4 = np.asarray(p["q4"])
        shifts = (np.arange(8, dtype=np.uint32) * 4)[None, :, None]
        q = ((q4[:, None, :] >> shifts) & np.uint32(0xF)).reshape(
            in_dim, -1
        ).astype(np.float32)
    else:
        q = np.asarray(p["q8"], np.float32)
    g = in_dim // p["scales"].shape[0]
    s = np.repeat(np.asarray(p["scales"], np.float32), g, axis=0)
    z = np.repeat(np.asarray(p["zeros"], np.float32), g, axis=0)
    return s * q + z


def _h_weighted_err(w: np.ndarray, p: Params, H: np.ndarray) -> float:
    d = w - _dequant_host(p, w.shape[0])
    return float(np.einsum("io,io->", d, H.astype(np.float32) @ d))


def _quantize_mat(
    p: Params, Hmat, bits: int, group_size: int, with_wscale: bool,
) -> Params:
    """Quantize one {"kernel","bias"} dict. ``Hmat`` may be a device array
    (preferred — the GPTQ core consumes it in place) or None (data-free ALS).
    """
    kernel = p["kernel"]
    if not _eligible(kernel, group_size):
        return jax.tree.map(
            lambda a: None if a is None else np.asarray(a), p,
            is_leaf=lambda x: x is None,
        )
    ws = with_wscale and bits == 4
    if Hmat is None:
        out = quantize_kernel_host(
            np.asarray(jax.device_get(kernel), np.float32), bits, group_size,
            with_wscale=ws,
        )
    else:
        out = gptq_quantize_kernel_jax(kernel, Hmat, bits, group_size,
                                       with_wscale=ws)
        if kernel.shape[0] <= GUARD_MAX_IN:
            # Best-of-both guard (small mats only — see GUARD_MAX_IN): on
            # near-isotropic input covariances (the x_embedder's white-noise
            # patches) compensation buys nothing and the within-group grid
            # drift can lose to the plain ALS fit.
            w_host = np.asarray(jax.device_get(kernel), np.float32)
            h_host = np.asarray(jax.device_get(Hmat), np.float32)
            als = quantize_kernel_host(w_host, bits, group_size,
                                       with_wscale=ws)
            if _h_weighted_err(w_host, als, h_host) < _h_weighted_err(
                w_host, out, h_host
            ):
                out = als
    out["bias"] = (
        None if p.get("bias") is None else np.asarray(p["bias"])
    )
    return out


def _quantize_mats_shared_h(
    named, Hmat, bits: int, group_size: int, with_wscale: bool,
) -> Dict[str, Params]:
    """GPTQ several {"kernel","bias"} mats that share one input-site Hessian
    as ONE core call on the column-concatenated kernel.

    The GPTQ recursion treats output columns independently given H (grid
    fit, error feedback and the tail GEMM are all per-column), so the
    concatenated result is bit-identical to separate calls — but it replaces
    N sequential group-scans with one wider scan, which matters at 12B scale
    where the latency-bound core dominates quantize-at-load time.
    """
    kernels = [jnp.asarray(p["kernel"]) for _, p in named]
    widths = [int(k.shape[1]) for k in kernels]
    cat = kernels[0] if len(kernels) == 1 else jnp.concatenate(kernels, axis=1)
    in_dim = int(cat.shape[0])
    fn = _gptq_core(in_dim, int(cat.shape[1]), group_size, 2**bits - 1)
    Q, S, Z = fn(cat, jnp.asarray(Hmat))
    Q, S, Z = np.asarray(Q), np.asarray(S), np.asarray(Z)
    out: Dict[str, Params] = {}
    c0 = 0
    for (name, p), w in zip(named, widths):
        res = _emit(Q[:, c0:c0 + w], S[:, c0:c0 + w], Z[:, c0:c0 + w],
                    bits, group_size, with_wscale)
        res["bias"] = (
            None if p.get("bias") is None else np.asarray(p["bias"])
        )
        out[name] = res
        c0 += w
    return out


def gptq_quantize_mmdit(
    params: Params,
    config: MMDiTConfig,
    bits: int = 4,
    group_size: int = 32,
    overrides: Optional[Dict[str, Any]] = None,
    with_wscale: bool = False,
    batch: int = 48,
    latent_hw: Tuple[int, int] = (32, 32),
    seed: int = 0,
) -> Params:
    """Quantize an MMDiT host tree with GPTQ (drop-in for
    ops/quantized.quantize_tree over the MMDiT schema; same output schema,
    same eligibility rules, same ``overrides`` semantics as MIXED_OVERRIDES).

    One streaming pass: each layer's weights are device_put, its mirror
    step runs (producing the per-site Hessians in-jit), its matrices are
    GPTQ-quantized on the device, the packed results come back to host and
    every device buffer is dropped before the next layer — peak HBM stays
    at one layer + carried activations regardless of model size.
    """
    from ..models.mmdit import tree_index
    from ..ops.rope import rope_frequencies

    data = calib_batch(config, batch=batch, latent_hw=latent_hw, seed=seed)
    overrides = overrides or {}
    dev = jax.devices()[0]

    def put(tree):
        return jax.tree.map(
            lambda a: jax.device_put(a, dev) if a is not None else None, tree
        )

    def mat_bits(name: str) -> Optional[int]:
        return overrides[name] if name in overrides else bits

    def q(p, Hmat, name):
        b = mat_bits(name)
        if b is None or not isinstance(p, dict) or "kernel" not in p:
            return jax.tree.map(
                lambda a: None if a is None else np.asarray(a), p,
                is_leaf=lambda x: x is None,
            )
        return _quantize_mat(p, Hmat, b, group_size, with_wscale)

    small = put({k: params[k] for k in (
        "x_embedder", "context_embedder", "t_embedder", "y_embedder",
        "final_layer",
    ) if k in params})
    if "pos_embed" in params:
        small["pos_embed"] = jax.device_put(params["pos_embed"], dev)
    if "guidance_embedder" in params:
        small["guidance_embedder"] = put(params["guidance_embedder"])

    latent = jnp.asarray(data["latent"], jnp.float32)
    cond = jnp.asarray(data["cond"], jnp.float32)
    pooled = jnp.asarray(data["pooled"], jnp.float32)
    t = jnp.asarray(data["t"], jnp.float32)

    prologue = jax.jit(
        lambda p, l, cd, pl, tt: _mirror_prologue(p, config, l, cd, pl, tt)
    )
    x, txt, c, H_patch = prologue(small, latent, cond, pooled, t)
    # Context-embedder Hessian: calibration rows + a top-up past full rank
    # over the ACTIVE dims (a real prompt's embedding direction is unknown
    # at quantize time). Rows keep the family's structured layout.
    d_txt = config.token_level_text_embed_dim
    active = d_txt if config.depth_unified > 0 else min(2048, d_txt)
    rs = np.random.RandomState(23)
    extra = np.zeros((active + 128, d_txt), np.float32)
    extra[:, :active] = rs.randn(active + 128, active)
    H_ctx = jax.jit(_site_h)(cond) + jax.jit(_site_h)(jnp.asarray(extra))
    Hc = _dense_c_hessians(small, config, data["pooled"])

    out: Params = {k: params[k] for k in params}
    out["x_embedder"] = q(params["x_embedder"], H_patch, "x_embedder")
    out["context_embedder"] = q(
        params["context_embedder"], H_ctx, "context_embedder"
    )
    for emb, pre in (("t_embedder", "t"), ("y_embedder", "y"),
                     ("guidance_embedder", "g")):
        if emb in params:
            out[emb] = {
                "fc1": q(params[emb]["fc1"], Hc.get(f"{pre}_fc1"), emb),
                "fc2": q(params[emb]["fc2"], Hc.get(f"{pre}_fc2"), emb),
            }
    H_ada = Hc["ada"]

    rope = None
    if config.pos_embed_type != PositionalEncoding.LearnedInputEmbedding:
        p = config.patch_size
        rope = rope_frequencies(
            (latent.shape[1] // p, latent.shape[2] // p), txt.shape[1],
            config.rope_axes_dim, theta=10000,
        )

    def q_branch(bp, Hs, pre: str, with_mlp: bool) -> Params:
        o: Params = {}
        for k_, v in bp.items():
            if k_ not in ("q", "k", "v", "o", "fc1", "fc2", "ada"):
                o[k_] = jax.tree.map(
                    lambda a: None if a is None else np.asarray(a), v,
                    is_leaf=lambda x: x is None,
                )
        H_qkv = Hs.get(f"{pre}qkv")
        # Mats sharing the qkv input site (q/k/v always; fc1 too in the
        # parallel-MLP unified blocks) quantize as ONE concatenated core
        # call — identical math (columns are independent given H), far
        # fewer sequential group-scans. Only past the best-of-both guard's
        # reach so small-model (test) results keep the guard semantics.
        shared = ["q", "k", "v"]
        fc1_shared = with_mlp and "fc1" in bp and f"{pre}fc1" not in Hs
        if fc1_shared:
            shared.append("fc1")

        def _concat_ok(name):
            p = bp.get(name)
            return (
                isinstance(p, dict) and "kernel" in p
                and mat_bits(name) == bits
                and _eligible(p["kernel"], group_size)
                and p["kernel"].shape[0] > GUARD_MAX_IN
            )

        if H_qkv is not None and all(_concat_ok(n) for n in shared):
            o.update(_quantize_mats_shared_h(
                [(n, bp[n]) for n in shared], H_qkv, bits, group_size,
                with_wscale,
            ))
        else:
            for n in shared:
                o[n] = q(bp[n], H_qkv, n)
        o["ada"] = q(bp["ada"], H_ada, "ada")
        if with_mlp and "o" in bp:
            o["o"] = q(bp["o"], Hs.get(f"{pre}o"), "o")
            if not fc1_shared and "fc1" in bp:
                o["fc1"] = q(bp["fc1"], Hs.get(f"{pre}fc1", H_qkv), "fc1")
            o["fc2"] = q(bp["fc2"], Hs.get(f"{pre}fc2"), "fc2")
        return o

    def stack_layers(per: List[Params]) -> Params:
        def join(*leaves):
            if leaves[0] is None:
                return None
            return np.stack([np.asarray(l) for l in leaves])

        return jax.tree.map(join, *per, is_leaf=lambda x: x is None)

    mm_step = jax.jit(
        lambda bp, img, tx, cc: _mirror_mm_layer(bp, img, tx, cc, rope, config)
    )
    n_uniform = config.depth_multimodal - (1 if config.depth_unified == 0 else 0)
    mm_layers = []
    for i in range(n_uniform):
        bp = put(tree_index(params["mm_blocks"], i))
        x, txt, Hs = mm_step(bp, x, txt, c)
        mm_layers.append({
            "img": q_branch(bp["img"],
                            {k: v for k, v in Hs.items()
                             if k.startswith("img_")}, "img_", True),
            "txt": q_branch(bp["txt"],
                            {k: v for k, v in Hs.items()
                             if k.startswith("txt_")}, "txt_", True),
        })
        del bp, Hs
        gc.collect()  # layer-transient contract: drop relay-deferred buffers
        _layer_mem_trace(f"mm{i}")
    out["mm_blocks"] = stack_layers(mm_layers)

    if config.depth_unified == 0:
        bp = put(params["mm_final"])
        final_step = jax.jit(
            lambda b, img, tx, cc: _mirror_mm_layer(
                b, img, tx, cc, rope, config, final_skip_text=True
            )
        )
        x, _, Hs = final_step(bp, x, txt, c)
        out["mm_final"] = {
            "img": q_branch(bp["img"],
                            {k: v for k, v in Hs.items()
                             if k.startswith("img_")}, "img_", True),
            "txt": q_branch(bp["txt"],
                            {k: v for k, v in Hs.items()
                             if k.startswith("txt_")}, "txt_", False),
        }
        del bp, Hs
    else:
        u = jnp.concatenate([txt, x], axis=1)
        uni_step = jax.jit(
            lambda bp, uu, cc: _mirror_uni_layer(bp, uu, cc, rope, config)
        )
        uni_layers = []
        for i in range(config.depth_unified):
            bp = put(tree_index(params["uni_blocks"], i))
            u, Hs = uni_step(bp, u, c)
            uni_layers.append(q_branch(bp, Hs, "", True))
            del bp, Hs
            gc.collect()
            _layer_mem_trace(f"uni{i}")
        out["uni_blocks"] = stack_layers(uni_layers)
        x = u[:, txt.shape[1] :]

    epi = jax.jit(
        lambda p, xx, cc: _mirror_epilogue(
            p, config, xx, cc, (latent.shape[1], latent.shape[2])
        )
    )
    _, H_final = epi(small, x, c)
    out["final_layer"] = {
        "ada": q(params["final_layer"]["ada"], H_ada, "ada"),
        "linear": q(params["final_layer"]["linear"], H_final, "final_layer"),
    }
    if "final_layer" in overrides and overrides["final_layer"] is None:
        out["final_layer"] = params["final_layer"]
    return out
