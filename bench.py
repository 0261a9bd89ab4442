"""Benchmark harness. Prints ONE JSON line with the headline metric.

Default headline (BASELINE.md config 1): SD3-medium (2B MMDiT) 512x512,
CFG 5.0 — denoise ms/step on one chip, plus derived 50-step s/image,
images/min/chip, and an HONEST MFU computed from branch-weighted analytic
FLOPs (diffusionkit_tpu/flops.py — a dual-stream block's projections see
only their own branch's tokens; charging full params against all tokens
over-counts ~2x at SD3 shapes).

``BENCH_MODEL=flux-int4`` switches to the BASELINE north-star config:
FLUX.1-schnell 12B (int4 weight-only so it fits one 16 GB v5e), 4-step
1024x1024 s/image. That run spends ~10 min in remote compilation, so the
default stays SD3. ``BENCH_MODEL=sd3-e2e`` measures the full pipeline
(text encode + scan denoise + VAE decode) against the local checkpoint
mirror when present.

The reference publishes no benchmark numbers (SURVEY.md §6; BASELINE.json
``published: {}``); ``vs_baseline`` is measured against a fixed budget:
100 ms/step for SD3, 2.0 s/image for FLUX (the BASELINE v5p target).
>1 means faster than target.
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

NUM_STEPS_TIMED = 20


def _chain_time(step, x0, n):
    """Chained-step timing with a device->host transfer as the sync point
    (block_until_ready through the axon relay can return early — see
    .claude/skills/verify)."""
    x = step(x0, 0)
    _ = np.asarray(x)  # compile + sync
    t0 = time.perf_counter()
    for i in range(n):
        x = step(x, 1 + i)
    _ = np.asarray(x)
    return (time.perf_counter() - t0) / n


def _scan_time(params, x0, config, cond, pooled, cfg, cfg_on, n, repeats=2):
    """Time the production denoise path: the whole schedule as ONE jitted
    ``lax.scan`` (``DiffusionPipeline(use_scan=True)`` — the default).

    Per-step jit dispatch through this box's axon relay costs ~6 ms/step of
    pure host latency that the shipping scan path never pays (BENCH_r03:
    37.9 ms/step walled vs 31.8 ms/step device-busy in the XLA profile);
    chaining ``repeats`` scan dispatches and syncing once at the end makes
    the wall clock match device time to <1 ms/step."""
    from diffusionkit_tpu.pipeline import _denoise_scan

    sigmas = jnp.asarray(np.linspace(1.0, 0.0, n + 1).astype(np.float32))

    def run(x):
        return _denoise_scan(
            params, x, sigmas, cond, pooled, cfg, None, config, cfg_on, None
        )

    x = run(x0)
    _ = np.asarray(x)  # compile + sync
    t0 = time.perf_counter()
    for _i in range(repeats):
        x = run(x)
    _ = np.asarray(x)
    return (time.perf_counter() - t0) / (n * repeats)


def _mfu(flops_per_step: float, ms: float):
    from diffusionkit_tpu.flops import device_peak_flops

    peak = device_peak_flops(str(jax.devices()[0]))
    achieved = flops_per_step / (ms / 1e3)
    return round(achieved / 1e12, 1), (round(achieved / peak, 3) if peak else None)


def bench_sd3():
    from diffusionkit_tpu.config import SD3_2b
    from diffusionkit_tpu.flops import mmdit_step_flops
    from diffusionkit_tpu.models import init_mmdit_params
    from diffusionkit_tpu.pipeline import _denoise_step

    config = SD3_2b
    params = init_mmdit_params(jax.random.PRNGKey(0), config)
    jax.block_until_ready(params)

    latent = jnp.asarray(np.random.RandomState(0).randn(1, 64, 64, 16), jnp.float32)
    cond = jnp.zeros((2, 154, 4096), config.dtype)
    pooled = jnp.zeros((2, 2048), config.dtype)
    sigmas = np.linspace(1.0, 0.0, NUM_STEPS_TIMED + 2).astype(np.float32)

    def step(x, i):
        return _denoise_step(
            params, x,
            jnp.asarray(sigmas[i], jnp.float32), jnp.asarray(sigmas[i + 1], jnp.float32),
            cond, pooled, jnp.asarray(5.0, jnp.float32), None, config, True, None,
        )

    cfg = jnp.asarray(5.0, jnp.float32)
    # The driver runs bench.py COLD-CACHE under a hard timeout; the default
    # run compiles exactly ONE program (the shipping use_scan path).
    # BENCH_PER_STEP=1 additionally times the per-step dispatch chain (a
    # second compile — builder diagnostics only; round 4's always-on second
    # compile blew the driver budget, BENCH_r04.json rc=124).
    per_step_ms = None
    if os.environ.get("BENCH_PER_STEP", "0") == "1":
        # Per-step chain FIRST: the scan path donates the latent buffer.
        per_step_ms = _chain_time(step, latent, NUM_STEPS_TIMED) * 1000
        latent = jnp.asarray(
            np.random.RandomState(0).randn(1, 64, 64, 16), jnp.float32
        )
    ms = _scan_time(params, latent, config, cond, pooled, cfg, True,
                    NUM_STEPS_TIMED) * 1000
    s_image = ms * 50 / 1000  # 50-step headline config
    flops = mmdit_step_flops(config, (64, 64), 154, cfg=True)["total"]
    tflops, mfu = _mfu(flops, ms)
    extra = {
        "s_per_image_50step": round(s_image, 3),
        "images_per_min_per_chip": round(60.0 / s_image, 3),
        "step_tflop": round(flops / 1e12, 2),
        "achieved_tflops": tflops,
        "mfu": mfu,
        "timed_steps": NUM_STEPS_TIMED,
        "timing_path": "use_scan whole-schedule (pipeline default)",
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
    }
    if per_step_ms is not None:
        extra["per_step_dispatch_ms"] = round(per_step_ms, 2)
    return {
        "metric": "sd3_medium_512_cfg_denoise_ms_per_step",
        "value": round(ms, 2),
        "unit": "ms",
        "vs_baseline": round(100.0 / ms, 3),
        "extra": extra,
    }


def bench_flux_int4(mode: str = "int4"):
    from diffusionkit_tpu.config import FLUX_SCHNELL
    from diffusionkit_tpu.flops import mmdit_step_flops
    from diffusionkit_tpu.models import init_mmdit_params

    config = FLUX_SCHNELL
    params = init_mmdit_params(jax.random.PRNGKey(0), config, quantize_bits=4)
    if mode == "w4a8":
        from diffusionkit_tpu.ops.w4a8_matmul import add_wscale_bound_tree

        params = add_wscale_bound_tree(params)
    jax.block_until_ready(params)

    latent = jnp.asarray(np.random.RandomState(0).randn(1, 128, 128, 16), jnp.float32)
    cond = jnp.zeros((1, 256, 4096), config.dtype)
    pooled = jnp.zeros((1, 768), config.dtype)

    n = max(NUM_STEPS_TIMED // 2, 8)
    ms = _scan_time(params, latent, config, cond, pooled,
                    jnp.asarray(0.0, jnp.float32), False, n) * 1000
    s_image = ms * 4 / 1000  # 4-step schnell
    flops = mmdit_step_flops(config, (128, 128), 256, cfg=False)["total"]
    tflops, mfu = _mfu(flops, ms)
    return {
        "metric": f"flux_schnell_{mode}_1024_s_per_image_4step",
        "value": round(s_image, 3),
        "unit": "s",
        "vs_baseline": round(2.0 / s_image, 3),
        "extra": {
            "denoise_ms_per_step": round(ms, 2),
            "step_tflop": round(flops / 1e12, 2),
            "achieved_tflops": tflops,
            "mfu_vs_bf16_peak": mfu,
            "timed_steps": n,
            "weights": {
                "int4": "int4 weight-only (12B on one chip)",
                "w4a8": "int4 packed + in-kernel int8 requant on the int8 MXU",
            }[mode],
            "backend": jax.default_backend(),
            "device": str(jax.devices()[0]),
        },
    }


def bench_flux_2048():
    """FLUX w4a8 step at 2048² (s = 16384 image + 256 text tokens): pins the
    long-sequence STREAMING flash path (s > the single-kv-tile cap) that the
    headline 1024² shapes never exercise (VERDICT round 2, Weak #2)."""
    from diffusionkit_tpu.config import FLUX_SCHNELL
    from diffusionkit_tpu.flops import mmdit_step_flops
    from diffusionkit_tpu.models import init_mmdit_params
    from diffusionkit_tpu.ops.flash_attention import pick_flash_blocks
    from diffusionkit_tpu.ops.w4a8_matmul import add_wscale_bound_tree

    config = FLUX_SCHNELL
    blocks = pick_flash_blocks(16640, config.head_dim)
    params = add_wscale_bound_tree(
        init_mmdit_params(jax.random.PRNGKey(0), config, quantize_bits=4)
    )
    jax.block_until_ready(params)
    latent = jnp.asarray(np.random.RandomState(0).randn(1, 256, 256, 16), jnp.float32)
    cond = jnp.zeros((1, 256, 4096), config.dtype)
    pooled = jnp.zeros((1, 768), config.dtype)

    n = 4
    ms = _scan_time(params, latent, config, cond, pooled,
                    jnp.asarray(0.0, jnp.float32), False, n, repeats=1) * 1000
    flops = mmdit_step_flops(config, (256, 256), 256, cfg=False)["total"]
    tflops, mfu = _mfu(flops, ms)
    return {
        "metric": "flux_schnell_w4a8_2048_denoise_ms_per_step",
        "value": round(ms, 2),
        "unit": "ms",
        # No published 2048² baseline; normalise against the scaling-ideal
        # 4x of the measured 1024² step budget (4*452 ms round 2 — attention
        # grows 16x but is a minority of the step).
        "vs_baseline": round(4 * 452.0 / ms, 3),
        "extra": {
            "s_per_image_4step": round(ms * 4 / 1000, 3),
            "flash_blocks_qkv": list(blocks),
            "step_tflop": round(flops / 1e12, 2),
            "achieved_tflops": tflops,
            "mfu_vs_bf16_peak": mfu,
            "timed_steps": n,
            "backend": jax.default_backend(),
            "device": str(jax.devices()[0]),
        },
    }


def bench_sd3_w8a8():
    """SD3-medium step with w8a8 (int8 MXU) weights — the 2x-ceiling mode."""
    from diffusionkit_tpu.config import SD3_2b
    from diffusionkit_tpu.flops import mmdit_step_flops
    from diffusionkit_tpu.models import init_mmdit_params

    config = SD3_2b
    params = init_mmdit_params(jax.random.PRNGKey(0), config, quantize_bits="w8a8")
    jax.block_until_ready(params)
    latent = jnp.asarray(np.random.RandomState(0).randn(1, 64, 64, 16), jnp.float32)
    cond = jnp.zeros((2, 154, 4096), config.dtype)
    pooled = jnp.zeros((2, 2048), config.dtype)

    ms = _scan_time(params, latent, config, cond, pooled,
                    jnp.asarray(5.0, jnp.float32), True, NUM_STEPS_TIMED) * 1000
    flops = mmdit_step_flops(config, (64, 64), 154, cfg=True)["total"]
    tflops, mfu = _mfu(flops, ms)
    return {
        "metric": "sd3_medium_512_cfg_w8a8_denoise_ms_per_step",
        "value": round(ms, 2),
        "unit": "ms",
        "vs_baseline": round(100.0 / ms, 3),
        "extra": {
            "s_per_image_50step": round(ms * 50 / 1000, 3),
            "step_tflop": round(flops / 1e12, 2),
            "achieved_tflops": tflops,
            "mfu_vs_bf16_peak": mfu,
            "timed_steps": NUM_STEPS_TIMED,
            "backend": jax.default_backend(),
            "device": str(jax.devices()[0]),
        },
    }


def bench_sd35_w4a8():
    """SD3.5-large (8B, 38 blocks, QK-norm) 1024^2 CFG — the third model
    family at its production resolution, int4 storage on the int8 MXU."""
    from diffusionkit_tpu.config import SD3_8b
    from diffusionkit_tpu.flops import mmdit_step_flops
    from diffusionkit_tpu.models import init_mmdit_params
    from diffusionkit_tpu.ops.w4a8_matmul import add_wscale_bound_tree

    config = SD3_8b
    params = add_wscale_bound_tree(
        init_mmdit_params(jax.random.PRNGKey(0), config, quantize_bits=4)
    )
    jax.block_until_ready(params)
    latent = jnp.asarray(np.random.RandomState(0).randn(1, 128, 128, 16), jnp.float32)
    cond = jnp.zeros((2, 154, 4096), config.dtype)
    pooled = jnp.zeros((2, 2048), config.dtype)

    n = max(NUM_STEPS_TIMED // 2, 8)
    ms = _scan_time(params, latent, config, cond, pooled,
                    jnp.asarray(5.0, jnp.float32), True, n) * 1000
    flops = mmdit_step_flops(config, (128, 128), 154, cfg=True)["total"]
    tflops, mfu = _mfu(flops, ms)
    return {
        "metric": "sd35_large_w4a8_1024_cfg_denoise_ms_per_step",
        "value": round(ms, 2),
        "unit": "ms",
        "vs_baseline": round(1000.0 / ms, 3),  # round-1 int4 measured 1092 ms
        "extra": {
            "s_per_image_28step": round(ms * 28 / 1000, 3),
            "step_tflop": round(flops / 1e12, 2),
            "achieved_tflops": tflops,
            "mfu_vs_bf16_peak": mfu,
            "timed_steps": n,
            "backend": jax.default_backend(),
            "device": str(jax.devices()[0]),
        },
    }


def bench_sd3_e2e():
    """Full pipeline p50 on the local full-size checkpoint mirror
    (tools/make_ckpt_mirror.py): text encode + scan denoise + VAE decode."""
    mirror = os.environ.get(
        "DIFFUSIONKIT_TPU_CKPT_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".ckpt_mirror"),
    )
    if not os.path.isdir(mirror):
        raise SystemExit(f"no checkpoint mirror at {mirror}")
    os.environ["DIFFUSIONKIT_TPU_CKPT_DIR"] = mirror
    from diffusionkit_tpu.pipeline import DiffusionPipeline

    pipe = DiffusionPipeline(
        model_version="argmaxinc/mlx-stable-diffusion-3-medium",
        use_t5=False, low_memory_mode=False, use_scan=True,
    )
    prompts = ["a cat", "a dog on a beach", "an astronaut riding a horse"]
    # warmup/compile
    pipe.generate_image(prompts[0], num_steps=50, cfg_weight=5.0,
                        latent_size=(64, 64), seed=0, verbose=False)
    times = []
    for i, prompt in enumerate(prompts):
        t0 = time.perf_counter()
        img, _ = pipe.generate_image(prompt, num_steps=50, cfg_weight=5.0,
                                     latent_size=(64, 64), seed=i, verbose=False)
        np.asarray(img)
        times.append(time.perf_counter() - t0)
    p50 = sorted(times)[len(times) // 2]
    return {
        "metric": "sd3_medium_512_50step_e2e_s_per_image_p50",
        "value": round(p50, 3),
        "unit": "s",
        "vs_baseline": round(5.0 / p50, 3),  # budget: 100 ms/step * 50
        "extra": {
            "runs": [round(t, 3) for t in times],
            "use_scan": True,
            "backend": jax.default_backend(),
            "device": str(jax.devices()[0]),
        },
    }


def bench_flux_e2e():
    """Full FLUX pipeline p50 at 1024^2 on the local 4-bit checkpoint mirror:
    text encode (CLIP-L + T5) + 4-step scan denoise (w4a8 kernels) + VAE
    decode. The honest user-visible latency behind the denoise-only
    flux-w4a8 headline."""
    mirror = os.environ.get(
        "DIFFUSIONKIT_TPU_CKPT_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".ckpt_mirror"),
    )
    if not os.path.isdir(mirror):
        raise SystemExit(f"no checkpoint mirror at {mirror}")
    os.environ["DIFFUSIONKIT_TPU_CKPT_DIR"] = mirror
    from diffusionkit_tpu.pipeline import FluxPipeline

    # quantize_t5: bf16 T5 (9.4 GB) + resident 12B int4 MMDiT overflows a
    # 16 GB v5e; w8a8 T5 keeps every phase resident.
    pipe = FluxPipeline(
        model_version="argmaxinc/mlx-FLUX.1-schnell-4bit-quantized",
        low_memory_mode=False, use_scan=True, quantize_mmdit="w4a8",
        quantize_t5=True,
    )
    prompts = ["a cat", "a dog on a beach", "an astronaut riding a horse"]
    pipe.generate_image(prompts[0], num_steps=4, cfg_weight=0.0,
                        latent_size=(128, 128), seed=0, verbose=False)
    times, log = [], None
    for i, prompt in enumerate(prompts):
        t0 = time.perf_counter()
        img, log = pipe.generate_image(prompt, num_steps=4, cfg_weight=0.0,
                                       latent_size=(128, 128), seed=i, verbose=False)
        np.asarray(img)
        times.append(time.perf_counter() - t0)
    p50 = sorted(times)[len(times) // 2]
    return {
        "metric": "flux_schnell_w4a8_1024_e2e_s_per_image_p50",
        "value": round(p50, 3),
        "unit": "s",
        "vs_baseline": round(2.0 / p50, 3),  # BASELINE north star (v5p target)
        "extra": {
            "runs": [round(t, 3) for t in times],
            "phases_last_run": {
                k: log[k]["time"]
                for k in ("text_encoding", "denoising", "decoding")
            },
            "use_scan": True,
            "weights": "MLX 4-bit file, lossless repack + w4a8 kernels",
            "backend": jax.default_backend(),
            "device": str(jax.devices()[0]),
        },
    }


def main():
    # Persistent XLA compile cache: the direct-to-_denoise_scan modes never
    # construct a DiffusionPipeline (which enables it in its ctor), so without
    # this the driver's cold run recompiles everything AND saves nothing.
    from diffusionkit_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    mode = os.environ.get("BENCH_MODEL", "sd3")
    fn = {
        "flux-int4": bench_flux_int4,
        "flux-w4a8": lambda: bench_flux_int4("w4a8"),
        "flux-e2e": bench_flux_e2e,
        "flux-2048": bench_flux_2048,
        "sd3-e2e": bench_sd3_e2e,
        "sd3-w8a8": bench_sd3_w8a8,
        "sd35-w4a8": bench_sd35_w4a8,
    }.get(mode, bench_sd3)
    print(json.dumps(fn()))


if __name__ == "__main__":
    main()
