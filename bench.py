"""Benchmark harness. Prints ONE JSON line with the headline metric.

Default headline (BASELINE.md config 1): SD3-medium (2B MMDiT) 512x512,
CFG 5.0 — denoise ms/step on one chip, plus derived 50-step s/image and
images/min/chip. Runs with random-init weights at the exact production
shapes (performance is independent of weight values).

``BENCH_MODEL=flux-int4`` switches to the BASELINE north-star config:
FLUX.1-schnell 12B (int4 weight-only so it fits one 16 GB v5e), 4-step
1024x1024 s/image. That run spends ~10 min in remote compilation, so the
default stays SD3.

The reference publishes no benchmark numbers (SURVEY.md §6; BASELINE.json
``published: {}``); ``vs_baseline`` is measured against a fixed budget:
100 ms/step for SD3 (~50%-of-roofline for the 9.4 TFLOP CFG step on v5e),
2.0 s/image for FLUX (the BASELINE v5p target). >1 means faster than target.
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


def bench_sd3():
    from diffusionkit_tpu.config import SD3_2b
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

    ms = _chain_time(step, latent, NUM_STEPS_TIMED) * 1000
    s_image = ms * 50 / 1000  # 50-step headline config
    return {
        "metric": "sd3_medium_512_cfg_denoise_ms_per_step",
        "value": round(ms, 2),
        "unit": "ms",
        "vs_baseline": round(100.0 / ms, 3),
        "extra": {
            "s_per_image_50step": round(s_image, 3),
            "images_per_min_per_chip": round(60.0 / s_image, 3),
            "timed_steps": NUM_STEPS_TIMED,
            "backend": jax.default_backend(),
            "device": str(jax.devices()[0]),
        },
    }


def bench_flux_int4():
    from diffusionkit_tpu.config import FLUX_SCHNELL
    from diffusionkit_tpu.models import init_mmdit_params
    from diffusionkit_tpu.pipeline import _denoise_step

    config = FLUX_SCHNELL
    params = init_mmdit_params(jax.random.PRNGKey(0), config, quantize_bits=4)
    jax.block_until_ready(params)

    latent = jnp.asarray(np.random.RandomState(0).randn(1, 128, 128, 16), jnp.float32)
    cond = jnp.zeros((1, 256, 4096), config.dtype)
    pooled = jnp.zeros((1, 768), config.dtype)
    sigmas = np.linspace(1.0, 0.0, NUM_STEPS_TIMED + 2).astype(np.float32)

    def step(x, i):
        return _denoise_step(
            params, x,
            jnp.asarray(sigmas[i], jnp.float32), jnp.asarray(sigmas[i + 1], jnp.float32),
            cond, pooled, jnp.asarray(0.0, jnp.float32), None, config, False, None,
        )

    n = max(NUM_STEPS_TIMED // 2, 8)
    ms = _chain_time(step, latent, n) * 1000
    s_image = ms * 4 / 1000  # 4-step schnell
    return {
        "metric": "flux_schnell_int4_1024_s_per_image_4step",
        "value": round(s_image, 3),
        "unit": "s",
        "vs_baseline": round(2.0 / s_image, 3),
        "extra": {
            "denoise_ms_per_step": round(ms, 2),
            "timed_steps": n,
            "weights": "int4 weight-only (12B on one chip)",
            "backend": jax.default_backend(),
            "device": str(jax.devices()[0]),
        },
    }


def main():
    mode = os.environ.get("BENCH_MODEL", "sd3")
    result = bench_flux_int4() if mode == "flux-int4" else bench_sd3()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
