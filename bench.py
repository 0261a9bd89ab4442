"""Benchmark harness. Prints ONE JSON line with the headline metric.

Headline (BASELINE.md): SD3-medium (2B MMDiT) 512x512, CFG 5.0 — denoise
ms/step on one chip, plus derived 50-step s/image and images/min/chip.
Runs with random-init weights at the exact production shapes (performance is
independent of weight values); uses real checkpoints automatically when
DIFFUSIONKIT_TPU_CKPT_DIR is set.

The reference publishes no benchmark numbers (SURVEY.md §6; BASELINE.json
``published: {}``), so ``vs_baseline`` is reported against the north-star
target budget derived from BASELINE.json: FLUX-schnell needs <2 s/image for
4 steps at 1024² on v5p, i.e. a 12B-model step budget of ~450 ms at seq 4352;
scaled by model FLOPs (2B vs 12B) and sequence (1178 vs 4352+256), the
equivalent SD3-medium 512² step budget is ~450 * (2/12) * (1178/4608)² * ...
— rather than a pseudo-derivation, we fix the budget at 100 ms/step
(20%-of-roofline on v5e for the ~9.4 TFLOP CFG step; see SPEC below) and
report vs_baseline = budget / measured (>1 means faster than target).
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# SPEC: SD3-medium CFG step at 512^2:
#   2 (CFG) * 1178 tokens * 2B params * 2 FLOP/MAC ~= 9.4 TFLOP
#   v5e bf16 peak 197 TFLOP/s -> 48 ms at roofline; budget 100 ms (~50%).
STEP_BUDGET_MS = 100.0
NUM_STEPS_TIMED = 20
IMAGE_STEPS = 50  # headline config: 50-step txt2img (BASELINE.json config 1)


def main():
    from diffusionkit_tpu.config import SD3_2b
    from diffusionkit_tpu.models import init_mmdit_params
    from diffusionkit_tpu.pipeline import _denoise_step

    config = SD3_2b
    key = jax.random.PRNGKey(0)
    params = init_mmdit_params(key, config)
    jax.block_until_ready(params)

    latent = jnp.asarray(np.random.RandomState(0).randn(1, 64, 64, 16), jnp.float32)
    cond = jnp.zeros((2, 154, 4096), config.dtype)
    pooled = jnp.zeros((2, 2048), config.dtype)
    sigmas = np.linspace(1.0, 0.0, IMAGE_STEPS + 1).astype(np.float32)

    def step(x, i):
        return _denoise_step(
            params,
            x,
            jnp.asarray(sigmas[i], jnp.float32),
            jnp.asarray(sigmas[i + 1], jnp.float32),
            cond,
            pooled,
            jnp.asarray(5.0, jnp.float32),
            None,
            config,
            True,
            None,
        )

    # Warmup / compile. NOTE: on this box block_until_ready() through the
    # axon relay can return early, so all timings chain N steps and force a
    # device->host transfer as the sync point (see .claude/skills/verify).
    x = step(latent, 0)
    _ = np.asarray(x)

    t0 = time.perf_counter()
    for i in range(NUM_STEPS_TIMED):
        x = step(x, 1 + i)
    _ = np.asarray(x)
    ms_per_step = (time.perf_counter() - t0) * 1000 / NUM_STEPS_TIMED
    s_per_image = ms_per_step * IMAGE_STEPS / 1000
    images_per_min = 60.0 / s_per_image

    print(
        json.dumps(
            {
                "metric": "sd3_medium_512_cfg_denoise_ms_per_step",
                "value": round(ms_per_step, 2),
                "unit": "ms",
                "vs_baseline": round(STEP_BUDGET_MS / ms_per_step, 3),
                "extra": {
                    "s_per_image_50step": round(s_per_image, 3),
                    "images_per_min_per_chip": round(images_per_min, 3),
                    "timed_steps": NUM_STEPS_TIMED,
                    "backend": jax.default_backend(),
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
