"""Serving throughput: batched multi-prompt generation at concurrency 1/4/8.

Measures pipeline.generate_images_batched (the batching server's fast path)
on the FLUX.1-schnell int4 checkpoint mirror, 4 steps. Default 512^2 (the
round-1 serving config whose lock-serialized baseline was ~80 images/min);
``--size 1024`` measures the production resolution (chunked VAE decode keeps
multi-image batches inside 16 GB). Prints one JSON line per batch size.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512, choices=(512, 1024))
    ap.add_argument("--batches", type=int, nargs="*", default=None)
    args = ap.parse_args()
    latent_hw = args.size // 8
    batches = tuple(args.batches) if args.batches else (1, 4, 8)
    os.environ.setdefault(
        "DIFFUSIONKIT_TPU_CKPT_DIR",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".ckpt_mirror"),
    )
    from diffusionkit_tpu.pipeline import FluxPipeline

    # quantize_t5: int4 MMDiT (7.5 GB) + bf16 T5 (9.4 GB) overflows a 16 GB
    # v5e; w8a8 T5 (4.7 GB) keeps every phase resident for serving. w4a8
    # runs the denoise on the int8 MXU at the int4 HBM footprint.
    pipe = FluxPipeline(
        model_version="argmaxinc/mlx-FLUX.1-schnell-4bit-quantized",
        low_memory_mode=False, use_scan=True, quantize_t5=True,
        quantize_mmdit="w4a8",
    )
    prompts = [f"a photo of a cat number {i}" for i in range(8)]
    for batch in batches:
        texts = prompts[:batch]
        seeds = list(range(batch))
        try:
            # compile
            imgs = pipe.generate_images_batched(
                texts, num_steps=4, cfg_weight=0.0,
                latent_size=(latent_hw, latent_hw), seeds=seeds
            )
            np.asarray(imgs[0])
            t0 = time.perf_counter()
            n_runs = 3
            for r in range(n_runs):
                imgs = pipe.generate_images_batched(
                    texts, num_steps=4, cfg_weight=0.0,
                    latent_size=(latent_hw, latent_hw),
                    seeds=[s + r for s in seeds],
                )
                np.asarray(imgs[-1])
            dt = (time.perf_counter() - t0) / n_runs
            print(json.dumps({
                "metric": f"flux_w4a8_{args.size}_4step_images_per_min",
                "batch": batch,
                "s_per_batch": round(dt, 3),
                "images_per_min": round(60.0 * batch / dt, 1),
            }), flush=True)
        except Exception as e:  # batch 8 can exceed 16 GB HBM — report & go on
            print(json.dumps({
                "metric": f"flux_w4a8_{args.size}_4step_images_per_min",
                "batch": batch, "error": f"{type(e).__name__}: {str(e)[:120]}",
            }), flush=True)


if __name__ == "__main__":
    main()
