#!/bin/bash
# Serial on-chip E2E of all six registry models against the synthetic mirror.
# One TPU process at a time (chip-claim constraint). Outputs + logs in .e2e_r2/.
cd /root/repo
export DIFFUSIONKIT_TPU_CKPT_DIR=/root/repo/.ckpt_mirror
OUT=.e2e_r2
run() {
  name=$1; shift
  echo "=== $name: start $(date +%H:%M:%S)" | tee -a $OUT/status.log
  timeout 7200 python -m diffusionkit_tpu.scripts.generate_images \
    --prompt "a photo of a cat in a wizard hat" --seed 42 -v \
    -o $OUT/$name.png "$@" > $OUT/$name.log 2>&1
  rc=$?
  echo "=== $name: rc=$rc $(date +%H:%M:%S)" | tee -a $OUT/status.log
}

run sd3_medium   --model-version argmaxinc/mlx-stable-diffusion-3-medium \
                 --steps 50 --cfg 5.0 --height 512 --width 512 --no-low-memory-mode
run sd35_large_4bit --model-version argmaxinc/mlx-stable-diffusion-3.5-large-4bit-quantized \
                 --steps 20 --cfg 5.0 --height 512 --width 512
run sd35_large   --model-version argmaxinc/mlx-stable-diffusion-3.5-large \
                 --steps 20 --cfg 5.0 --height 512 --width 512 --quantize-mmdit
run flux_schnell_4bit --model-version argmaxinc/mlx-FLUX.1-schnell-4bit-quantized \
                 --steps 4 --cfg 0 --height 512 --width 512
run flux_schnell --model-version argmaxinc/mlx-FLUX.1-schnell \
                 --steps 4 --cfg 0 --height 512 --width 512 --quantize-mmdit
run flux_dev     --model-version argmaxinc/mlx-FLUX.1-dev \
                 --steps 4 --cfg 0 --height 512 --width 512 --quantize-mmdit --guidance 3.5
# Serving-config goldens (VERDICT round 3, Next #8): the exact configuration
# serve.py recommends — w4a8-mixed MMDiT + SmoothQuant w8a8 T5 — pinned at
# both 512^2 and the production 1024^2 so a perf change that shifts pixels
# fails a test, not a review.
run flux_serving_512  --model-version argmaxinc/mlx-FLUX.1-schnell \
                 --steps 4 --cfg 0 --height 512 --width 512 --quantize-mmdit w4a8-mixed --quantize-t5
run flux_serving_1024 --model-version argmaxinc/mlx-FLUX.1-schnell \
                 --steps 4 --cfg 0 --height 1024 --width 1024 --quantize-mmdit w4a8-mixed --quantize-t5
echo "=== ALL DONE $(date +%H:%M:%S)" | tee -a $OUT/status.log
