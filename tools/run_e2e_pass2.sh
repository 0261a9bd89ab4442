#!/bin/bash
# Pass 2: retry sd35_large (host-stack OOM fixed), then steady-state benches.
cd /root/repo
export DIFFUSIONKIT_TPU_CKPT_DIR=/root/repo/.ckpt_mirror
OUT=.e2e_r2
echo "=== pass2 sd35_large: start $(date +%H:%M:%S)" | tee -a $OUT/status.log
timeout 3000 python -m diffusionkit_tpu.scripts.generate_images \
  --prompt "a photo of a cat in a wizard hat" --seed 42 -v \
  -o $OUT/sd35_large.png \
  --model-version argmaxinc/mlx-stable-diffusion-3.5-large \
  --steps 20 --cfg 5.0 --height 512 --width 512 --quantize-mmdit \
  > $OUT/sd35_large.log 2>&1
echo "=== pass2 sd35_large: rc=$? $(date +%H:%M:%S)" | tee -a $OUT/status.log

echo "=== bench sd3-e2e: start $(date +%H:%M:%S)" | tee -a $OUT/status.log
timeout 3000 python bench.py > $OUT/bench_sd3.json 2> $OUT/bench_sd3.log
echo "=== bench sd3: rc=$? $(date +%H:%M:%S)" | tee -a $OUT/status.log
BENCH_MODEL=sd3-e2e timeout 3000 python bench.py > $OUT/bench_sd3_e2e.json 2> $OUT/bench_sd3_e2e.log
echo "=== bench sd3-e2e: rc=$? $(date +%H:%M:%S)" | tee -a $OUT/status.log
BENCH_MODEL=flux-int4 timeout 3000 python bench.py > $OUT/bench_flux.json 2> $OUT/bench_flux.log
echo "=== bench flux: rc=$? $(date +%H:%M:%S)" | tee -a $OUT/status.log
echo "=== PASS2 DONE $(date +%H:%M:%S)" | tee -a $OUT/status.log

echo "=== pass2 flux_schnell_4bit: start $(date +%H:%M:%S)" | tee -a $OUT/status.log
timeout 3000 python -m diffusionkit_tpu.scripts.generate_images \
  --prompt "a photo of a cat in a wizard hat" --seed 42 -v \
  -o $OUT/flux_schnell_4bit.png \
  --model-version argmaxinc/mlx-FLUX.1-schnell-4bit-quantized \
  --steps 4 --cfg 0 --height 512 --width 512 \
  > $OUT/flux_schnell_4bit.log 2>&1
echo "=== pass2 flux_schnell_4bit: rc=$? $(date +%H:%M:%S)" | tee -a $OUT/status.log

echo "=== bench serving: start $(date +%H:%M:%S)" | tee -a $OUT/status.log
timeout 3000 python tools/bench_serving.py > $OUT/bench_serving.json 2> $OUT/bench_serving.log
echo "=== bench serving: rc=$? $(date +%H:%M:%S)" | tee -a $OUT/status.log
echo "=== PASS2 FULLY DONE $(date +%H:%M:%S)" | tee -a $OUT/status.log
