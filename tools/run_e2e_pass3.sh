#!/bin/bash
# Pass 3 (round 2 continuation): the three registry models that had not yet
# completed on chip — sd35_large (host-stack OOM, fixed), flux_schnell_4bit
# (pre-phase-lazy OOM, fixed), flux_dev (interrupted by round end) — then the
# bench re-measurements. One TPU process at a time.
cd /root/repo
export DIFFUSIONKIT_TPU_CKPT_DIR=/root/repo/.ckpt_mirror
OUT=.e2e_r2
run() {
  name=$1; shift
  echo "=== pass3 $name: start $(date +%H:%M:%S)" | tee -a $OUT/status.log
  timeout 3000 python -m diffusionkit_tpu.scripts.generate_images \
    --prompt "a photo of a cat in a wizard hat" --seed 42 -v \
    -o $OUT/$name.png "$@" > $OUT/$name.log 2>&1
  rc=$?
  echo "=== pass3 $name: rc=$rc $(date +%H:%M:%S)" | tee -a $OUT/status.log
}

run sd35_large   --model-version argmaxinc/mlx-stable-diffusion-3.5-large \
                 --steps 20 --cfg 5.0 --height 512 --width 512 --quantize-mmdit
run flux_schnell_4bit --model-version argmaxinc/mlx-FLUX.1-schnell-4bit-quantized \
                 --steps 4 --cfg 0 --height 512 --width 512
run flux_dev     --model-version argmaxinc/mlx-FLUX.1-dev \
                 --steps 4 --cfg 0 --height 512 --width 512 --quantize-mmdit --guidance 3.5

echo "=== pass3 bench sd3: start $(date +%H:%M:%S)" | tee -a $OUT/status.log
timeout 3000 python bench.py > $OUT/bench_sd3.json 2> $OUT/bench_sd3.log
echo "=== pass3 bench sd3: rc=$? $(date +%H:%M:%S)" | tee -a $OUT/status.log
BENCH_MODEL=sd3-e2e timeout 3000 python bench.py > $OUT/bench_sd3_e2e.json 2> $OUT/bench_sd3_e2e.log
echo "=== pass3 bench sd3-e2e: rc=$? $(date +%H:%M:%S)" | tee -a $OUT/status.log
BENCH_MODEL=flux-int4 timeout 3000 python bench.py > $OUT/bench_flux.json 2> $OUT/bench_flux.log
echo "=== pass3 bench flux: rc=$? $(date +%H:%M:%S)" | tee -a $OUT/status.log
echo "=== PASS3 DONE $(date +%H:%M:%S)" | tee -a $OUT/status.log
