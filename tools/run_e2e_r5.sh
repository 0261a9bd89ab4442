#!/bin/bash
# Round-5 battery: (1) the quantization-quality mode table re-measured under
# the GPTQ quantize-at-load default (VERDICT round 4, task #3 — evidence for
# raising the int4/w4a8 floors), then (2) fresh goldens for every row whose
# pixels the GPTQ switch moved (quantize-at-load rows: sd35_large,
# flux_schnell, flux_dev, flux_serving_*; the bf16 and pre-quantized-file
# rows are untouched by it), then (3) pin_golden.
#
# One TPU process at a time (.claude/skills/verify). DEADLINE_EPOCH guards
# the driver's end-of-round bench: past it, remaining runs are skipped (a
# run mid-flight when the driver's bench starts deadlocks the chip claim —
# that overlap is what timed out BENCH_r04).
set -u
cd /root/repo
export DIFFUSIONKIT_TPU_CKPT_DIR=/root/repo/.ckpt_mirror
OUT=.e2e_r2
DEADLINE_EPOCH=${DEADLINE_EPOCH:-$(($(date +%s) + 7200))}
log() { echo "=== $1 $(date +%H:%M:%S)" | tee -a $OUT/status.log; }
# A golden run gets a 3000 s timeout; only start one if it can finish (plus
# slack) before the deadline, so no run straddles it and holds the chip.
past_deadline() { [ "$(($(date +%s) + 3300))" -ge "$DEADLINE_EPOCH" ]; }

# Wait (up to 30 min) for the mirror regeneration to finish the files we need.
need() { [ -f ".ckpt_mirror/$1" ]; }
for i in $(seq 180); do
  if need "argmaxinc/mlx-stable-diffusion-3-medium/sd3_medium.safetensors" \
     && need "argmaxinc/stable-diffusion/clip_l/model.fp16.safetensors"; then
    break
  fi
  sleep 10
done

# Probe until any orphaned chip claim from a previously killed TPU process
# clears (~10 min worst case).
for i in $(seq 20); do
  if timeout 120 python -c "import jax,jax.numpy as jnp; print(float(jnp.ones(8).sum()))" >/dev/null 2>&1; then
    log "tpu probe OK (attempt $i)"; break
  fi
  log "tpu probe: claim still held (attempt $i)"
  sleep 30
done

log "r5 bench sd35-w4a8: start"
BENCH_MODEL=sd35-w4a8 timeout 1800 python bench.py \
  > $OUT/bench_sd35_w4a8_r5.json 2> $OUT/bench_sd35_w4a8_r5.log
log "r5 bench sd35-w4a8: rc=$?"

log "r5 quant_quality(GPTQ): start"
timeout 5400 python tools/quant_quality.py --steps 6 --size 256 \
  --out benchmarks/quant_quality_r5.json > $OUT/quant_quality_r5.log 2>&1
log "r5 quant_quality(GPTQ): rc=$?"

run() {
  name=$1; shift
  if past_deadline; then log "r5 golden $name: SKIPPED (deadline)"; return; fi
  # Golden reruns need the full mirror; tools/make_ckpt_mirror.py writes the
  # FLUX.1-dev ae.safetensors last.
  for i in $(seq 180); do
    need "argmaxinc/mlx-FLUX.1-dev/ae.safetensors" && break
    sleep 10
  done
  log "r5 golden $name: start"
  timeout 3000 python -m diffusionkit_tpu.scripts.generate_images \
    --prompt "a photo of a cat in a wizard hat" --seed 42 -v \
    -o $OUT/$name.png "$@" > $OUT/$name.log 2>&1
  log "r5 golden $name: rc=$?"
}

run sd35_large   --model-version argmaxinc/mlx-stable-diffusion-3.5-large \
                 --steps 20 --cfg 5.0 --height 512 --width 512 --quantize-mmdit
run flux_schnell --model-version argmaxinc/mlx-FLUX.1-schnell \
                 --steps 4 --cfg 0 --height 512 --width 512 --quantize-mmdit
run flux_dev     --model-version argmaxinc/mlx-FLUX.1-dev \
                 --steps 4 --cfg 0 --height 512 --width 512 --quantize-mmdit --guidance 3.5
run flux_serving_512  --model-version argmaxinc/mlx-FLUX.1-schnell \
                 --steps 4 --cfg 0 --height 512 --width 512 --quantize-mmdit w4a8-mixed --quantize-t5
run flux_serving_1024 --model-version argmaxinc/mlx-FLUX.1-schnell \
                 --steps 4 --cfg 0 --height 1024 --width 1024 --quantize-mmdit w4a8-mixed --quantize-t5

python tools/pin_golden.py >> $OUT/status.log 2>&1
log "r5 battery DONE"
