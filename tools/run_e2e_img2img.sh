#!/bin/bash
# On-chip img2img E2E: reuses the pinned txt2img golden as the image prompt
# (reference DiffusionPipeline.generate_image(image_path=, denoise=);
# CLI --image-path/--denoise). Produces .e2e_r2/sd3_medium_img2img.png.
cd /root/repo
export DIFFUSIONKIT_TPU_CKPT_DIR=/root/repo/.ckpt_mirror
OUT=.e2e_r2
echo "=== img2img sd3_medium: start $(date +%H:%M:%S)" | tee -a $OUT/status.log
timeout 3000 python -m diffusionkit_tpu.scripts.generate_images \
  --prompt "a photo of a cat in a wizard hat, oil painting" --seed 43 -v \
  -o $OUT/sd3_medium_img2img.png \
  --model-version argmaxinc/mlx-stable-diffusion-3-medium \
  --steps 50 --cfg 5.0 --height 512 --width 512 \
  --image-path $OUT/sd3_medium.png --denoise 0.6 \
  > $OUT/sd3_medium_img2img.log 2>&1
echo "=== img2img sd3_medium: rc=$? $(date +%H:%M:%S)" | tee -a $OUT/status.log
