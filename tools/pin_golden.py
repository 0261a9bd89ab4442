"""Pin the on-chip E2E outputs (.e2e_r2/*.png, produced by
tools/run_e2e_all.sh) into the offline golden dataset
(.ckpt_mirror/argmaxinc/sd-test-images/) so tests/test_golden.py regressions
cover every registry model. Existing rows for the same (model, prompt, seed)
are replaced."""

import json
import shutil
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
E2E = ROOT / ".e2e_r2"
DATASET = ROOT / ".ckpt_mirror" / "argmaxinc" / "sd-test-images"

PROMPT = "a photo of a cat in a wizard hat"
RUNS = {
    "sd3_medium": dict(
        model_version="argmaxinc/mlx-stable-diffusion-3-medium",
        steps=50, cfg=5.0, height=512, width=512, seed=42, use_t5=False,
    ),
    "sd35_large_4bit": dict(
        model_version="argmaxinc/mlx-stable-diffusion-3.5-large-4bit-quantized",
        steps=20, cfg=5.0, height=512, width=512, seed=42, use_t5=False,
    ),
    "sd35_large": dict(
        model_version="argmaxinc/mlx-stable-diffusion-3.5-large",
        steps=20, cfg=5.0, height=512, width=512, seed=42, use_t5=False,
        quantize_mmdit=True,
    ),
    "flux_schnell_4bit": dict(
        model_version="argmaxinc/mlx-FLUX.1-schnell-4bit-quantized",
        steps=4, cfg=0.0, height=512, width=512, seed=42, use_t5=True,
    ),
    "flux_schnell": dict(
        model_version="argmaxinc/mlx-FLUX.1-schnell",
        steps=4, cfg=0.0, height=512, width=512, seed=42, use_t5=True,
        quantize_mmdit=True,
    ),
    "flux_dev": dict(
        model_version="argmaxinc/mlx-FLUX.1-dev",
        steps=4, cfg=0.0, height=512, width=512, seed=42, use_t5=True,
        quantize_mmdit=True, guidance=3.5,
    ),
    # Serving-config rows (VERDICT round 3, Next #8): w4a8-mixed MMDiT +
    # SmoothQuant w8a8 T5 (serve.py's recommended flags) at 512^2 and the
    # production 1024^2.
    "flux_serving_512": dict(
        model_version="argmaxinc/mlx-FLUX.1-schnell",
        steps=4, cfg=0.0, height=512, width=512, seed=42, use_t5=True,
        quantize_mmdit="w4a8-mixed", quantize_t5=True,
    ),
    "flux_serving_1024": dict(
        model_version="argmaxinc/mlx-FLUX.1-schnell",
        steps=4, cfg=0.0, height=1024, width=1024, seed=42, use_t5=True,
        quantize_mmdit="w4a8-mixed", quantize_t5=True,
    ),
    # img2img: the image prompt is the pinned sd3_medium txt2img golden, so
    # the dataset is self-contained and test_golden can replay the run.
    "sd3_medium_img2img": dict(
        model_version="argmaxinc/mlx-stable-diffusion-3-medium",
        steps=50, cfg=5.0, height=512, width=512, seed=43, use_t5=False,
        prompt="a photo of a cat in a wizard hat, oil painting",
        image_prompt="sd3_medium_seed42.png", denoise=0.6,
    ),
}


def main():
    DATASET.mkdir(parents=True, exist_ok=True)
    meta_path = DATASET / "metadata.json"
    rows = json.loads(meta_path.read_text()) if meta_path.exists() else []
    pinned = 0
    for name, cfg in RUNS.items():
        src = E2E / f"{name}.png"
        if not src.exists():
            print(f"skip {name}: no {src}")
            continue
        # The battery overwrites <name>.log per attempt; a failed rerun
        # leaves a stale png from the previous success next to a log with
        # no save line. Pinning that png poisons the golden dataset against
        # the current code (observed: battery5's failed sd3.5-large run
        # pinned a pre-GPTQ image; the verify then "failed" at 16.7 dB).
        log = E2E / f"{name}.log"
        if log.exists() and "Saved the image" not in log.read_text(
            errors="replace"
        ):
            print(f"skip {name}: last run failed ({log} has no save line)")
            continue
        img_name = f"{name}_seed{cfg['seed']}.png"
        shutil.copy2(src, DATASET / img_name)
        row = {"prompt": PROMPT, "image": img_name, **cfg}
        rows = [
            r for r in rows
            if not (r["model_version"] == cfg["model_version"]
                    and r["prompt"] == PROMPT and r["seed"] == cfg["seed"])
        ]
        rows.append(row)
        pinned += 1
    meta_path.write_text(json.dumps(rows, indent=1))
    print(f"pinned {pinned} rows; dataset now has {len(rows)} examples")
    return 0


if __name__ == "__main__":
    sys.exit(main())
