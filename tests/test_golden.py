"""Golden-image E2E regression vs the reference dataset.

Mirror of reference tests/mlx/test_diffusion_pipeline.py:18-102
(``test_sd3_pipeline_correctness``): regenerate each row of the
``argmaxinc/sd-test-images`` dataset at fixed seed and assert
PSNR >= 20 dB against the stored reference image.

Requires real checkpoints + the golden dataset; both are gated on
``DIFFUSIONKIT_TPU_CKPT_DIR`` (zero-egress environments skip). Layout:
  $DIFFUSIONKIT_TPU_CKPT_DIR/<model repo>/<file>           (checkpoints)
  $DIFFUSIONKIT_TPU_CKPT_DIR/argmaxinc/sd-test-images/     (metadata.json + images)
"""

import json
import os
from pathlib import Path

import numpy as np
import pytest

TEST_PSNR_THRESHOLD = 20  # dB (reference test_diffusion_pipeline.py:20)

_ROOT = os.environ.get("DIFFUSIONKIT_TPU_CKPT_DIR")
_DATASET = Path(_ROOT) / "argmaxinc" / "sd-test-images" if _ROOT else None

def _backend():
    import jax

    return jax.default_backend()


pytestmark = [
    pytest.mark.skipif(
        _DATASET is None or not (_DATASET / "metadata.json").exists(),
        reason="golden dataset not available (set DIFFUSIONKIT_TPU_CKPT_DIR)",
    ),
    pytest.mark.skipif(
        "jax" in __import__("sys").modules and _backend() == "cpu",
        reason="full-size models need the TPU; run `python tests/test_golden.py`",
    ),
]


def _examples():
    with open(_DATASET / "metadata.json") as f:
        rows = json.load(f)
    # Optional substring filter on the pinned image name, for partial runs
    # (the full battery is ~2 h on one v5e; e.g. FILTER=flux after a change
    # that only affects rope models).
    filt = os.environ.get("DIFFUSIONKIT_TPU_GOLDEN_FILTER")
    if filt:
        rows = [r for r in rows if filt in r["image"]]
    return rows


def test_pipeline_correctness_golden_images():
    from PIL import Image

    from diffusionkit_tpu.pipeline import DiffusionPipeline, FluxPipeline
    from diffusionkit_tpu.utils import image_psnr

    for example in _examples():
        version = example["model_version"]
        cls = FluxPipeline if "FLUX" in version else DiffusionPipeline
        pipe = cls(
            w16=True,
            a16=True,
            model_version=version,
            low_memory_mode=True,
            use_t5=example.get("use_t5", False),
            quantize_mmdit=example.get("quantize_mmdit", False),
            quantize_t5=example.get("quantize_t5", False),
            shift=example.get("shift", 1.0 if "FLUX" in version else 3.0),
        )
        image_prompt = example.get("image_prompt")
        img, _ = pipe.generate_image(
            example["prompt"],
            num_steps=example["steps"],
            cfg_weight=example["cfg"],
            negative_text=example.get("neg_prompt", ""),
            latent_size=(example["height"] // 8, example["width"] // 8),
            seed=example["seed"],
            verbose=False,
            guidance=example.get("guidance"),
            # img2img rows reference another pinned image as the prompt.
            image_path=str(_DATASET / image_prompt) if image_prompt else None,
            denoise=float(example.get("denoise", 1.0)),
        )
        ref = Image.open(_DATASET / example["image"])
        psnr = image_psnr(ref, img)
        assert psnr >= TEST_PSNR_THRESHOLD, (
            f"{version}: PSNR {psnr:.1f} dB < {TEST_PSNR_THRESHOLD} dB "
            f"for prompt {example['prompt']!r}"
        )
        del pipe


if __name__ == "__main__":
    # Standalone TPU runner (pytest's conftest forces the CPU mesh; the
    # reference likewise runs its golden test as a script,
    # tests/mlx/test_diffusion_pipeline.py:148-211).
    import sys

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    test_pipeline_correctness_golden_images()
    print("GOLDEN OK")
